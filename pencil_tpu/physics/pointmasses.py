"""N-body point masses (reference ``src/pointmasses.f90``): nqpar massive
particles (stars/planets) evolved alongside (or without) the gas.

State lives outside the f-array as ``state["pointmasses"] = {"xq","vq"}``
— positions in the GRID coordinate system (cartesian/cylindrical/
spherical, like the reference's fq) and non-coordinate (linear) velocity
components.  The actual time stepping happens in Cartesian coordinates
for better Jacobi-constant conservation (reference
advance_particles_in_cartesian :2748), which for a one-step map is the
exact polar↔cartesian round trip — so we integrate the Cartesian ODE

    dx/dt = v,   dv/dt = Σ_{j≠i} −G m_j (x_i−x_j)/max(r², r_smooth²)^{3/2}

(gravity_pointmasses :1100, 'newtonian' potential) and convert back.

Initial conditions 'fixed-cm' (init_pointmasses :430-700): the primary's
mass is set to 1−Σm_secondaries, positions are shifted by the secondary
barycenter offset (primary at azimuth π), and velocities are circular
Keplerian (√(1/a) on the ORIGINAL semimajor axes) minus the barycenter
velocity, the primary carrying +v_bar.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp
import numpy as np

from .base import ModuleBase


def polar_to_cart(xq, vq, coords):
    """(nq,3) positions/velocities in grid coords → cartesian."""
    if coords == "cartesian":
        return xq, vq
    if coords == "cylindrical":
        rad, phi, zed = xq[:, 0], xq[:, 1], xq[:, 2]
        vr, vp, vz = vq[:, 0], vq[:, 1], vq[:, 2]
        c, s = jnp.cos(phi), jnp.sin(phi)
        x = jnp.stack([rad * c, rad * s, zed], 1)
        v = jnp.stack([vr * c - vp * s, vr * s + vp * c, vz], 1)
        return x, v
    # spherical (r, theta, phi)
    rad, tht, phi = xq[:, 0], xq[:, 1], xq[:, 2]
    vr, vt, vp = vq[:, 0], vq[:, 1], vq[:, 2]
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(tht), jnp.sin(tht)
    x = jnp.stack([rad * st * cp, rad * st * sp, rad * ct], 1)
    v = jnp.stack([vr * st * cp + vt * ct * cp - vp * sp,
                   vr * st * sp + vt * ct * sp + vp * cp,
                   vr * ct - vt * st], 1)
    return x, v


def cart_to_polar(x, v, coords):
    if coords == "cartesian":
        return x, v
    if coords == "cylindrical":
        rad = jnp.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
        phi = jnp.arctan2(x[:, 1], x[:, 0])
        c, s = jnp.cos(phi), jnp.sin(phi)
        vr = v[:, 0] * c + v[:, 1] * s
        vp = -v[:, 0] * s + v[:, 1] * c
        return (jnp.stack([rad, phi, x[:, 2]], 1),
                jnp.stack([vr, vp, v[:, 2]], 1))
    rad = jnp.sqrt(jnp.sum(x * x, axis=1))
    tht = jnp.arccos(jnp.clip(x[:, 2] / jnp.maximum(rad, 1e-300), -1, 1))
    phi = jnp.arctan2(x[:, 1], x[:, 0])
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(tht), jnp.sin(tht)
    vr = v[:, 0] * st * cp + v[:, 1] * st * sp + v[:, 2] * ct
    vt = v[:, 0] * ct * cp + v[:, 1] * ct * sp - v[:, 2] * st
    vp = -v[:, 0] * sp + v[:, 1] * cp
    return jnp.stack([rad, tht, phi], 1), jnp.stack([vr, vt, vp], 1)


@dataclass(frozen=True)
class PointMasses(ModuleBase):
    name: ClassVar[str] = "pointmasses"

    pmass: Tuple[float, ...] = (1.0,)
    xq0: Tuple[float, ...] = (0.0,)
    r_smooth: Tuple[float, ...] = ()
    iprimary: int = 1                 # 1-based, as the reference namelist
    GNewton: float = 1.0
    initxxq: str = "fixed-cm"
    initvvq: str = "fixed-cm"
    lreset_cm: bool = False
    # per-particle potential for the GAS gravity (pointmasses.f90:71
    # ipotential_pointmass: 'newton'|'plummer'|'boley') and the
    # cylindrical-gravity switch (:53); frac_smooth sets the default
    # smoothing radius of secondaries when r_smooth isn't given (:284:
    # r_smooth = frac_smooth·|xq0|·(pmass/3)^{1/3})
    ipotential: Tuple[str, ...] = ()
    lcylindrical_gravity: Tuple[bool, ...] = ()
    frac_smooth: float = 0.4

    @property
    def nqpar(self):
        return len(self.pmass)

    def _r_smooth(self):
        if self.r_smooth:
            return np.asarray((list(self.r_smooth)
                               + [0.0] * self.nqpar)[: self.nqpar])
        m = self.masses()
        out = np.zeros(self.nqpar)
        for ks in range(self.nqpar):
            if ks != self.iprimary - 1:
                out[ks] = (self.frac_smooth * abs(self.xq0[ks])
                           * (m[ks] / 3.0) ** (1.0 / 3.0))
        return out

    def _pot(self, ks):
        return self.ipotential[ks] if ks < len(self.ipotential) else "newton"

    def _lcyl(self, ks):
        return (self.lcylindrical_gravity[ks]
                if ks < len(self.lcylindrical_gravity) else False)

    def gas_gravity(self, pen, xq):
        """Acceleration field (3, nx, ny, nz) the point masses exert on
        the gas (reference get_total_gravity, pointmasses.f90:1700-1830):
        per particle, Ω²(r) from ipotential_pointmass with the distance
        taken cylindrically when lcylindrical_gravity_nbody, then the
        coordinate-aware separation vector of
        get_gravity_field_pointmasses (:1524-1551)."""
        g = pen.grid
        coords = getattr(pen.cfg.grid, "coords", "cartesian")
        x, y, z = g.xg, g.yg, g.zg
        m = self.masses()
        rs = self._r_smooth()
        G = self.GNewton
        ggt = None
        for ks in range(self.nqpar):
            x0, y0, z0 = xq[ks, 0], xq[ks, 1], xq[ks, 2]
            if coords == "cartesian":
                rp2cyl = (x - x0) ** 2 + (y - y0) ** 2
                rp2 = rp2cyl + (z - z0) ** 2
                rp1 = jnp.sqrt(x0 ** 2 + y0 ** 2 + z0 ** 2)
                evr = ((x - x0), (y - y0), (z - z0))
            elif coords == "cylindrical":
                rp2cyl = x ** 2 + x0 ** 2 - 2 * x * x0 * jnp.cos(y - y0)
                rp2 = rp2cyl + (z - z0) ** 2
                rp1 = jnp.sqrt(x0 ** 2 + z0 ** 2)
                evr = ((x - x0 * jnp.cos(y - y0)),
                       (x0 * jnp.sin(y - y0)) + 0.0 * x,
                       (z - z0) + 0.0 * x)
            else:   # spherical (r, θ, φ); particle polar (r0, θ0, φ0)
                th, ph = y, z
                th0, ph0 = y0, z0
                cosgam = (jnp.cos(th) * jnp.cos(th0)
                          + jnp.sin(th) * jnp.sin(th0) * jnp.cos(ph - ph0))
                rp2 = x ** 2 + x0 ** 2 - 2 * x * x0 * cosgam
                # cylindrical radius about the polar axis
                rcg = x * jnp.sin(th)
                rc0 = x0 * jnp.sin(th0)
                rp2cyl = (rcg ** 2 + rc0 ** 2
                          - 2 * rcg * rc0 * jnp.cos(ph - ph0))
                rp1 = x0
                evr = ((x - x0 * jnp.sin(th) * jnp.sin(th0)
                        * jnp.cos(ph - ph0)),
                       (x0 * (jnp.sin(th) * jnp.cos(th0)
                              - jnp.cos(th) * jnp.sin(th0)
                              * jnp.cos(ph - ph0))) + 0.0 * x,
                       (x0 * jnp.sin(th0) * jnp.sin(ph - ph0)) + 0.0 * x)
            rr = jnp.sqrt(jnp.maximum(
                rp2cyl if self._lcyl(ks) else rp2, 1e-300))
            pot = self._pot(ks)
            if pot == "plummer":
                om2 = -G * m[ks] * (rr ** 2 + rs[ks] ** 2) ** -1.5
            elif pot == "boley":
                rhill = rp1 * (G * m[ks] / 3.0) ** (1.0 / 3.0)
                rhill1 = 1.0 / jnp.maximum(rhill, 1e-300)
                om2 = jnp.where(
                    rr > rhill,
                    -G * m[ks] * rr ** -3.0,
                    G * m[ks] * (3.0 * rr * rhill1 - 4.0) * rhill1 ** 3)
            else:   # 'newton': constant inside r_smooth
                rrs = jnp.maximum(rr, rs[ks])
                om2 = -G * m[ks] * rrs ** -3.0
            gg = jnp.stack([e * om2 for e in evr])
            ggt = gg if ggt is None else ggt + gg
        return ggt

    def masses(self):
        """'fixed-cm': primary mass = 1 − Σ secondaries (pointmasses.f90)."""
        m = np.asarray(self.pmass, np.float64)
        if self.initxxq == "fixed-cm":
            ip = self.iprimary - 1
            m[ip] = 1.0 - (m.sum() - m[ip])
        return m

    def init_q(self, coords, dtype, y_range=None, z_range=None):
        """y_range/z_range: (lo, L) grid azimuth range for wrapping
        (cylindrical φ = y, spherical φ = z) — the reference wraps the
        primary's phi=pi through the grid's periodic bounds."""
        nq = self.nqpar
        ip = self.iprimary - 1
        m = self.masses()
        pos = np.zeros((nq, 3))
        vel = np.zeros((nq, 3))
        pos[:, 0] = np.asarray(self.xq0, np.float64)
        if self.initxxq == "fixed-cm":
            if coords == "spherical":
                # all masses in the midplane (pointmasses.f90:513-516)
                pos[:, 1] = math.pi / 2.0
            sec = np.arange(nq) != ip
            sma = np.abs(pos[:, 0])
            offset = np.abs((pos[sec, 0] * m[sec]).sum())
            pos[sec, 0] = np.sign(pos[sec, 0]) * (sma[sec] - offset)
            if coords == "cartesian":
                pos[ip, 0] = -np.sign((pos[sec, 0] * m[sec]).sum()) * offset
            elif coords == "cylindrical":
                pos[ip, 0] = offset
                pos[ip, 1] = math.pi
            else:
                pos[ip, 0] = offset
                pos[ip, 2] = math.pi
            if self.initvvq == "fixed-cm":
                kep = np.zeros(nq)
                kep[sec] = np.sqrt(1.0 / sma[sec])
                vbar = (kep[sec] * m[sec]).sum()
                iv = 1 if coords != "spherical" else 2
                if coords == "cartesian":
                    # v_y carries the orbit sign of each secondary's x
                    # position (pointmasses.f90:682)
                    vel[sec, iv] = np.sign(pos[sec, 0]) \
                        * (kep[sec] - vbar)
                    vel[ip, iv] = -np.sign(
                        (pos[sec, 0] * m[sec]).sum()) * vbar
                else:
                    vel[sec, iv] = kep[sec] - vbar
                    vel[ip, iv] = vbar
        if coords == "cylindrical" and y_range is not None:
            y0, Ly = y_range
            pos[:, 1] = y0 + np.mod(pos[:, 1] - y0, Ly)
        elif coords == "spherical" and z_range is not None:
            z0, Lz = z_range
            pos[:, 2] = z0 + np.mod(pos[:, 2] - z0, Lz)
        return {"xq": jnp.asarray(pos, dtype),
                "vq": jnp.asarray(vel, dtype)}

    def rhs(self, pen, df, ts):
        """Gas feels the point-mass gravity (reference dvvq_dt_pointmasses
        → get_total_gravity added to df(iux:iuz), pointmasses.f90:981).
        The current particle positions ride the pencil cache (threaded
        from state by the stepper)."""
        xq = pen._cache.get("_pm_xq")
        if xq is None or "uu" not in pen.reg.slots:
            return
        from .base import accumulate
        accumulate(df, "uu", self.gas_gravity(pen, xq))

    def accel_cart(self, xc):
        """Pairwise Newtonian gravity in cartesian, smoothing floor
        r² → max(r², r_smooth²) (gravity_pointmasses 'newtonian')."""
        m = jnp.asarray(self.masses(), xc.dtype)
        rs = np.zeros(self.nqpar) if not self.r_smooth else \
            np.asarray((list(self.r_smooth) + [0.0] * self.nqpar)
                       [: self.nqpar])
        rs2 = jnp.asarray(rs ** 2, xc.dtype)
        dx = xc[:, None, :] - xc[None, :, :]          # (i, j, 3) = x_i − x_j
        r2 = jnp.sum(dx * dx, axis=-1)
        r2 = jnp.maximum(r2, rs2[None, :])
        inv_r3 = jnp.where(r2 > 0, r2 ** -1.5, 0.0)
        eye = jnp.eye(self.nqpar, dtype=bool)
        w = jnp.where(eye, 0.0, self.GNewton * m[None, :] * inv_r3)
        return -jnp.sum(w[:, :, None] * dx, axis=1)
