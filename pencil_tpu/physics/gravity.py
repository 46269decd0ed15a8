"""Fixed-profile gravity (reference ``src/gravity_simple.f90``): adds a
time-independent acceleration profile g(x,y,z) to the momentum equation
(dispatch at src/equ.f90:990-994).  Profiles: 'const' (uniform gz),
'linear-z' (g = −ν²z, e.g. for stratified boxes), 'sin-z'."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate

# Padé star potentials Φ(r) = −(a0 + a2·r² + a3·r³)/(1 + b2·r² + b3·r³
# + a3·r⁴), cpot = (a0, a2, a3, b2, b3) (reference src/gravity_r.f90:
# 205-250 cpot tables, potential at :745-747, g_r at :323-330)
PADE_STARS = {
    "zero": (0.0, 0.0, 0.0, 0.0, 0.0),
    "solar": (5.088, -4.344, 61.36, 10.91, -13.93),
    "M5-dwarf": (2.3401, 0.44219, 2.5952, 1.5986, 0.20851),
    "M2-sgiant": (1.100, 0.660, 2.800, 1.400, 0.100),
    "A7-star": (4.080, -3.444, 15.2000, 11.2000, -12.1000),
    "A0-star": (4.3641, -1.5612, 0.4841, 4.0678, 1.2548),
    "simple": (1.0, 0.0, 0.0, 1.0, 0.0),
    "simple-2": (1.0, 1.0, 0.0, 1.0, 1.0),
}


def _pade_pot(cpot, r):
    a0, a2, a3, b2, b3 = cpot
    q = 1.0 + r * r * (b2 + r * (b3 + r * a3))
    return -(a0 + r * r * (a2 + r * a3)) / q


def _pade_gr(cpot, r):
    a0, a2, a3, b2, b3 = cpot
    p = (2.0 * (a0 * b2 - a2)
         + r * (3.0 * (a0 * b3 - a3)
                + r * (4.0 * a0 * a3
                       + r * ((b3 * a2 - a3 * b2)
                              + r * (2.0 * a2 * a3 + r * a3 * a3)))))
    q = 1.0 + r * r * (b2 + r * (b3 + r * a3))
    return -r * p / (q * q)


@dataclass(frozen=True)
class Gravity(ModuleBase):
    name: ClassVar[str] = "gravity"

    gravz_profile: str = "const"
    gravz: float = 0.0
    gravx: float = 0.0
    # gravity_simple x-profiles ('kepler': g_x = −gravx/x², Φ = −gravx/x,
    # gravity_simple.f90:305)
    gravx_profile: str = "const" 
    # top of the polytropic atmosphere: Φ = −g_z(z − z∞)
    # (gravity_simple.f90:427; defaults to 0 when not given, :230)
    zinfty: float = 0.0
    # reference height where lnrho=lnrho0, cs2=cs20 (gravity_simple
    # zref namelist; 9e99 = the reference's `impossible` sentinel)
    zref: float = 9e99
    # cgs base units for profiles with physical constants ('Ferriere')
    unit_length: float = 1.0
    unit_velocity: float = 1.0
    kappa_z: float = 1.0     # for 'sin-z': g = gravz·sin(kappa_z·z)
    # central potential (reference src/gravity_r.f90): g = −GM r̂/(r²+r₀²)
    mass: float = 0.0
    r0: float = 0.1
    # gravity_r 'smoothed-newton' (gravity_r.f90:251,730):
    #   Φ(r) = −g0/(rⁿ + r0ⁿ)^{1/n},  g_r = −g0 r^{n−1}(rⁿ+r0ⁿ)^{−(n+1)/n}
    ipotential: str = ""
    g0: float = 0.0
    r0_pot: float = 0.1
    n_pot: int = 10
    # 'varying-q': g_r = −g0·r^(1−2q) (gravity_r.f90:337, used by the
    # FARGO solid-rotation tests); 'varying-q-smooth':
    # g_r = −g0·r/(r²+r0²)^q (:339)
    qgshear: float = 1.5
    lcylindrical_gravity: bool = False

    @property
    def _r0(self):
        # 'no-smooth'/'newton' have no softening (gravity_r.f90:736)
        return 0.0 if self.ipotential in ("no-smooth", "newton",
                                          "newtonian") else self.r0_pot

    def potential(self, r):
        """Φ(r) for 'smoothed-newton'/'newton'/Padé stars (used by disk
        and star ICs, centrifugal_balance.f90:596, density.f90:1269)."""
        if self.ipotential in PADE_STARS:
            return _pade_pot(PADE_STARS[self.ipotential], r)
        if self.ipotential == "varying-q":
            q2 = 2.0 - 2.0 * self.qgshear
            if abs(q2) < 1e-12:
                import jax.numpy as jnp
                return self.g0 * jnp.log(r)
            return self.g0 * r ** q2 / q2
        n = float(self.n_pot)
        return -self.g0 * (r ** n + self._r0 ** n) ** (-1.0 / n)

    @property
    def pot0(self):
        """Φ(r=0) (the reference's POT0 output)."""
        if self.ipotential in PADE_STARS:
            return -PADE_STARS[self.ipotential][0]
        return -self.g0 / max(self._r0, 1e-30)

    def g_r(self, r):
        """Radial acceleration −dΦ/dr with the chosen softening."""
        if self.ipotential in PADE_STARS:
            return _pade_gr(PADE_STARS[self.ipotential], r)
        if self.ipotential == "varying-q":
            return -self.g0 * r ** (1.0 - 2.0 * self.qgshear)
        if self.ipotential == "varying-q-smooth":
            return -self.g0 * r / (r ** 2
                                   + self.r0_pot ** 2) ** self.qgshear
        n = float(self.n_pot)
        return (-self.g0 * r ** (n - 1.0)
                * (r ** n + self._r0 ** n) ** (-(n + 1.0) / n))

    def potential_field(self, grid, spec):
        """Gravity potential Φ over the interior grid (reference
        potential() calls in e.g. isothermal_density, density.f90:3146);
        broadcastable against (nx, ny, nz)."""
        z = grid.zg
        if self.ipotential in ("smoothed-newton", "geo-kws", "newton",
                               "no-smooth", "varying-q",
                               "varying-q-smooth") \
                or self.ipotential in PADE_STARS:
            x, y = grid.xg, grid.yg
            if getattr(spec, "coords", "cartesian") != "cartesian":
                r = x
            else:
                r2 = x * x + y * y
                if not self.lcylindrical_gravity:
                    r2 = r2 + z * z
                r = jnp.sqrt(r2)
            return self.potential(r)
        if self.gravz_profile == "central":
            x, y = grid.xg, grid.yg
            r = jnp.sqrt(x * x + y * y + z * z + self.r0 ** 2)
            return -self.mass / r
        if self.gravx_profile == "kepler":
            return -self.gravx / grid.xg
        if self.gravz_profile in ("const", "zero"):
            if self.gravz_profile == "zero":
                return jnp.zeros_like(z)
            return -self.gravz * (z - self.zinfty)
        if self.gravz_profile in ("linear-z", "linear"):
            # g_z = gravz·z (gravz = −ν_epi²) → Φ = −½·gravz·z²
            return -0.5 * self.gravz * z ** 2
        if self.gravz_profile == "sin-z":
            return (self.gravz / self.kappa_z) * jnp.cos(self.kappa_z * z)
        return jnp.zeros_like(z)

    def gvec(self, pen):
        """Acceleration field (3, nx, ny, nz) — shared by the gas and any
        Lagrangian/dust fluids (reference duu_dt + duud_dt gravity)."""
        g = pen.grid
        zero = jnp.zeros(pen.cfg.grid.shape if pen.cfg is not None
                         else pen.lnrho().shape, g.z.dtype)
        if self.ipotential in ("smoothed-newton", "geo-kws", "newton",
                               "no-smooth", "varying-q",
                               "varying-q-smooth") \
                or self.ipotential in PADE_STARS:
            x, y, z = g.xg, g.yg, g.zg
            if pen.cfg is not None and pen.cfg.grid.coords != "cartesian":
                # cylindrical/spherical: x is the radius, g along x̂
                r = x + zero
                return jnp.stack([self.g_r(r), zero, zero])
            r2 = x * x + y * y
            if not self.lcylindrical_gravity:
                r2 = r2 + z * z
            r = jnp.sqrt(r2)
            fac = self.g_r(r) / jnp.maximum(r, 1e-30)
            gz = fac * z + zero if not self.lcylindrical_gravity else zero
            return jnp.stack([fac * x + zero, fac * y + zero, gz])
        if self.gravz_profile == "central":
            x, y, z = g.xg, g.yg, g.zg
            r2 = x * x + y * y + z * z + self.r0 ** 2
            fac = -self.mass * r2 ** -1.5
            return jnp.stack([
                fac * x + zero, fac * y + zero, fac * z + zero])
        if self.gravx_profile == "kepler":
            gx = -self.gravx / g.xg ** 2 + zero
            gz = (self.gravz + zero if self.gravz_profile == "const"
                  else zero)
            return jnp.stack([gx, zero, gz])
        if self.gravz_profile in ("const", "zero"):
            gz = (self.gravz if self.gravz_profile == "const" else 0.0) \
                + zero
        elif self.gravz_profile in ("linear-z", "linear"):
            gz = self.gravz * g.zg + zero
        elif self.gravz_profile == "sin-z":
            gz = self.gravz * jnp.sin(self.kappa_z * g.zg) + zero
        elif self.gravz_profile.lower() == "ferriere":
            # K. Ferriere ApJ 497, 759 (1998) eq 34 at solar radius
            # (gravity_simple.f90:536-553): stellar-disk + dark-halo terms,
            # cgs constants a_S=4.4e-9, z_S=6.172e20, a_D=1.7e-9,
            # z_D=3.086e21 converted with the run's unit system
            uv, ul = self.unit_velocity, self.unit_length
            utime = ul / uv
            g_A = 4.4e-9 / uv * utime
            g_B = 6.172e20 / ul
            g_C = 1.7e-9 / uv * utime
            g_D = 3.086e21 / ul
            zz = g.zg
            gz = -(g_A * zz / jnp.sqrt(zz ** 2 + g_B ** 2)
                   + g_C * zz / g_D) + zero
        else:
            raise NotImplementedError(self.gravz_profile)
        gx = self.gravx + zero if self.gravx != 0.0 else zero
        return jnp.stack([gx, zero, gz])

    def rhs(self, pen, df, ts):
        if "uu" in pen.reg.slots:
            g = self.gvec(pen)
            # cache so hydro's lcdt_tauf force limit can exclude gravity
            # like the reference (Fmax sampled before duu_dt_grav)
            pen._cache["_grav_duu"] = g
            accumulate(df, "uu", g)
