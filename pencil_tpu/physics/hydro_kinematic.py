"""Prescribed (kinematic) velocity field (reference
``src/hydro_kinematic.f90``, 3719 LoC): no momentum equation is evolved;
the flow is an analytic profile used by induction/scalars — the classic
kinematic-dynamo configuration.

Profiles: 'ABC' (A sin kz + C cos ky, ...) and 'roberts' (Roberts flow I).
Analytic derivatives are supplied so uij/divu need no ghost zones."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase


@dataclass(frozen=True)
class HydroKinematic(ModuleBase):
    name: ClassVar[str] = "hydro_kinematic"

    profile: str = "ABC"
    ampl: float = 1.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    # ABC coefficients
    A: float = 1.0
    B: float = 1.0
    C: float = 1.0
    # poshel-roberts mixing angles, degrees (hydro_kinematic.f90:98)
    chi: float = 45.0
    delta: float = 0.0

    def rhs(self, pen, df, ts):
        # kinematic flow still sets the advective CFL class
        # (hydro_kinematic.f90:2620-2621: advec_uu = Σ|u_a|·dline_1_a)
        import jax.numpy as jnp
        d1 = pen.dline_1()
        uu = pen.uu()
        ts.advec(sum(jnp.abs(uu[a]) * d1[a] for a in range(3)))

    def flow(self, pen):
        g = pen.grid
        x, y, z = g.xg, g.yg, g.zg
        a = self.ampl
        if self.profile == "ABC":
            ux = a * (self.A * jnp.sin(self.kz * z) + self.C * jnp.cos(self.ky * y))
            uy = a * (self.B * jnp.sin(self.kx * x) + self.A * jnp.cos(self.kz * z))
            uz = a * (self.C * jnp.sin(self.ky * y) + self.B * jnp.cos(self.kx * x))
            one = jnp.ones(pen_shape(pen), x.dtype)
            return jnp.stack([ux * one, uy * one, uz * one])
        if self.profile == "roberts":
            # Glen Roberts flow, reference phase convention
            # (hydro_kinematic.f90:758-767, eps_kinflow=0):
            # u = (sin kx·cos ky, −cos kx·sin ky, √2 sin kx·sin ky)
            kx, ky = self.kx, self.ky
            ux = a * jnp.sin(kx * x) * jnp.cos(ky * y)
            uy = -a * jnp.cos(kx * x) * jnp.sin(ky * y)
            uz = a * jnp.sqrt(2.0) * jnp.sin(kx * x) * jnp.sin(ky * y)
            one = jnp.ones(pen_shape(pen), x.dtype)
            return jnp.stack([ux * one, uy * one, uz * one])
        if self.profile == "poshel-roberts":
            # positive-helicity Roberts flow with mixing angle chi_uukin
            # (hydro_kinematic.f90:850-862): fac=A·cos(χ)·√2, fac2=A·sin(χ)·2
            import math as _m
            kx, ky = self.kx, self.ky
            fac = a * _m.cos(_m.radians(self.chi)) * _m.sqrt(2.0)
            fac2 = a * _m.sin(_m.radians(self.chi)) * 2.0
            dl = _m.radians(self.delta)
            ux = -fac * jnp.cos(kx * x) * jnp.sin(ky * y)
            uy = fac * jnp.sin(kx * x) * jnp.cos(ky * y)
            uz = fac2 * jnp.cos(kx * x + dl) * jnp.cos(ky * y + dl)
            one = jnp.ones(pen_shape(pen), x.dtype)
            return jnp.stack([ux * one, uy * one, uz * one])
        if self.profile == "rigid-x":
            # rigid rotation about the Cartesian x-axis, expressed in
            # SPHERICAL components (the yin-yang overset advection test:
            # the flow crosses both patches' horizontal boundaries);
            # u_cart = ampl·x̂×r = ampl·(0, −z_c, y_c)
            th, ph = y, z     # spherical: (r, θ, φ)
            r = x
            st, ct = jnp.sin(th), jnp.cos(th)
            sp, cp = jnp.sin(ph), jnp.cos(ph)
            ucx = 0.0 * st
            ucy = -a * r * ct
            ucz = a * r * st * sp
            # project onto (r̂, θ̂, φ̂)
            ur = ucx * st * cp + ucy * st * sp + ucz * ct
            uth = ucx * ct * cp + ucy * ct * sp - ucz * st
            uph = -ucx * sp + ucy * cp
            one = jnp.ones(pen_shape(pen), x.dtype)
            return jnp.stack([ur * one, uth * one, uph * one])
        raise NotImplementedError(self.profile)

    def flow_uij(self, pen):
        """Analytic u_{i;j}: (3,3,nx,ny,nz)."""
        g = pen.grid
        x, y, z = g.xg, g.yg, g.zg
        a = self.ampl
        one = jnp.ones(pen_shape(pen), x.dtype)
        zero = 0.0 * one
        if self.profile == "ABC":
            kx, ky, kz = self.kx, self.ky, self.kz
            rows = [
                [zero, -a * self.C * ky * jnp.sin(ky * y) * one,
                 a * self.A * kz * jnp.cos(kz * z) * one],
                [a * self.B * kx * jnp.cos(kx * x) * one, zero,
                 -a * self.A * kz * jnp.sin(kz * z) * one],
                [-a * self.B * kx * jnp.sin(kx * x) * one,
                 a * self.C * ky * jnp.cos(ky * y) * one, zero],
            ]
            return jnp.stack([jnp.stack(r) for r in rows])
        if self.profile == "roberts":
            kx, ky = self.kx, self.ky
            sx, cx = jnp.sin(kx * x), jnp.cos(kx * x)
            sy, cy = jnp.sin(ky * y), jnp.cos(ky * y)
            s2 = jnp.sqrt(2.0)
            # reference hydro_kinematic.f90:772-783 (eps_kinflow=0)
            rows = [
                [a * kx * cx * cy * one, -a * ky * sx * sy * one, zero],
                [a * kx * sx * sy * one, -a * ky * cx * cy * one, zero],
                [a * s2 * kx * cx * sy * one, a * s2 * ky * sx * cy * one,
                 zero],
            ]
            return jnp.stack([jnp.stack(r) for r in rows])
        if self.profile == "poshel-roberts":
            import math as _m
            kx, ky = self.kx, self.ky
            fac = a * _m.cos(_m.radians(self.chi)) * _m.sqrt(2.0)
            fac2 = a * _m.sin(_m.radians(self.chi)) * 2.0
            dl = _m.radians(self.delta)
            sx, cx = jnp.sin(kx * x), jnp.cos(kx * x)
            sy, cy = jnp.sin(ky * y), jnp.cos(ky * y)
            sxd, cxd = jnp.sin(kx * x + dl), jnp.cos(kx * x + dl)
            syd, cyd = jnp.sin(ky * y + dl), jnp.cos(ky * y + dl)
            rows = [
                [fac * kx * sx * sy * one, -fac * ky * cx * cy * one, zero],
                [fac * kx * cx * cy * one, -fac * ky * sx * sy * one, zero],
                [-fac2 * kx * sxd * cyd * one, -fac2 * ky * cxd * syd * one,
                 zero],
            ]
            return jnp.stack([jnp.stack(r) for r in rows])
        raise NotImplementedError(self.profile)


def pen_shape(pen):
    g = 3
    nc, mx, my, mz = pen.fg.shape
    return (mx - 2 * g, my - 2 * g, mz - 2 * g)
