"""Fixed-profile gravity (reference ``src/gravity_simple.f90``): adds a
time-independent acceleration profile g(x,y,z) to the momentum equation
(dispatch at src/equ.f90:990-994).  Profiles: 'const' (uniform gz),
'linear-z' (g = −ν²z, e.g. for stratified boxes), 'sin-z'."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Gravity(ModuleBase):
    name: ClassVar[str] = "gravity"

    gravz_profile: str = "const"
    gravz: float = 0.0
    gravx: float = 0.0
    kappa_z: float = 1.0     # for 'sin-z': g = gravz·sin(kappa_z·z)
    # central potential (reference src/gravity_r.f90): g = −GM r̂/(r²+r₀²)
    mass: float = 0.0
    r0: float = 0.1

    def rhs(self, pen, df, ts):
        g = pen.grid
        zero = jnp.zeros_like(pen.uu()[0])
        if self.gravz_profile == "central":
            x, y, z = g.xg, g.yg, g.zg
            r2 = x * x + y * y + z * z + self.r0 ** 2
            fac = -self.mass * r2 ** -1.5
            accumulate(df, "uu", jnp.stack([
                fac * x + zero, fac * y + zero, fac * z + zero]))
            return
        if self.gravz_profile == "const":
            gz = self.gravz + zero
        elif self.gravz_profile == "linear-z":
            gz = self.gravz * g.zg + zero
        elif self.gravz_profile == "sin-z":
            gz = self.gravz * jnp.sin(self.kappa_z * g.zg) + zero
        else:
            raise NotImplementedError(self.gravz_profile)
        gx = self.gravx + zero if self.gravx != 0.0 else zero
        accumulate(df, "uu", jnp.stack([gx, zero, gz]))
