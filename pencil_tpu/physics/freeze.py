"""Radial freeze zones (reference ``src/equ.f90:424-520`` + CFL
exclusion at :1105-1133): df of selected variables is masked to zero
inside r ≤ rfreeze_int and/or outside r ≥ rfreeze_ext — the disk-in-a-box
boundary treatment (lfreeze_uint/uext, lfreeze_lnrhoint/…, hydro.f90:1091,
density.f90:692, magnetic.f90:1338, entropy.f90:683).  rfreeze defaults
to r_int/r_ext (run.f90:259-260).  wfreeze > 0 smooths the mask with a
quintic step (sub.f90:4738)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase


def quintic_step(x, x0, width, shift=0.0):
    xi = (x - x0) / (width + 1e-30) - shift
    xi = jnp.clip(xi, -1.0, 1.0)
    return 0.5 + xi * (0.9375 + xi ** 2 * (-0.625 + xi ** 2 * 0.1875))


@dataclass(frozen=True)
class FreezeZones(ModuleBase):
    name: ClassVar[str] = "freeze_zones"

    rfreeze_int: float = -9e99     # -9e99 = zone off
    rfreeze_ext: float = -9e99
    wfreeze_int: float = 0.0
    wfreeze_ext: float = 0.0
    fshift_int: float = -1.0       # cdata.f90:637 defaults
    fshift_ext: float = 1.0
    fields_int: Tuple[str, ...] = ()
    fields_ext: Tuple[str, ...] = ()
    # radius choice: rcyl for lcylinder_in_a_box / cylindrical coords,
    # spherical r otherwise (equ.f90:435-441)
    lcyl: bool = False

    def radius(self, grid, gs):
        zero = jnp.zeros((gs.nx, gs.ny, gs.nz), grid.z.dtype)
        if gs.coords in ("cylindrical", "spherical"):
            return grid.xg + zero
        if self.lcyl:
            return jnp.sqrt(grid.xg ** 2 + grid.yg ** 2) + zero
        return jnp.sqrt(grid.xg ** 2 + grid.yg ** 2 + grid.zg ** 2) + zero

    def masks(self, grid, gs):
        """(mask_int, mask_ext): multiplicative df masks, or None."""
        r = None
        mi = me = None
        if self.fields_int and self.rfreeze_int > -1e99:
            r = self.radius(grid, gs)
            if self.wfreeze_int == 0.0:
                mi = jnp.where(r <= self.rfreeze_int, 0.0, 1.0)
            else:
                mi = quintic_step(r, self.rfreeze_int, self.wfreeze_int,
                                  self.fshift_int)
        if self.fields_ext and self.rfreeze_ext > -1e99:
            if r is None:
                r = self.radius(grid, gs)
            if self.wfreeze_ext == 0.0:
                me = jnp.where(r >= self.rfreeze_ext, 0.0, 1.0)
            else:
                me = 1.0 - quintic_step(r, self.rfreeze_ext,
                                        self.wfreeze_ext, self.fshift_ext)
        return mi, me

    def cfl_mask(self, grid, gs):
        """Zero the pointwise CFL rate in frozen zones (equ.f90:1105)."""
        r = self.radius(grid, gs)
        keep = jnp.ones_like(r)
        if self.fields_int and self.rfreeze_int > -1e99:
            keep = jnp.where(r <= self.rfreeze_int, 0.0, keep)
        if self.fields_ext and self.rfreeze_ext > -1e99:
            keep = jnp.where(r >= self.rfreeze_ext, 0.0, keep)
        return keep
