"""Artificial shock viscosity profile (reference ``src/shock.f90``):

    shock = smooth( max₅( max(0, −∇·u) ) ) · Δx_min²

stored as a *communicated auxiliary* field — the reference computes it
farray-level with its own ghost communication before the mn-loop
(``calc_shock_profile``, called from src/equ.f90:211 async with the main
halo exchange).  Consumers: Viscosity('nu-shock'), Magnetic(eta_shock),
Density(diffrho_shock)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..ops.smooth import max_filter, smooth_binomial
from .base import ModuleBase


@dataclass(frozen=True)
class Shock(ModuleBase):
    name: ClassVar[str] = "shock"

    lmax_shock: bool = True       # apply the max-filter stage
    shock_div_pow: float = 1.0    # optional power on (−divu)+
    variant: str = "original"     # 'original' (shock.f90) | 'highorder'
    ishock_max: int = 1           # 'highorder': max-filter radius
    lgaussian_smooth: bool = False
    lconvergence_only: bool = True

    def register(self, reg):
        reg.register("shock", 1, "comm_aux")

    def compute_aux(self, pen, halo1):
        """pen: Pencils over the ghosted evolved fields; halo1(x) ghost-fills
        a single interior scalar.  Returns {'shock': interior}."""
        g = pen.grid
        divu = pen.divu()
        raw = jnp.maximum(-divu, 0.0) if self.lconvergence_only \
            else jnp.abs(divu)
        if self.shock_div_pow != 1.0:
            raw = raw ** self.shock_div_pow
        dxmin2 = 1.0 / jnp.maximum(
            jnp.max(g.dx_1) ** 2,
            jnp.maximum(jnp.max(g.dy_1) ** 2, jnp.max(g.dz_1) ** 2))
        if self.variant == "highorder":
            # reference shock_highorder.f90: max over ±ishock_max per
            # non-degenerate axis (re-communicated), then 7-point separable
            # smoothing (sub.f90 smoothing_kernel), then × dxmin²
            from ..ops.smooth import max_filter_axes, smooth_7pt
            active = tuple(n > 1 for n in pen.cfg.grid.shape)
            r = self.ishock_max
            gw = pen._g
            rawg = halo1(raw)
            filt = max_filter_axes(rawg, r, active)
            filt = filt[(slice(gw - r, filt.shape[0] - (gw - r)),
                         slice(gw - r, filt.shape[1] - (gw - r)),
                         slice(gw - r, filt.shape[2] - (gw - r)))]
            sm = smooth_7pt(halo1(filt), active,
                            lgaussian=self.lgaussian_smooth)
            return {"shock": sm * dxmin2}
        rawg = halo1(raw)                       # (mx, my, mz)
        if self.lmax_shock:
            filt = max_filter(rawg, 2)
        else:
            filt = rawg[2:-2, 2:-2, 2:-2]
        sm = smooth_binomial(filt)              # consumes remaining ghost
        return {"shock": sm * dxmin2}
