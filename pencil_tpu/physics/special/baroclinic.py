"""Global baroclinic instability forcing (reference
``src/special/baroclinic_run.f90``): a large-scale radial pressure
gradient, parameterised by Bshear, drives the shearing box,

    du_x/dt += Bshear·p₀·(strat/ρ − 1/ρ₀)            (:165-176)
    ds/dt   += (1/ρT)·Bshear·p₀·u_x·strat/(γ−1)       (:177-204)

with p₀ = ρ₀cs₀²/γ and strat = 1 for unstratified/2-D runs (nzgrid==1 →
lstratification=F, :29-30).  Static stratification exp(−γΦ/cs₀²) is
supported via the gravity module's potential."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("baroclinic_run")
@dataclass(frozen=True)
class BaroclinicRun(Special):
    name: ClassVar[str] = "baroclinic_run"

    bshear: float = 0.0
    lunstratified: bool = False
    lstatic_stratification: bool = False

    def _strat(self, pen):
        gs = pen.cfg.grid
        if gs.nz == 1 or self.lunstratified:
            return 1.0
        if self.lstatic_stratification:
            grav = pen.cfg.module("gravity")
            eos = pen.eos
            if grav is not None and grav.ipotential:
                pot = grav.potential(jnp.sqrt(
                    pen.grid.xg ** 2 + pen.grid.yg ** 2
                    + pen.grid.zg ** 2))
                return jnp.exp(-eos.gamma * pot / eos.cs20)
        return 1.0

    def rhs(self, pen, df, ts):
        if self.bshear == 0.0 or "uu" not in pen.reg.slots:
            return
        eos = pen.eos
        p0 = eos.rho0 * eos.cs20 / eos.gamma
        strat = self._strat(pen)
        rho1 = pen.rho1()
        ux_force = self.bshear * p0 * (rho1 * strat - 1.0 / eos.rho0)
        zero = jnp.zeros_like(ux_force)
        accumulate(df, "uu", jnp.stack([ux_force, zero, zero]))
        rhs = (self.bshear * p0 * pen.uu()[0] * strat
               / (eos.gamma - 1.0))
        if "ss" in pen.reg.slots:
            accumulate(df, "ss", rho1 / pen.TT() * rhs)
        elif "lnTT" in pen.reg.slots:
            cv1 = eos.gamma / eos.cp
            accumulate(df, "lnTT", cv1 * rho1 / pen.TT() * rhs)
        elif "TT" in pen.reg.slots:
            cv1 = eos.gamma / eos.cp
            accumulate(df, "TT", cv1 * rho1 * rhs)
