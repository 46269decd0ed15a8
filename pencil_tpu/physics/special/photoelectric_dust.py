"""Photoelectric-heating dust EOS (reference
``src/special/photoelectric_dust.f90`` — Lyra & Kuchner 2013): the gas
pressure is set by the dust through photoelectric heating,

    fpres = −κµ·ρ^{µ−1}∇lnρ                               (polytropic)
            −f_pe·(cs₀²/γ)·ρ_d(∇ln ρ_d + ∇lnρ)           (photoelectric)
            −f_iso·cs²(∇lnρ + ∇lnT)                       (local-iso)

added to du/dt in place of the ordinary pressure gradient
(lpressuregradient_gas must be F, :131-137).  The fluid-dust branch uses
ρ_d = m_d·n_d from the dustdensity slot (m_d = 1);
the sound-speed CFL becomes (f_iso·cs² + f_pe·cs₀²/γ·γ⁻¹ + κµ)·Σ Δ⁻²
(:173-175)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("photoelectric_dust")
@dataclass(frozen=True)
class PhotoelectricDust(Special):
    name: ClassVar[str] = "photoelectric_dust"

    mu: float = 1.0
    kappa: float = 0.0
    factor_localiso: float = 0.0
    factor_photoelectric: float = 1.0
    ldust_pressureforce: bool = True

    def rhs(self, pen, df, ts):
        if not self.ldust_pressureforce or "uu" not in pen.reg.slots:
            return
        eos = pen.eos
        const1 = self.kappa * self.mu
        const2 = self.factor_photoelectric * eos.cs20 / eos.gamma
        const3 = self.factor_localiso
        glnrho = pen.glnrho()
        fpres = 0.0
        if const1 != 0.0:
            fpres = fpres - const1 * pen.rho() ** (self.mu - 1.0) * glnrho
        if const2 != 0.0 and "lnnd" in pen.reg.slots:
            rhod = jnp.exp(pen.field("lnnd"))     # m_d = 1: ρ_d = n_d
            glnnd = pen.grad("lnnd")
            fpres = fpres - const2 * rhod * (glnnd + glnrho)
        if const3 != 0.0:
            fpres = fpres - const3 * pen.cs2() * (glnrho + pen.glnTT())
        if not isinstance(fpres, float):
            accumulate(df, "uu", fpres)
        # NOTE on the CFL: photoelectric_dust.f90:173 ASSIGNS its
        # effective advec_cs2 inside special_calc_hydro, but that runs
        # from duu_dt — denergy_dt (noentropy) executes afterwards and
        # overwrites it with the plain cs²·Σ Δ⁻², which hydro already
        # accumulates here; so no advec2 contribution from this module.
