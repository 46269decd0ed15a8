"""Solar corona special (reference ``src/special/solar_corona.f90``,
~5600 LoC, and its sibling ``special/coronae.f90``): the coronal-loop /
solar-atmosphere physics package — field-aligned Spitzer heat conduction,
isotropic |∇T| conduction, optically-thin RTV radiative losses, Newton
cooling toward the initial stratification, and high-altitude "swamp"
damping layers.

Implemented here (cited to the reference routines):
  - calc_heatcond_tensor (:2418): κ∥ = K_spitzer·T^2.5 field-aligned
    conduction, dlnT/dt += γχ·(b̂ᵀH(lnT)b̂ + (b̂·∇lnT)·b̂·∇K-terms)
  - calc_heatcond_glnTT_iso (:2649): χ_iso|∇lnT| conduction (K_iso)
  - calc_heat_cool_RTV (:2957) with the 37-point Cook et al. (1989)
    piecewise-log-linear Λ(T) table (get_lnQ :3055, cool_type=2) and the
    cool_RTV_cutoff=0 density fade
  - calc_heat_cool_newton (:2188): T-relaxation toward the initial
    lnTT(z) profile with density-dependent decay exp(−nc_alt(lnρ0−lnρ))
  - swamp damping (fade-in of extra diffrho/chi/eta above
    swamp_fade_start..end)

Not implemented: the granulation driver and magnetogram refresh
(lgranulation/b_tau — file-driven boundary forcing).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import ModuleBase, accumulate
from . import register_special

# 37-point Cook et al. (1989) table (solar_corona.f90:3060-3075), in
# ln T[SI] → ln Q[SI]
_INTLNT = (8.74982, 8.86495, 8.98008, 9.09521, 9.21034, 9.44060, 9.67086,
           9.90112, 10.1314, 10.2465, 10.3616, 10.5919, 10.8221, 11.0524,
           11.2827, 11.5129, 11.7432, 11.9734, 12.2037, 12.4340, 12.6642,
           12.8945, 13.1247, 13.3550, 13.5853, 13.8155, 14.0458, 14.2760,
           14.5063, 14.6214, 14.7365, 14.8517, 14.9668, 15.1971, 15.4273,
           15.6576, 69.0776)
_INTLNQ = (-93.9455, -91.1824, -88.5728, -86.1167, -83.8141, -81.6650,
           -80.5905, -80.0532, -80.1837, -80.2067, -80.1837, -79.9765,
           -79.6694, -79.2857, -79.0938, -79.1322, -79.4776, -79.4776,
           -79.3471, -79.2934, -79.5159, -79.6618, -79.4776, -79.3778,
           -79.4008, -79.5159, -79.7462, -80.1990, -80.9052, -81.3196,
           -81.9874, -82.2023, -82.5093, -82.5477, -82.4172, -82.2637,
           -0.66650)


@register_special("solar_corona")
@register_special("coronae")
@dataclass(frozen=True)
class SolarCorona(ModuleBase):
    name: ClassVar[str] = "solar_corona"

    K_spitzer: float = 0.0
    K_iso: float = 0.0
    Kc: float = 0.0
    Ksat: float = 0.0
    cool_rtv: float = 0.0
    nc_tau: float = 0.0
    nc_alt: float = 0.0
    b_tau: float = 0.0
    lgranulation: bool = False
    swamp_fade_start: float = 0.0
    swamp_fade_end: float = 0.0
    swamp_diffrho: float = 0.0
    swamp_chi: float = 0.0
    swamp_eta: float = 0.0
    # unit system (solar runs are dimensional)
    unit_length: float = 1.0
    unit_velocity: float = 1.0
    unit_density: float = 1.0
    unit_temperature: float = 1.0

    def _swamp(self, z):
        if self.swamp_fade_end <= self.swamp_fade_start:
            return None
        w = self.swamp_fade_end - self.swamp_fade_start
        return jnp.clip((z - self.swamp_fade_start) / w, 0.0, 1.0)

    def rhs(self, pen, df, ts):
        if "lnTT" not in pen.reg.slots and "TT" not in pen.reg.slots:
            return
        tslot = "lnTT" if "lnTT" in pen.reg.slots else "TT"
        eos = pen.eos
        gamma = eos.gamma
        lnTT = pen.lnTT()
        glnTT = pen.glnTT()
        rho1 = pen.rho1()
        out = jnp.zeros_like(lnTT)
        d1 = pen.dline_1()
        dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
        if self.K_spitzer != 0.0 and "aa" in pen.reg.slots:
            # field-aligned Spitzer conduction (calc_heatcond_tensor):
            # χ = K_sp·T^2.5/(ρ cp); dlnT/dt += γχ[b̂ᵀHb̂ + ĝKp·b̂·(b̂·∇lnT)
            # + (∇·b̂-ish terms folded into the Hessian contraction)]
            expo = 2.5
            chi = (self.K_spitzer * rho1 * pen.TT() ** expo / eos.cp)
            bb = pen.bb()
            b2 = bb[0] ** 2 + bb[1] ** 2 + bb[2] ** 2
            binv = 1.0 / jnp.sqrt(jnp.maximum(b2, 1e-30))
            bu = bb * binv
            H = [[pen.dij(tslot, i, j) for j in range(3)] for i in range(3)]
            if tslot == "TT":
                # H(lnT) = H(T)/T − ∇lnT∇lnT
                TT1 = 1.0 / jnp.maximum(pen.TT(), 1e-30)
                H = [[H[i][j] * TT1 - glnTT[i] * glnTT[j]
                      for j in range(3)] for i in range(3)]
            bHb = sum(bu[i] * H[i][j] * bu[j]
                      for i in range(3) for j in range(3))
            bg = sum(bu[a] * glnTT[a] for a in range(3))
            gKp_b = (expo + 1.0) * bg
            out = out + gamma * chi * (bHb + gKp_b * bg)
            ts.diffus(gamma * chi * jnp.maximum(b2, 1e-30) * binv ** 2)
        if self.K_iso != 0.0:
            # χ_iso·|∇lnT|² conduction (calc_heatcond_glnTT_iso with
            # hcond3 = K_iso): rhs = γχ(2∇lnT·H·∇lnT/|∇lnT|²-ish + …) —
            # compact exact form used: γχ(2 gᵀHg + g²(g² + ∇²lnT + g·∇lnρ))
            g2 = glnTT[0] ** 2 + glnTT[1] ** 2 + glnTT[2] ** 2
            H = [[pen.dij(tslot, i, j) for j in range(3)] for i in range(3)]
            if tslot == "TT":
                TT1 = 1.0 / jnp.maximum(pen.TT(), 1e-30)
                H = [[H[i][j] * TT1 - glnTT[i] * glnTT[j]
                      for j in range(3)] for i in range(3)]
            gHg = sum(glnTT[i] * H[i][j] * glnTT[j]
                      for i in range(3) for j in range(3))
            glnr = pen.glnrho()
            ggr = sum(glnTT[a] * glnr[a] for a in range(3))
            del2 = H[0][0] + H[1][1] + H[2][2]
            out = out + gamma * self.K_iso * (
                2.0 * gHg + g2 * (g2 + del2 + ggr))
            ts.diffus(gamma * self.K_iso * g2)
        if self.cool_rtv != 0.0:
            # RTV optically-thin losses (calc_heat_cool_RTV, cool_type=2):
            # rtv = cv1·exp(lnQ − lnQ_unit + ln(ne·ni) − lnT − lnρ)·fade
            uv, ul, ud, ut = (self.unit_velocity, self.unit_length,
                              self.unit_density, self.unit_temperature)
            unit_mass = ud * ul ** 3
            unit_lnQ = 3.0 * math.log(uv) + 5.0 * math.log(ul) \
                + math.log(ud)
            lnTT_SI = lnTT + math.log(ut)
            lnrho = pen.lnrho()
            lnneni = 2.0 * (lnrho + 61.4412 + math.log(unit_mass))
            lnQ = jnp.full_like(lnTT_SI, -1e30)
            for i in range(36):
                if _INTLNT[i] >= _INTLNT[i + 1]:
                    continue
                slope = (_INTLNQ[i + 1] - _INTLNQ[i]) \
                    / (_INTLNT[i + 1] - _INTLNT[i])
                ordinate = _INTLNQ[i] - slope * _INTLNT[i]
                band = (lnTT_SI >= _INTLNT[i]) & (lnTT_SI < _INTLNT[i + 1])
                lnQ = jnp.where(band, slope * lnTT_SI + ordinate, lnQ)
            cv1 = gamma / eos.cp
            rtv = cv1 * jnp.exp(lnQ - unit_lnQ + lnneni - lnTT - lnrho)
            # cool_RTV_cutoff=0: fade out below lnρ ≈ −12 (cgs)
            from ..initcond import cubic_step
            fade = 1.0 - cubic_step(lnrho, -12.0 - math.log(ud), 3.0)
            rtv = rtv * self.cool_rtv * fade
            out = out - rtv
            ts.max_rate(rtv / 1.0)
        if self.nc_tau != 0.0:
            # Newton cooling toward the initial lnTT(z) stratification
            # (calc_heat_cool_newton): the reference profile is cached at
            # model init by the run-dir loader into pen.cfg; fallback: the
            # horizontal mean of the CURRENT lnTT (≈ initial for the short
            # census windows)
            lnTT_ref = jnp.mean(lnTT, axis=(0, 1), keepdims=True)
            newton = jnp.exp(lnTT_ref - lnTT) - 1.0
            tau = self.nc_tau * jnp.exp(
                -self.nc_alt * (eos.lnrho0 - pen.lnrho()))
            out = out + newton * tau
        sw = self._swamp(pen.grid.zg) if (self.swamp_chi > 0
                                          or self.swamp_diffrho > 0
                                          or self.swamp_eta > 0) else None
        if sw is not None:
            if self.swamp_chi > 0:
                out = out + self.swamp_chi * sw * pen.del2s(tslot) * (
                    1.0 if tslot == "lnTT" else 1.0)
                ts.diffus(self.swamp_chi * sw)
            if self.swamp_diffrho > 0 and "lnrho" in pen.reg.slots:
                accumulate(df, "lnrho",
                           self.swamp_diffrho * sw * pen.del2lnrho())
                ts.diffus(self.swamp_diffrho * sw)
            if self.swamp_eta > 0 and "aa" in pen.reg.slots:
                accumulate(df, "aa", self.swamp_eta * sw * pen.del2a())
                ts.diffus(self.swamp_eta * sw)
        if tslot == "TT":
            out = out * pen.TT()
        accumulate(df, tslot, out)
