"""Solar corona driver special (reference ``src/special/coronae.f90``):
grid-scale hyperdiffusion in [1/s] units, isotropic gradient-dependent
heat conduction, and the Cook et al. (1989) RTV optically-thin radiative
losses, for lnTT-evolving coronal loop models.

Implemented pieces (the ones the coronae samples exercise in their run
namelists):
  - cool_RTV        L = n_e n_H Q(T_e) with the 37-point lnQ(lnT) table
                    (calc_heat_cool_RTV :1792-1896, getlnQ) and the
                    dt1_max = L/cdts timestep limit
  - hcond_grad_iso  ∇·(|∇lnT|²·ρ·∇T)/(ρT) (calc_heatcond_glnTT_iso
                    :1712-1790)
  - hyper3_nu/eta/chi/diffrho   raw δ⁶ hyperdiffusion with IGNOREDX —
                    the coefficients carry [1/s] (special_calc_hydro
                    :931-960, special_calc_energy :888-905,
                    special_calc_density :1032-1043, special_calc_magnetic)
NOT implemented: the stochastic granulation driver (lgranulation — a
granule life-cycle model forcing photospheric vorticity) and the
magnetogram time-relaxation (lmag_time_bound/b_tau); runs using them get
the quiet lower boundary instead.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special

# Cook et al. (1989) radiative-loss table, ln T [SI] → ln Q [W m³]
# (coronae.f90 getlnQ)
_INTLNT = (8.74982, 8.86495, 8.98008, 9.09521, 9.21034, 9.44060, 9.67086,
           9.90112, 10.1314, 10.2465, 10.3616, 10.5919, 10.8221, 11.0524,
           11.2827, 11.5129, 11.7432, 11.9734, 12.2037, 12.4340, 12.6642,
           12.8945, 13.1247, 13.3550, 13.5853, 13.8155, 14.0458, 14.2760,
           14.5063, 14.6214, 14.7365, 14.8517, 14.9668, 15.1971, 15.4273,
           15.6576, 69.0776)
_INTLNQ = (-100.9455, -93.1824, -88.5728, -86.1167, -83.8141, -81.6650,
           -80.5905, -80.0532, -80.1837, -80.2067, -80.1837, -79.9765,
           -79.6694, -79.2857, -79.0938, -79.1322, -79.4776, -79.4776,
           -79.3471, -79.2934, -79.5159, -79.6618, -79.4776, -79.3778,
           -79.4008, -79.5159, -79.7462, -80.1990, -80.9052, -81.3196,
           -81.9874, -82.2023, -82.5093, -82.5477, -82.4172, -82.2637,
           250.66650)


@register_special("coronae")
@dataclass(frozen=True)
class Coronae(Special):
    name: ClassVar[str] = "coronae"

    cool_RTV: float = 0.0
    hcond_grad_iso: float = 0.0
    hyper3_nu: float = 0.0
    hyper3_eta: float = 0.0
    hyper3_chi: float = 0.0
    hyper3_diffrho: float = 0.0
    ldensity_floor_c: bool = False
    lgranulation: bool = False          # NOT implemented (see docstring)
    Kpara: float = 0.0                  # spitzer conduction handled by the
    #                                     heatflux module in these samples
    cdts: float = 1.0
    unit_length: float = 1.0
    unit_velocity: float = 1.0
    unit_density: float = 1.0
    unit_temperature: float = 1.0

    def rhs(self, pen, df, ts):
        eos = pen.eos
        tslot = "lnTT" if "lnTT" in pen.reg.slots else (
            "ss" if "ss" in pen.reg.slots else None)
        cdtv3 = pen.cfg.time.cdtv3 if pen.cfg is not None else 0.005

        if self.cool_RTV != 0.0 and tslot is not None:
            # optically-thin losses: ln(n_e n_i) = 2(lnρ + 61.4412 +
            # ln unit_mass); Q interpolated in ln T_SI; outside the table
            # the reference leaves lnQ = −200 (no cooling)
            ul, uv, ud, ut = (self.unit_length, self.unit_velocity,
                              self.unit_density, self.unit_temperature)
            unit_mass = ud * ul ** 3
            unit_lnQ = (3.0 * jnp.log(uv) + 5.0 * jnp.log(ul)
                        + jnp.log(ud))
            lnTT_SI = pen.lnTT() + jnp.log(ut)
            lnneni = 2.0 * (pen.lnrho() + 61.4412 + jnp.log(unit_mass))
            lnQ = jnp.interp(lnTT_SI, jnp.asarray(_INTLNT),
                             jnp.asarray(_INTLNQ),
                             left=-200.0, right=-200.0)
            rtv = jnp.exp(lnQ - unit_lnQ + lnneni) * self.cool_RTV
            if tslot == "lnTT":
                # cVTrho1 = γ·cp1/(ρT)
                rate = rtv * eos.gamma / eos.cp * jnp.exp(
                    -pen.lnrho() - pen.lnTT())
                accumulate(df, "lnTT", -rate)
                ts.max_rate(rate / self.cdts)
            else:
                rate = rtv * jnp.exp(-pen.lnTT() - pen.lnrho())
                accumulate(df, "ss", -rate)
                ts.max_rate(rate * eos.gamma / eos.cp / self.cdts)

        if self.hcond_grad_iso != 0.0 and "lnTT" in pen.reg.slots:
            # L = ∇·(|∇lnT|²ρ∇T)/(ρT): rhs = ∇K·∇lnT + K(∇lnρ·∇lnT +
            # |∇lnT|² + ∇²lnT), K = h·|∇lnT|², ∇K_i = 2h·Σ_j ∂_j lnT·H_ij
            glnTT = pen.grad("lnTT")
            glnrho = pen.glnrho()
            glnTT2 = sum(g ** 2 for g in glnTT)
            K_grad = self.hcond_grad_iso * glnTT2
            gK = [2.0 * self.hcond_grad_iso
                  * sum(glnTT[j] * pen.dij("lnTT", j, i)[0]
                        for j in range(3)) for i in range(3)]
            gK_glnTT = sum(gK[i] * glnTT[i] for i in range(3))
            glnr_glnT = sum(glnrho[a] * glnTT[a] for a in range(3))
            rhs = gK_glnTT + K_grad * (glnr_glnT + glnTT2
                                       + pen.del2s("lnTT"))
            accumulate(df, "lnTT", eos.gamma / eos.cp * rhs)
            ts.diffus(K_grad * eos.gamma / eos.cp)

        if self.hyper3_nu != 0.0 and "uu" in pen.reg.slots:
            accumulate(df, "uu", self.hyper3_nu * sum(
                pen.d6_raw("uu", a) for a in range(3)))
            ts.max_rate(self.hyper3_nu / cdtv3)
        if self.hyper3_eta != 0.0 and "aa" in pen.reg.slots:
            accumulate(df, "aa", self.hyper3_eta * sum(
                pen.d6_raw("aa", a) for a in range(3)))
            ts.max_rate(self.hyper3_eta / cdtv3)
        if self.hyper3_chi != 0.0 and tslot is not None:
            accumulate(df, tslot, self.hyper3_chi * sum(
                pen.d6_raw(tslot, a)[0] for a in range(3)))
            ts.max_rate(self.hyper3_chi / cdtv3)
        if self.hyper3_diffrho != 0.0 and "lnrho" in pen.reg.slots:
            accumulate(df, "lnrho", self.hyper3_diffrho * sum(
                pen.d6_raw("lnrho", a)[0] for a in range(3)))
            ts.max_rate(self.hyper3_diffrho / cdtv3)
