"""Newtonian radiative cooling for global disks (reference
``src/special/newton_cooling.f90``, Lyra+): each step computes

  * κ(T, ρ) from the Bell & Lin (1994) piecewise opacity law in cgs
    (calc_opacity, :214-257),
  * dτ = κ·ρ·r/ (1/dθ) along the meridional (θ) direction; the optical
    depth τ is min(column above, column below) through the disk
    (integrate_optical_depth, :83-130 — the MPI y-column sweep becomes a
    pair of jnp.cumsum along axis 1),
  * a cooling time t_c = R_d/Ω_K with R_d = cp^1.5 γ⁻¹√(γ−1)/(3σ_SB)·
    ρT^{−2.5}·τ_eff, τ_eff = 0.375τ + √3/4 + 0.25/τ
    (calc_cooling_time, :174-190),

and relaxes the entropy toward the power-law initial profile
T_init = cs₀²/(cp(γ−1))·(r_ref/r_cyl):  dss/dt −= (1/T)·cv(T−T_init)/t_c
(special_calc_energy, :318-330)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special

# Bell & Lin (1994) opacity regimes: (T_upper, k, a, b) with
# κ = k·ρ^a·T^b in cgs (newton_cooling.f90:214-257)
_REGIMES = (
    (132.0, 2e-4, 0.0, 2.1),
    (170.0, 3.0, 0.0, -0.01),
    (375.0, 0.01, 0.0, 1.1),
    (390.0, 5e4, 0.0, -1.5),
    (580.0, 0.1, 0.0, 0.7),
    (680.0, 2e15, 0.0, -5.2),
    (960.0, 0.02, 0.0, 0.8),
    (1570.0, 10.0 ** 81.3010, 1.0, -24.0),
    (3730.0, 1e-8, 2.0 / 3.0, 3.0),
    (1e4, 1e-36, 1.0 / 3.0, 10.0),
    (1e5, 1.5e20, 1.0, -2.5),
    (jnp.inf, 0.348, 0.0, 0.0),
)


def bell_lin_opacity(TT, rho):
    """κ(T,ρ) in cgs from the Bell & Lin piecewise power laws."""
    kk = jnp.zeros_like(TT)
    lower = 0.0
    for Tup, k, a, b in _REGIMES:
        val = k * rho ** a * TT ** b if a != 0.0 else k * TT ** b
        kk = jnp.where((TT > lower) & (TT <= Tup), val, kk)
        lower = Tup
    return kk


@register_special("newton_cooling")
@dataclass(frozen=True)
class NewtonCooling(Special):
    name: ClassVar[str] = "newton_cooling"

    taucool_floor: float = 0.0
    laddheatingrate: bool = True
    r_ref: float = 1.0
    sigmaSB: float = 5.670374e-5   # cgs; rescaled via the unit_* factors
    unit_temperature: float = 1.0
    unit_density: float = 1.0
    unit_length: float = 1.0
    unit_velocity: float = 1.0

    def register(self, reg):
        # comm_aux so the generic compute_aux writeback (model.apply_aux,
        # which indexes the ghosted ncom-slot stack) covers them; the
        # reference keeps them as plain auxiliaries (lwrite_aux output)
        reg.register("kappar", 1, "comm_aux")
        reg.register("tau", 1, "comm_aux")

    def _tau(self, pen):
        """Optical depth per point: min of the θ-columns above/below."""
        eos = pen.eos
        rho = pen.rho()
        TT = jnp.exp(pen.lnTT())
        kappa_cgs = bell_lin_opacity(TT * self.unit_temperature,
                                     rho * self.unit_density)
        kappa = kappa_cgs * (self.unit_density * self.unit_length)
        g = pen.grid
        # dτ = κρ · r·dθ (arc length along the meridional column)
        dtau = kappa * rho * g.xg / g.dy1
        above = jnp.cumsum(dtau, axis=1)
        below = jnp.cumsum(dtau[:, ::-1, :], axis=1)[:, ::-1, :]
        return kappa, jnp.minimum(above, below)

    def compute_aux(self, pen, halo1):
        kappa, tau = self._tau(pen)
        return {"kappar": kappa, "tau": tau}

    def rhs(self, pen, df, ts):
        if not self.laddheatingrate or "ss" not in pen.reg.slots:
            return
        eos = pen.eos
        kappa, tau = self._tau(pen)
        gamma, cp = eos.gamma, eos.cp
        cv = cp / gamma
        rho = pen.rho()
        TT = jnp.exp(pen.lnTT())
        # σ_SB in code units
        sigSB = self.sigmaSB * self.unit_temperature ** 4 / (
            self.unit_density * self.unit_velocity ** 3)
        tmp = (cp ** 1.5 / gamma * jnp.sqrt(gamma - 1.0)
               / (3.0 * sigSB) * rho * TT ** (-2.5))
        tau_eff = 0.375 * tau + 0.25 * jnp.sqrt(3.0) + 0.25 / tau
        g = pen.grid
        rr_cyl = g.xg * jnp.sin(g.yg)
        OOK1 = rr_cyl ** 1.5
        taucool = tmp * tau_eff * OOK1
        if self.taucool_floor > 0.0:
            taucool = jnp.maximum(taucool, self.taucool_floor)
        TT_init = eos.cs20 / (cp * (gamma - 1.0)) * self.r_ref / rr_cyl
        heating = cv * (TT - TT_init) / taucool
        accumulate(df, "ss", -heating / TT)
