"""1-D alpha accretion-disk evolution (reference
``src/special/alphadisk.f90`` — a pure-special sample: every other module
is a no-op).  Evolves the surface density Σ(r) of a viscous disk in CGS
units,

    ∂Σ/∂t = 3·∇²(Σν) + (4.5/r)·∂_r(Σν) − S_wind,   Σν = Ṁ/(3π)

with Ṁ(Σ) given by the piecewise log-linear fit to the radiative
α-disk solution (get_coeff :375-386 — the three opacity-regime branches
with coefficients c1/c2/c3(r), cprime(α)), the photoevaporative wind
S_wind = Ṁ_wind/(2π(r_max−r_g)r) for r > r_g = 5 AU (:info get_wind),
and Ṁ kept as a communicated auxiliary refreshed from Σ after every step
(special_after_timestep :698-742).  CFL: ν·ΣΔ⁻² in the diffusive class.

Sample golden: samples/1d-tests/alphadisk."""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp
import numpy as np

from ..base import accumulate
from . import Special, register_special

MSUN = 1.98892e33
AU = 1.49e13
YR = 31556926.0
MYR = 1e6 * YR


@register_special("alphadisk")
@dataclass(frozen=True)
class AlphaDisk(Special):
    name: ClassVar[str] = "alphadisk"

    alpha: float = 0.01
    mdot_input: float = 1e-7      # Msun/yr
    mwind_input: float = 0.0      # Msun/yr
    lwind: bool = True
    temperature_model: str = "radiative"
    initsigma: str = "nothing"
    sigma0: float = 1700.0
    plaw_r0: float = 1.0
    plaw_density: float = 1.0
    r0_gaussian: float = 1.0
    width_gaussian: float = 1.0
    nut_constant: float = 0.0

    def register(self, reg):
        reg.register("sigma", 1, "pde")
        reg.register("mdot", 1, "comm_aux")

    # -- the radiative-branch piecewise fits (alphadisk.f90:375-386) ----
    def _coeff(self, r):
        la = math.log10(self.alpha)
        c1 = 10.0 ** (0.9360636 + 0.1195816 * la
                      + (0.0233002 - 0.0061733 * la) * jnp.log10(r))
        cprime = 16.0897161 + 2.0665 * la
        c2 = (1.1 * c1 + cprime) / 2.1
        c3 = 10.0 ** (0.7782080 + 0.0545617 * la
                      + (0.0366565 - 0.0019087 * la) * jnp.log10(r))
        return c1, c2, c3, cprime

    def sigma_to_mdot(self, sigma, r):
        if self.temperature_model == "Hayashi":
            return 3.0 * np.pi * self.nut_constant * sigma
        c1, c2, c3, cprime = self._coeff(r)
        lgs = jnp.log10(jnp.maximum(sigma, 1e-30))
        lgs1 = (c1 - cprime) / 2.1
        lgs2 = (c3 - c2) / 0.9
        lgmdot = jnp.where(
            lgs <= lgs1, c1 + lgs,
            jnp.where(lgs < lgs2, c2 + 2.0 * lgs, c3 + 1.1 * lgs))
        return 10.0 ** lgmdot

    def mdot_to_sigma(self, mdot, r):
        if self.temperature_model == "Hayashi":
            return mdot / (3.0 * np.pi * self.nut_constant)
        c1, c2, c3, cprime = self._coeff(r)
        lgm = jnp.log10(jnp.maximum(mdot, 1e-30))
        lgm1 = (3.1 * c1 - cprime) / 2.1
        lgm2 = (2.0 * c3 - 1.1 * c2) / 0.9
        lgsigma = jnp.where(
            lgm <= lgm1, lgm - c1,
            jnp.where(lgm < lgm2, 0.5 * (lgm - c2), (lgm - c3) / 1.1))
        return 10.0 ** lgsigma

    def _swind(self, r, spec):
        mwind = self.mwind_input * (MSUN / YR)
        rg = 5.0 * AU
        rmax = spec.x0 + spec.Lx
        den = 2.0 * np.pi * (rmax - rg) * r
        return jnp.where(r <= rg, 0.0, mwind / den)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        ones = jnp.ones(spec.shape, grid.z.dtype)
        r = grid.xg + 0.0 * ones
        if self.initsigma == "constant":
            sigma = self.sigma0 * ones
        elif self.initsigma == "power-law":
            sigma = self.sigma0 * (r / self.plaw_r0) ** (-self.plaw_density)
        elif self.initsigma == "gaussian":
            sigma = self.sigma0 * jnp.exp(
                -(r - self.r0_gaussian) ** 2
                / (2 * self.width_gaussian ** 2))
        elif self.initsigma == "mdot-constant":
            mdot = self.mdot_input * (MSUN / YR) * ones
            sigma = self.mdot_to_sigma(mdot, r)
        else:
            sigma = ones
        mdot = self.sigma_to_mdot(sigma, r)
        return {"sigma": sigma, "mdot": mdot}

    def compute_aux(self, pen, halo1):
        """Ṁ(Σ) refreshed every substep — the reference calls
        special_after_timestep from EVERY RK substep (timestep.f90 loop),
        so the flux field tracks Σ within the step; a once-per-step lag
        even-odd destabilizes the Σ∝Ṁ² middle branch."""
        sigma = pen.field("sigma")
        r = pen.grid.xg + 0.0 * sigma
        return {"mdot": self.sigma_to_mdot(sigma, r)}

    def rhs(self, pen, df, ts):
        r = pen.grid.xg
        sigma = pen.field("sigma")
        mdot = pen.field("mdot")
        one_3pi = 1.0 / (3.0 * np.pi)
        gsigmanu = pen.grad("mdot")[0] * one_3pi
        del2sigmanu = pen.del2s("mdot") * one_3pi
        out = 3.0 * del2sigmanu + 4.5 / r * gsigmanu
        if self.lwind and self.mwind_input > 0.0:
            out = out - self._swind(r + 0.0 * sigma, pen.cfg.grid)
        accumulate(df, "sigma", out)
        nu = mdot * one_3pi / jnp.maximum(sigma, 1e-30)
        ts.diffus(nu)

    def after_timestep(self, state, grid, cfg, reg, eos, dt, t, key,
                      it=None):
        # refresh Ṁ from the evolved Σ (special_after_timestep :698)
        state = dict(state)
        r = grid.xg + 0.0 * state["sigma"]
        state["mdot"] = self.sigma_to_mdot(state["sigma"], r)
        return state
