"""Momentum equation (reference ``src/hydro.f90``, ``duu_dt`` at
:3613-3922):

    Du/Dt = −∇p/ρ + g + Fvisc + (J×B)/ρ − 2Ω×u [+ forcing]

Pressure, viscous, Lorentz and gravity terms are contributed by their own
modules; hydro owns advection, Coriolis, and the advective CFL accumulation
(``advec_uu = Σ_a (|u_a| + c_eff)·dline_1_a``, src/hydro.f90:3803-3810 plus
the eos advec_cs2 term folded in with the fast-magnetosonic speed)."""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Hydro(ModuleBase):
    name: ClassVar[str] = "hydro"

    Omega: float = 0.0        # rotation rate
    theta: float = 0.0        # angle of Ω from z-axis (degrees), as reference
    lupw_uu: bool = False
    lweno_transport: bool = False  # WENO momentum transport (hydro.f90:3736)
    lpressuregradient_gas: bool = True   # reference hydro_run_pars flag
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    width: float = 0.1

    def register(self, reg):
        reg.register("uu", 3, "pde", comps=("ux", "uy", "uz"))

    def rhs(self, pen, df, ts):
        uu = pen.uu()
        if self.lweno_transport and "rho" in pen.reg.slots:
            # WENO flux-form advection (reference hydro.f90:3736-3743):
            # du_j −= (∇·(u·ρu_j) − u_j·∇·(u·ρ))·ρ⁻¹, both divergences by
            # WENO5 (transpurho with iq1=irho multiplies the ghosted fields)
            from .thermal_energy import weno_div_flux_3d
            rho1 = pen.rho1()
            drho = weno_div_flux_3d(pen, "rho")          # = −∇·(uρ)
            out = jnp.stack([
                (weno_div_flux_3d(pen, ("uu", j, "rho"))
                 - uu[j] * drho) * rho1
                for j in range(3)
            ])
        else:
            out = -pen.ugu()
        if self.lpressuregradient_gas:
            out = out + pen.fpres()
        if self.lupw_uu:
            # upwind dissipation per component: +|u_a|·δ⁶u/(60Δ)
            upw = sum(
                jnp.abs(uu[a])[None] * pen.d6_raw("uu", a) * pen._inv(a) / 60.0
                for a in range(3)
            )
            out = out + upw
        if self.Omega != 0.0:
            th = math.radians(self.theta)
            om = (self.Omega * math.sin(th), 0.0, self.Omega * math.cos(th))
            # −2Ω×u  (coriolis_cartesian, src/hydro.f90)
            out = out + (-2.0) * jnp.stack([
                om[1] * uu[2] - om[2] * uu[1],
                om[2] * uu[0] - om[0] * uu[2],
                om[0] * uu[1] - om[1] * uu[0],
            ])
        accumulate(df, "uu", out)

        # advective CFL (reference split: advec_uu linear, advec_cs2/va2
        # squared — maxadvec = advec_uu + sqrt(advec_cs2), equ.f90:1100;
        # the Alfvén contribution is accumulated by Magnetic, anisotropic)
        d1 = pen.dline_1()
        ts.advec(sum(jnp.abs(uu[a]) * d1[a] for a in range(3)))
        if pen.eos is not None and ("lnrho" in pen.reg.slots
                                    or "rho" in pen.reg.slots):
            # gated on ldensity like the reference (energy module
            # denergy_dt: `if (... ldensity.and.lhydro) advec_cs2=...`) —
            # incompressible/Boussinesq runs carry no sound-speed CFL
            ts.advec2(pen.cs2() * (d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_vector
        return {"uu": init_vector(self.init, grid, spec, eos, key,
                                  ampl=self.ampl, kx=self.kx, ky=self.ky,
                                  kz=self.kz, width=self.width)}
