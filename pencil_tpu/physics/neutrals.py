"""Two-fluid partially ionized plasma (reference ``src/neutralvelocity.f90``
+ ``src/neutraldensity.f90``): a neutral fluid (uun, lnrhon) coupled to the
ion/plasma fluid by ion-neutral friction and ionization/recombination:

    ∂uun/∂t = −(uun·∇)uun − cs_n²∇lnρ_n − ν_ni(uun − u) + ν_n∇²uun
    ∂lnρ_n/∂t = −uun·∇lnρ_n − ∇·uun
    du/dt   += −ν_in(u − uun)        ν_in = ν_ni·ρ_n/ρ  (momentum conserving)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Neutrals(ModuleBase):
    name: ClassVar[str] = "neutrals"

    csn0: float = 1.0          # isothermal neutral sound speed
    nu_ni: float = 1.0         # neutral-ion collision rate
    nun: float = 0.0           # neutral viscosity
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0

    def register(self, reg):
        reg.register("uun", 3, "pde", comps=("unx", "uny", "unz"))
        reg.register("lnrhon", 1, "pde")

    def rhs(self, pen, df, ts):
        uun = pen.field("uun")
        uijn = jnp.stack([pen.d("uun", j) for j in range(3)], axis=1)
        ugun = jnp.stack([
            sum(uun[j] * uijn[a, j] for j in range(3)) for a in range(3)
        ])
        glnrhon = pen.grad("lnrhon")
        out_u = -ugun - self.csn0 ** 2 * glnrhon
        if "uu" in pen.reg.slots:
            uu = pen.uu()
            out_u = out_u - self.nu_ni * (uun - uu)
            # back-reaction with momentum conservation
            rhon_over_rho = jnp.exp(pen.field("lnrhon")) * pen.rho1()
            accumulate(df, "uu",
                       -self.nu_ni * rhon_over_rho * (uu - uun))
        if self.nun > 0.0:
            out_u = out_u + self.nun * pen.del2v("uun")
            ts.diffus(self.nun)
        accumulate(df, "uun", out_u)

        divun = uijn[0, 0] + uijn[1, 1] + uijn[2, 2]
        out_n = -sum(uun[a] * glnrhon[a] for a in range(3)) - divun
        accumulate(df, "lnrhon", out_n)

        d1 = pen.dline_1()
        ts.advec(sum(jnp.abs(uun[a]) * d1[a] for a in range(3)))
        ts.advec2(self.csn0 ** 2 * (d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar, init_vector
        return {
            "uun": init_vector(self.init, grid, spec, eos, key,
                               ampl=self.ampl, kx=self.kx),
            "lnrhon": init_scalar("zero", grid, spec, eos, key),
        }
