"""Fluid dust (reference ``src/dustvelocity.f90`` + ``src/dustdensity.f90``:
per-bin dust velocity uud and number density nd as a pressureless second
fluid with Epstein drag, optionally back-reacting on the gas):

    ∂uud/∂t = −(uud·∇)uud − (uud − u)/τ_s + g + ν_d ∇²uud
    ∂lnnd/∂t = −uud·∇lnnd − ∇·uud + D_d(∇²lnnd + |∇lnnd|²)

One bin in this version (ndustspec=1); the reference's multi-bin
coagulation network (Smoluchowski) is planned."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class DustFluid(ModuleBase):
    name: ClassVar[str] = "dust"

    tausd: float = 1.0         # stopping time
    nud: float = 0.0           # dust viscosity (numerical)
    diffnd: float = 0.0        # number-density diffusion
    eps_dtog: float = 0.0      # mean dust-to-gas ratio (back-reaction)
    lgravz: bool = False
    gravz: float = 0.0
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0

    def register(self, reg):
        reg.register("uud", 3, "pde", comps=("udx", "udy", "udz"))
        reg.register("lnnd", 1, "pde")

    def rhs(self, pen, df, ts):
        uud = pen.field("uud")
        # dust advection (pressureless)
        uijd = jnp.stack([pen.d("uud", j) for j in range(3)], axis=1)
        ugud = jnp.stack([
            sum(uud[j] * uijd[a, j] for j in range(3)) for a in range(3)
        ])
        out_u = -ugud
        tausd1 = 1.0 / self.tausd
        if "uu" in pen.reg.slots:
            uu = pen.uu()
            out_u = out_u - (uud - uu) * tausd1
            if self.eps_dtog > 0.0:
                # momentum-conserving back-reaction on the gas:
                # ρ_d = ε·ρ̄·exp(lnnd); force/mass on gas = ε_local·(ud−u)/τ
                epsl = self.eps_dtog * jnp.exp(pen.field("lnnd")) \
                    * pen.rho1() * jnp.exp(pen.eos.lnrho0 if pen.eos else 0.0)
                accumulate(df, "uu", epsl * (uud - uu) * tausd1)
        if self.lgravz and self.gravz != 0.0:
            zero = jnp.zeros_like(uud[0])
            out_u = out_u + jnp.stack([zero, zero, self.gravz + zero])
        if self.nud > 0.0:
            out_u = out_u + self.nud * pen.del2v("uud")
            ts.diffus(self.nud)
        accumulate(df, "uud", out_u)

        divud = uijd[0, 0] + uijd[1, 1] + uijd[2, 2]
        glnnd = pen.grad("lnnd")
        out_n = -sum(uud[a] * glnnd[a] for a in range(3)) - divud
        if self.diffnd > 0.0:
            g2 = sum(glnnd[a] ** 2 for a in range(3))
            out_n = out_n + self.diffnd * (pen.del2s("lnnd") + g2)
            ts.diffus(self.diffnd)
        accumulate(df, "lnnd", out_n)

        d1 = pen.dline_1()
        ts.advec(sum(jnp.abs(uud[a]) * d1[a] for a in range(3)))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar, init_vector
        return {
            "uud": init_vector(self.init if self.init != "zero" else "zero",
                               grid, spec, eos, key, ampl=self.ampl,
                               kx=self.kx),
            "lnnd": init_scalar("zero", grid, spec, eos, key),
        }
