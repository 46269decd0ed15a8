"""Cosmic-ray energy density (reference ``src/cosmicray.f90``):
advection-diffusion of the CR energy density ecr with the CR pressure
force on the gas:

    ∂ecr/∂t = −u·∇ecr − γ_cr ecr ∇·u + ∇·(K_∥ b̂b̂·∇ecr + K_⊥ ∇ecr)
    du/dt  += −(γ_cr−1)/ρ · ∇ecr       (CR pressure gradient)

(the reference's non-Fickian telegraph variant evolves fcr separately —
``src/cosmicrayflux.f90`` — planned)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class CosmicRay(ModuleBase):
    name: ClassVar[str] = "cosmicray"

    gammacr: float = 4.0 / 3.0
    Kperp: float = 0.0
    Kpara: float = 0.0
    lpress_force: bool = True
    init: str = "const"
    ampl: float = 1e-3
    kx: float = 1.0

    def register(self, reg):
        reg.register("ecr", 1, "pde")

    def rhs(self, pen, df, ts):
        ecr = pen.field("ecr")
        out = -pen.ugrad("ecr") - self.gammacr * ecr * pen.divu()
        if self.Kperp > 0.0:
            out = out + self.Kperp * pen.del2s("ecr")
            ts.diffus(self.Kperp)
        if self.Kpara > 0.0 and "aa" in pen.reg.slots:
            # field-aligned diffusion ∇·(K b̂ b̂·∇ecr), expanded with
            # b̂ frozen per evaluation: K (b̂·∇)² ecr + K (∇·b̂)(b̂·∇)ecr;
            # keep the dominant (b̂·∇)² term (reference tensor_diffusion)
            bb = pen.bb()
            b2 = jnp.maximum(pen.b2(), 1e-30)
            # K_∥ (b̂·∇)² ecr = K_∥ Σ_ab b̂_a b̂_b ∂_a∂_b ecr
            hess = sum(
                bb[a] * bb[b] * pen.dij("ecr", a, b)[0]
                for a in range(3) for b in range(3)
            ) / b2
            out = out + self.Kpara * hess
            ts.diffus(self.Kpara)
        accumulate(df, "ecr", out)
        if self.lpress_force and "uu" in pen.reg.slots:
            gecr = pen.grad("ecr")
            accumulate(df, "uu",
                       -(self.gammacr - 1.0) * pen.rho1() * gecr)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar
        return {"ecr": init_scalar(self.init, grid, spec, eos, key,
                                   ampl=self.ampl, kx=self.kx, field="ecr")}
