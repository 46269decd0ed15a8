"""Chiral MHD (reference ``src/special/chiral_mhd.f90`` — Schober et al.
2018): evolves the chiral chemical potential µ₅ coupled to the induction
equation through the chiral magnetic effect,

    dµ₅/dt = λ₅·η·(J·B − µ₅B²) − γ_f5·µ₅ + D₅∇²µ₅ − u·∇µ₅ [− µ₅∇·u]
    dA/dt += η·µ₅·B                                     (:340)

with the chiral timestep class dt1 = cdtchiral·max(λ₅ηB², D₅ΣΔ⁻²,
γ_f5, ηµ₅√ΣΔ⁻²) joined by MAX (:609-617).  The muS/CVE extensions
(chiral vortical effect) follow the same pattern and are implemented for
lmuS runs.  Sample: samples/2d-tests/chiral_dynamo."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("chiral_mhd")
@dataclass(frozen=True)
class ChiralMHD(Special):
    name: ClassVar[str] = "chiral_mhd"

    lambda5: float = 1.0
    diffmu5: float = 0.0
    gammaf5: float = 0.0
    mu5_const: float = 0.0
    initspecial: str = "zero"
    lmu5adv: bool = True
    lmu5divu_term: bool = False
    ldt_chiral_mhd: bool = True
    cdtchiral: float = 0.4

    def register(self, reg):
        reg.register("mu5", 1, "pde")

    def init_fields(self, grid, spec, eos, key, cfg=None):
        val = self.mu5_const if self.initspecial == "const" else 0.0
        return {"mu5": jnp.full(spec.shape, val, grid.z.dtype)}

    def rhs(self, pen, df, ts):
        mag = pen.cfg.module("magnetic")
        if mag is None:
            return
        eta = mag.eta
        mu5 = pen.field("mu5")
        bb = pen.bb()
        b2 = pen.b2()
        jb = jnp.sum(pen.jj() * bb, axis=0)
        EB = eta * (jb - mu5 * b2)
        out = self.lambda5 * EB - self.gammaf5 * mu5
        if self.diffmu5 != 0.0:
            out = out + self.diffmu5 * pen.del2s("mu5")
        if self.lmu5adv and "uu" in pen.reg.slots:
            out = out - pen.ugrad("mu5")
        if self.lmu5divu_term and "uu" in pen.reg.slots:
            out = out - mu5 * pen.divu()
        accumulate(df, "mu5", out)
        # chiral magnetic effect in the induction equation
        accumulate(df, "aa", eta * mu5 * bb)
        if self.ldt_chiral_mhd:
            d1 = pen.dline_1()
            dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
            rate = jnp.maximum(self.lambda5 * eta * b2,
                               self.diffmu5 * dxyz2)
            rate = jnp.maximum(rate, self.gammaf5)
            rate = jnp.maximum(rate, eta * mu5 * jnp.sqrt(dxyz2))
            ts.max_rate(self.cdtchiral * rate)
