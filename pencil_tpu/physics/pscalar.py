"""Passive scalar advection-diffusion (reference ``src/pscalar_nolog.f90``):
Dcc/Dt = D∇²cc + D₆ del6(cc)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class PassiveScalar(ModuleBase):
    name: ClassVar[str] = "pscalar"

    diffcc: float = 0.0
    diffcc_hyper3: float = 0.0
    lupw_cc: bool = False
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    width: float = 0.1

    def register(self, reg):
        reg.register("cc", 1, "pde")

    def rhs(self, pen, df, ts):
        out = -pen.ugrad("cc", upwind=self.lupw_cc)
        if self.diffcc > 0.0:
            out = out + self.diffcc * pen.del2s("cc")
            ts.diffus(self.diffcc)
        if self.diffcc_hyper3 > 0.0:
            out = out + self.diffcc_hyper3 * pen.del6s_scaled("cc")
            ts.diffus3(self.diffcc_hyper3)
        accumulate(df, "cc", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar
        return {"cc": init_scalar(self.init, grid, spec, eos, key,
                                  ampl=self.ampl, kx=self.kx, ky=self.ky,
                                  kz=self.kz, width=self.width, field="cc")}
