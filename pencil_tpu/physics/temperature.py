"""Temperature-based energy equation (reference
``src/temperature_idealgas.f90``, 3223 LoC — the ENERGY slot variant that
evolves lnTT instead of entropy):

    DlnT/Dt = −(γ−1)∇·u + (1/cv T)[∇·(K∇T) + 2νρS² + ...]  /ρ

The EOS closure switches automatically: with an 'lnTT' slot present,
cs² = (γ−1)·cp·T directly (see Pencils.cs2/lnTT overrides below)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class TemperatureIdealGas(ModuleBase):
    name: ClassVar[str] = "temperature"

    chi: float = 0.0            # χ = K/(ρcp) constant heat diffusivity
    chi_hyper3: float = 0.0
    lupw_lnTT: bool = False
    heat_const: float = 0.0     # uniform volumetric heating per unit mass
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    width: float = 0.05

    def register(self, reg):
        reg.register("lnTT", 1, "pde")

    def rhs(self, pen, df, ts):
        eos = pen.eos
        out = -pen.ugrad("lnTT", upwind=self.lupw_lnTT)
        out = out - (eos.gamma - 1.0) * pen.divu()
        if self.chi > 0.0:
            glnTT = pen.grad("lnTT")
            glnrho = pen.glnrho()
            gdot = sum(glnTT[a] * (glnTT[a] + glnrho[a]) for a in range(3))
            out = out + eos.gamma * self.chi * (pen.del2s("lnTT") + gdot)
            ts.diffus(self.chi * eos.gamma)
        if self.chi_hyper3 > 0.0:
            out = out + self.chi_hyper3 * pen.del6s_scaled("lnTT")
            ts.diffus3(self.chi_hyper3)
        heat = pen._cache.get("visc_heat")
        if heat is not None:
            out = out + heat / eos.cv * pen.TT1()
        ohm = pen._cache.get("ohmic_heat")
        if ohm is not None:
            out = out + ohm / eos.cv * pen.rho1() * pen.TT1()
        if self.heat_const != 0.0:
            out = out + self.heat_const / eos.cv * pen.TT1()
        accumulate(df, "lnTT", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar
        base = init_scalar(self.init, grid, spec, eos, key, ampl=self.ampl,
                           kx=self.kx, ky=self.ky, kz=self.kz,
                           width=self.width, field="lnTT")
        return {"lnTT": base + eos.lnTT0}
