"""Ideal-gas equation of state (reference ``src/eos_idealgas.f90``).

Thermodynamic closure binding (lnρ, s) → (cs², T, p):
    cs² = cs₀² · exp( γ s/cp + (γ−1)(lnρ − lnρ₀) )
    cs² = (γ−1) cp T        (ideal gas)
    p   = ρ cs²/γ
When no entropy slot exists the closure degenerates to isothermal
(cs² = cs₀², the reference ``noentropy`` route).  All pencil formulas live
in ``pencils.py``; this module just owns the constants (reference
``select_eos_variable`` src/eos_idealgas.f90:323-454).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar

from .base import ModuleBase


@dataclass(frozen=True)
class EosIdealGas(ModuleBase):
    name: ClassVar[str] = "eos"

    gamma: float = 5.0 / 3.0
    cs0: float = 1.0
    rho0: float = 1.0
    cp: float = 1.0

    @property
    def cs20(self) -> float:
        return self.cs0 * self.cs0

    @property
    def lnrho0(self) -> float:
        return math.log(self.rho0)

    @property
    def cv(self) -> float:
        return self.cp / self.gamma

    @property
    def lnTT0(self) -> float:
        # cs20 = (gamma-1)*cp*T0 ; for gamma->1 fall back to cs20/cp
        g1 = max(self.gamma - 1.0, 1e-8)
        return math.log(self.cs20 / (g1 * self.cp))

    def rhs(self, pen, df, ts):
        # Sound-speed contribution to the advective CFL (the reference
        # accumulates advec_cs2 in the eos/pressure path, equ.f90:916-931).
        # Handled in hydro (needs |u| too); nothing to do here.
        pass
