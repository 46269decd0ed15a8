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

    # -- thermodynamic closure (overridable by EOS variants) -------------
    def cs2(self, pen):
        import jax.numpy as jnp
        if "chem" in pen.reg.slots and "lnTT" in pen.reg.slots:
            # eos_chemistry mixture: cs² = (cp/cv)·R·μ⁻¹·T
            # (chemistry.f90:1089)
            chem = pen.cfg.module("chemistry") if pen.cfg else None
            if chem is not None and getattr(chem, "mech", None) is not None:
                from .chemistry_chemkin import RGAS
                Y = pen.field("chem")
                TT = pen.TT()
                mu1, cp, cv = chem.mixture(Y, TT, pen.lnTT())
                return cp / cv * RGAS * mu1 * TT
        if "eth" in pen.reg.slots:
            # thermal energy: cs² = γ(γ−1)·eth/ρ (thermal_energy.f90)
            return (self.gamma * (self.gamma - 1.0)
                    * pen.field("eth") * pen.rho1())
        if "TT" in pen.reg.slots or "lnTT" in pen.reg.slots:
            return (self.gamma - 1.0) * self.cp * pen.TT()
        if "ss" in pen.reg.slots:
            return self.cs20 * jnp.exp(
                self.gamma / self.cp * pen.ss()
                + (self.gamma - 1.0) * (pen.lnrho() - self.lnrho0))
        if self.gamma == 1.0:
            # exactly isothermal: cs² is a constant — no exp per point
            return jnp.full_like(pen.lnrho(), self.cs20)
        return self.cs20 * jnp.exp(
            (self.gamma - 1.0) * (pen.lnrho() - self.lnrho0))

    def lnTT(self, pen):
        import jax.numpy as jnp
        if "eth" in pen.reg.slots:     # thermal_energy: T = eth/(cv·ρ)
            return jnp.log(jnp.maximum(
                pen.field("eth") * pen.rho1() / self.cv, 1e-30))
        if "TT" in pen.reg.slots:      # ltemperature_nolog
            return jnp.log(jnp.maximum(pen.field("TT"), 1e-30))
        if "lnTT" in pen.reg.slots:
            return pen.field("lnTT")
        if "ss" in pen.reg.slots:
            return (self.lnTT0 + self.gamma / self.cp * pen.ss()
                    + (self.gamma - 1.0) * (pen.lnrho() - self.lnrho0))
        return jnp.full_like(pen.lnrho(), self.lnTT0)


@dataclass(frozen=True)
class EosIonization(EosIdealGas):
    """Hydrogen partial ionization via the Saha equation (reference
    ``src/eos_ionization.f90`` / ``eos_temperature_ionization.f90``, 2086 +
    2373 LoC — Saha-equation y(ρ, T)).

    y²/(1−y) = (saha_A/ρ)·T^{3/2}·exp(−TT_ion/T), solved in closed form
    (quadratic).  The closure keeps the ideal-gas (lnρ, s)→T relation for
    the neutral backbone (dy/ds entropy terms neglected — the reference's
    fixed-ionization limit is recovered as saha_A→0/∞) and corrects the
    pressure/sound speed with the (1 + y) free-particle factor."""

    name: ClassVar[str] = "eos"
    TT_ion: float = 10.0       # ionization temperature χ/k in code units
    saha_A: float = 1.0        # Saha prefactor in code units

    def yH(self, pen):
        import jax.numpy as jnp
        TT = jnp.exp(super().lnTT(pen))
        rho = pen.rho()
        K = self.saha_A / rho * TT ** 1.5 * jnp.exp(-self.TT_ion
                                                    / jnp.maximum(TT, 1e-30))
        # y² + Ky − K = 0 → y = (−K + sqrt(K² + 4K))/2, clipped to [0, 1)
        y = 0.5 * (-K + jnp.sqrt(K * K + 4.0 * K))
        return jnp.clip(y, 0.0, 1.0 - 1e-6)

    def cs2(self, pen):
        y = pen.get_cached("yH", lambda: self.yH(pen))
        return (1.0 + y) * super().cs2(pen)


@dataclass(frozen=True)
class EosLocalIso(EosIdealGas):
    """Locally isothermal disk thermodynamics (reference ``llocal_iso``:
    cdata.f90 flag + initial_condition/centrifugal_balance.f90
    ``set_thermodynamical_quantities`` — cs² is a STATIC radial power-law
    profile stored as a global array, never evolved):

        cs²(r) = cs₀²·(r/r_ref)^(−q),   q = temperature_power_law

    and the pressure force picks up the temperature gradient
    (noentropy.f90:280: fpres = −cs²(∇lnρ + ∇lnT), ∇lnT = ∇ln cs²
    = −q·r̂/r).  Here the profile is a pure function of the grid — no
    farray global needed.  ``lcylindrical``: use the cylindrical radius
    (lcylindrical_gravity / lcylinder_in_a_box runs)."""

    name: ClassVar[str] = "eos"

    temperature_power_law: float = 1.0
    r_ref: float = 1.0
    lcylindrical: bool = True
    rsmooth: float = 0.0

    def _r(self, pen):
        import jax.numpy as jnp
        g = pen.grid
        if pen.cfg is not None and pen.cfg.grid.coords != "cartesian":
            # curvilinear: x IS the radius
            return g.xg + jnp.zeros_like(g.xg + g.yg + g.zg)
        r2 = g.xg ** 2 + g.yg ** 2
        if not self.lcylindrical:
            r2 = r2 + g.zg ** 2
        return jnp.sqrt(r2 + self.rsmooth ** 2)

    def cs2(self, pen):
        import jax.numpy as jnp
        r = self._r(pen)
        one = jnp.ones(pen.lnrho().shape, r.dtype)
        return self.cs20 * (r / self.r_ref) ** (
            -self.temperature_power_law) * one

    def glnTT_profile(self, pen):
        """∇ln cs² = −q·∇r/r (a static vector field)."""
        import jax.numpy as jnp
        g = pen.grid
        q = self.temperature_power_law
        zero = jnp.zeros(pen.lnrho().shape, g.z.dtype)
        if pen.cfg is not None and pen.cfg.grid.coords != "cartesian":
            r = g.xg + zero
            return jnp.stack([-q / r, zero, zero])
        r2 = g.xg ** 2 + g.yg ** 2
        if not self.lcylindrical:
            r2 = r2 + g.zg ** 2
        r2 = r2 + self.rsmooth ** 2
        gx = -q * g.xg / r2 + zero
        gy = -q * g.yg / r2 + zero
        gz = (-q * g.zg / r2 + zero) if not self.lcylindrical else zero
        return jnp.stack([gx, gy, gz])
