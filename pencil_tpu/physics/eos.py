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
        # y² + Ky − K = 0 → y = 2√K/(√K+√(4+K)) — the stable root form
        # (eos_temperature_ionization.f90:565); the naive
        # (−K+√(K²+4K))/2 cancels catastrophically for large K
        s = jnp.sqrt(K)
        y = 2.0 * s / (s + jnp.sqrt(4.0 + K))
        return jnp.clip(y, 0.0, 1.0 - 1e-6)

    def cs2(self, pen):
        y = pen.get_cached("yH", lambda: self.yH(pen))
        return (1.0 + y) * super().cs2(pen)


def fixed_ionization_pars(yH0, xHe, unit_length, unit_velocity,
                          unit_density, unit_temperature, xH2=0.0):
    """(cp, cs0) reproducing eos_fixed_ionization.f90:140-196: the fixed-
    fraction plasma is an ideal gas with cp = 2.5(1+yH0+xHe−xH2)·s_ion
    and the Sackur-Tetrode zero point lnTT0; cs0 is chosen so the
    EosIdealGas lnTT0 property lands exactly there."""
    import math
    ul, uv, ud, ut = unit_length, unit_velocity, unit_density, \
        unit_temperature
    umass = ud * ul ** 3
    uenergy = umass * uv ** 2
    utime = ul / uv
    k_B = 1.3806505e-16 / (uenergy / ut)
    m_e = 9.10938188e-28 / umass
    m_p = 1.67262158e-24 / umass
    m_H = m_e + m_p
    hbar = 1.054571596e-27 / (uenergy * utime)
    chiH = 13.6 * 1.602176462e-12 / uenergy
    mu1yHxHe = 1.0 + 3.97153 * xHe
    TT_ion = chiH / k_B

    def lnrho_x(m):
        return (1.5 * math.log((m / hbar) * (chiH / hbar) / 2.0 / math.pi)
                + math.log(m_H) + math.log(mu1yHxHe))
    lnrho_e = lnrho_x(m_e)
    lnrho_H = lnrho_x(m_H)
    lnrho_p = lnrho_x(m_p)
    lnrho_He = lnrho_x(3.97153 * m_H)
    ss_ion = k_B / m_H / mu1yHxHe
    yH_term = (yH0 * (2 * math.log(yH0) - lnrho_e - lnrho_p)
               if yH0 > 0 else 0.0)
    one_yH_term = ((1.0 - yH0) * (math.log(1.0 - yH0) - lnrho_H)
                   if yH0 < 1 else 0.0)
    xHe_term = xHe * (math.log(xHe) - lnrho_He) if xHe > 0 else 0.0
    f = 1.0 + yH0 + xHe - xH2
    lnTT0 = (math.log(TT_ion)
             + (2.0 / 3.0) * ((yH_term + one_yH_term + xHe_term) / f
                              - 2.5))
    cp = 2.5 * f * ss_ion
    cs0 = math.sqrt(cp * (2.0 / 3.0) * math.exp(lnTT0))
    return cp, cs0


@dataclass(frozen=True)
class EosIonizationFull(EosIdealGas):
    """Exact hydrogen-ionization EOS (reference ``src/eos_ionization.f90``):
    the evolved pair is (lnρ, s); the ionization fraction y_H follows from
    the Saha equation coupled to the Sackur-Tetrode entropy,

      R(y) = lnρ_e − lnρ + 1.5(lnT − lnT_ion) − T_ion/T
             + ln(1−y) − 2 ln y = 0                       (:670)
      lnT  = (2/3)[(s/s_ion + (1−y)(ln(1−y)−lnρ_H)
             + y(2 ln y − lnρ_e − lnρ_H) + x_He-term)/(1+y+x_He)
             + lnρ − 2.5] + lnT_ion                        (:569-571)

    solved per point by bisection (the reference uses rtsafe Newton,
    :640+); sound speed and the pressure-gradient factor cp1tilde from
    pressure_gradient_farray (:652-680), so
    −∇p/ρ = −cs²(∇lnρ + cp1tilde·∇s).  All constants derive from cgs
    physical constants in the run's unit system (initialize_eos
    :120-160)."""

    name: ClassVar[str] = "eos"
    xHe: float = 0.1
    unit_length: float = 1.0
    unit_velocity: float = 1.0
    unit_density: float = 1.0
    unit_temperature: float = 1.0

    @property
    def _c(self):
        import math
        ul, uv, ud, ut = (self.unit_length, self.unit_velocity,
                          self.unit_density, self.unit_temperature)
        umass = ud * ul ** 3
        uenergy = umass * uv ** 2
        utime = ul / uv
        k_B = 1.3806505e-16 / (uenergy / ut)
        m_e = 9.10938188e-28 / umass
        m_p = 1.67262158e-24 / umass
        m_H = m_e + m_p
        hbar = 1.054571596e-27 / (uenergy * utime)
        chiH = 13.6 * 1.602176462e-12 / uenergy
        mu1yHxHe = 1.0 + 3.97153 * self.xHe
        TT_ion = chiH / k_B
        lnrho_e = (1.5 * math.log((m_e / hbar) * (chiH / hbar)
                                  / 2.0 / math.pi)
                   + math.log(m_H) + math.log(mu1yHxHe))
        lnrho_H = (1.5 * math.log((m_H / hbar) * (chiH / hbar)
                                  / 2.0 / math.pi)
                   + math.log(m_H) + math.log(mu1yHxHe))
        m_He = 3.97153 * m_H
        lnrho_He = (1.5 * math.log((m_He / hbar) * (chiH / hbar)
                                   / 2.0 / math.pi)
                    + math.log(m_H) + math.log(mu1yHxHe))
        ss_ion = k_B / m_H / mu1yHxHe
        xHe_term = (self.xHe * (math.log(self.xHe) - lnrho_He)
                    if self.xHe > 0 else 0.0)
        return dict(TT_ion=TT_ion, lnTT_ion=math.log(TT_ion),
                    lnrho_e=lnrho_e, lnrho_H=lnrho_H, ss_ion=ss_ion,
                    xHe_term=xHe_term)

    def _lnTT_of(self, yH, lnrho, ss, c):
        import jax.numpy as jnp
        epsi = 1e-10
        lnTT = ((ss / c["ss_ion"]
                 + (1.0 - yH) * (jnp.log(jnp.maximum(1.0 - yH, epsi)) - c["lnrho_H"])
                 + yH * (2.0 * jnp.log(yH + epsi) - c["lnrho_e"]
                         - c["lnrho_H"])
                 + c["xHe_term"]) / (1.0 + yH + self.xHe))
        return (2.0 / 3.0) * (lnTT + lnrho - 2.5) + c["lnTT_ion"]

    def _solve(self, pen):
        return self.solve_arrays(pen.lnrho(), pen.ss())

    def solve_arrays(self, lnrho, ss):
        """(yH, lnTT) by 48-step bisection on the Saha residual, on raw
        arrays (also used by radiation_ray on ghosted slabs).  The
        residual spans e^±T_ion/T — run the solve in float64 (cold layers
        overflow float32) and cast back to the field dtype."""
        import jax.numpy as jnp
        c = self._c
        dtype = lnrho.dtype
        lnrho = lnrho.astype(jnp.float64) \
            if jnp.float64 != dtype else lnrho
        ss = ss.astype(lnrho.dtype)
        epsi = 1e-10

        def R(yH):
            lnTT = self._lnTT_of(yH, lnrho, ss, c)
            return (c["lnrho_e"] - lnrho
                    + 1.5 * (lnTT - c["lnTT_ion"])
                    - c["TT_ion"] * jnp.exp(-jnp.clip(lnTT, -600.0, 600.0))
                    + jnp.log(jnp.maximum(1.0 - yH, epsi)) - 2.0 * jnp.log(yH + epsi))

        lo = jnp.full_like(lnrho, 1e-8)
        hi = jnp.full_like(lnrho, 1.0 - 1e-8)
        # R is decreasing in y (more ionization needs higher T); keep the
        # bracket where R changes sign
        for _ in range(48):
            mid = 0.5 * (lo + hi)
            pos = R(mid) > 0.0
            lo = jnp.where(pos, mid, lo)
            hi = jnp.where(pos, hi, mid)
        yH = 0.5 * (lo + hi)
        lnTT = self._lnTT_of(yH, lnrho, ss, c)
        return yH.astype(dtype), lnTT.astype(dtype)

    def _ion(self, pen):
        return pen.get_cached("eos_ion", lambda: self._solve(pen))

    def yH(self, pen):
        return self._ion(pen)[0]

    def lnTT(self, pen):
        return self._ion(pen)[1]

    def _derivs(self, pen):
        """(cs2, cp1tilde) from pressure_gradient_farray (:652-680).
        Evaluated in float64 like the Saha solve — the residual is a
        difference of O(50) logs whose f32 rounding XLA may reassociate
        into NaN on near-fully-ionized points — then cast back."""
        import jax.numpy as jnp
        c = self._c
        epsi = 1e-10
        dtype0 = pen.lnrho().dtype
        yH, lnTT = self._ion(pen)
        lnrho = pen.lnrho()
        if dtype0 != jnp.float64:
            yH = yH.astype(jnp.float64)
            lnTT = lnTT.astype(jnp.float64)
            lnrho = lnrho.astype(jnp.float64)
        TT1 = jnp.exp(-lnTT)
        fractions = 1.0 + yH + self.xHe
        fractions1 = 1.0 / fractions
        Rv = (c["lnrho_e"] - lnrho + 1.5 * (lnTT - c["lnTT_ion"])
              - c["TT_ion"] * TT1 + jnp.log(jnp.maximum(1.0 - yH, epsi))
              - 2.0 * jnp.log(yH + epsi))
        dlnTTdy = (2.0 * (-Rv - c["TT_ion"] * TT1) - 3.0) / 3.0 * fractions1
        dRdy = (dlnTTdy * (1.5 + c["TT_ion"] * TT1)
                - 1.0 / jnp.maximum(1.0 - yH, epsi) - 2.0 / (yH + epsi))
        temp = (dlnTTdy + fractions1) / dRdy
        dlnPPdlnrho = (5.0 - 2.0 * c["TT_ion"] * TT1 * temp) / 3.0
        dlnPPdss = (1.0 / c["ss_ion"]) * fractions1 * (dlnPPdlnrho
                                                       - temp - 1.0)
        cs2 = fractions * c["ss_ion"] * dlnPPdlnrho / TT1
        cp1tilde = dlnPPdss / dlnPPdlnrho
        return cs2.astype(dtype0), cp1tilde.astype(dtype0)

    def cs2(self, pen):
        return pen.get_cached("eos_ion_cs2",
                              lambda: self._derivs(pen))[0]

    def cp1tilde(self, pen):
        return pen.get_cached("eos_ion_cs2",
                              lambda: self._derivs(pen))[1]

    def ss_from_lnTT(self, lnrho, lnTT):
        """Invert (lnρ, lnT) → s: explicit Saha for y, then the
        Sackur-Tetrode relation (eoscalc ilnrho_lnTT; used by
        'stratification' inits with strati_type='lnrho_lnTT')."""
        import jax.numpy as jnp
        c = self._c
        epsi = 1e-10
        lnK = (c["lnrho_e"] - lnrho + 1.5 * (lnTT - c["lnTT_ion"])
               - c["TT_ion"] * jnp.exp(-jnp.clip(lnTT, -600.0, 600.0)))
        K = jnp.exp(jnp.clip(lnK, -80.0, 80.0))
        _s = jnp.sqrt(K)
        y = jnp.clip(2.0 * _s / (_s + jnp.sqrt(4.0 + K)),
                     0.0, 1.0 - 1e-8)
        X = 1.5 * (lnTT - c["lnTT_ion"]) - lnrho + 2.5
        A = X * (1.0 + y + self.xHe)
        return c["ss_ion"] * (
            A - (1.0 - y) * (jnp.log(jnp.maximum(1.0 - y, epsi)) - c["lnrho_H"])
            - y * (2.0 * jnp.log(y + epsi) - c["lnrho_e"] - c["lnrho_H"])
            - c["xHe_term"])

    def yH_arrays(self, lnrho, lnTT):
        """Explicit Saha ionization fraction from (lnρ, lnT) (the y of
        ss_from_lnTT; used by radiation's H⁻ opacity on ghosted slabs)."""
        import jax.numpy as jnp
        c = self._c
        lnK = (c["lnrho_e"] - lnrho + 1.5 * (lnTT - c["lnTT_ion"])
               - c["TT_ion"] * jnp.exp(-jnp.clip(lnTT, -600.0, 600.0)))
        K = jnp.exp(jnp.clip(lnK, -80.0, 80.0))
        _s = jnp.sqrt(K)
        return jnp.clip(2.0 * _s / (_s + jnp.sqrt(4.0 + K)),
                        0.0, 1.0 - 1e-8)

    def hminus_consts(self):
        """Constants for the H⁻ opacity (eos_ionization.f90:870-880):
        kapparho = (1−y)·kappa0·e^{2lnρ − lnρ_e + 1.5(lnT_ion−lnT)
        + T_ion/T}·(y+yMetals), kappa0 = σ_H/(4·m_H·(1+3.97153x_He))
        (initialize_eos :155)."""
        import math
        ul, uv, ud = (self.unit_length, self.unit_velocity,
                      self.unit_density)
        umass = ud * ul ** 3
        sigmaH = 4.0e-17 / ul ** 2
        m_H = (9.10938188e-28 + 1.67262158e-24) / umass
        mu1yHxHe = 1.0 + 3.97153 * self.xHe
        c = self._c
        return dict(kappa0=sigmaH / m_H / mu1yHxHe / 4.0,
                    lnrho_e=c["lnrho_e"], lnTT_ion=c["lnTT_ion"],
                    TT_ion=c["TT_ion"])


@dataclass(frozen=True)
class EosTemperatureIonization(EosIonizationFull):
    """(lnρ, lnT)-basis hydrogen-ionization EOS (reference
    ``src/eos_temperature_ionization.f90``): the ionization fraction is
    EXPLICIT at the evolved temperature (ioncalc :540-566,
    y = 2√r/(√r+√(4+r)) with r = (ρ_e/ρ)(T/T_ion)^{3/2}e^{−T_ion/T});
    thermodynamics from the pencil block :396-465:

        μ⁻¹ = μ₀⁻¹(1+y+x_He),  μ₀⁻¹ = 1/(1+4x_He),  p = Rμ⁻¹ρT
        cv = Rμ⁻¹(1.5 + y_cv·T_cv²)   y_cv = y(1−y)/((2−y)(1+y+x_He))
        cp = Rμ⁻¹(2.5 + y_cp·T_cp²)   y_cp = y(1−y)/(2+x_He(2−y))
        T_cv = 1.5+T_ion/T, T_cp = 2.5+T_ion/T, δ = 1+y_cp·T_cp
        cs² = γ·(p/ρ)·α₁,  α₁ = (2+x_He(2−y))/((2−y)(1+y+x_He))
        −∇p/ρ = −γ⁻¹cs²(∇lnρ + δ∇lnT)                        (:459)
    """

    name: ClassVar[str] = "eos"

    @property
    def _cti(self):
        import math
        ul, uv, ud, ut = (self.unit_length, self.unit_velocity,
                          self.unit_density, self.unit_temperature)
        umass = ud * ul ** 3
        uenergy = umass * uv ** 2
        utime = ul / uv
        k_B = 1.3806505e-16 / (uenergy / ut)
        m_e = 9.10938188e-28 / umass
        m_u = 1.66053886e-24 / umass
        hbar = 1.054571596e-27 / (uenergy * utime)
        chiH = 13.6 * 1.602176462e-12 / uenergy
        mu1_0 = 1.0 / (1.0 + 4.0 * self.xHe)
        Rgas = k_B / m_u
        TT_ion = chiH / k_B
        rho_e = (1.0 / mu1_0) * m_u * ((m_e / hbar) * (chiH / hbar)
                                       / (2.0 * math.pi)) ** 1.5
        return dict(Rgas=Rgas, mu1_0=mu1_0, TT_ion=TT_ion, rho_e=rho_e)

    def ion_pencils(self, pen):
        return pen.get_cached("eos_ti", lambda: self._ti(pen))

    def _ti(self, pen):
        import jax.numpy as jnp
        c = self._cti
        rho1 = pen.rho1()
        TT = jnp.exp(pen.field("lnTT"))
        TT1 = 1.0 / TT
        rhs = (c["rho_e"] * rho1 * (TT / c["TT_ion"]) ** 1.5
               * jnp.exp(-jnp.clip(c["TT_ion"] * TT1, 0.0, 600.0)))
        s = jnp.sqrt(rhs)
        yH = 2.0 * s / (s + jnp.sqrt(4.0 + rhs))
        mu1 = c["mu1_0"] * (1.0 + yH + self.xHe)
        pp = c["Rgas"] * mu1 * pen.rho() * TT
        ycv = yH * (1.0 - yH) / ((2.0 - yH) * (1.0 + yH + self.xHe))
        ycp = yH * (1.0 - yH) / (2.0 + self.xHe * (2.0 - yH))
        tcv = 1.5 + TT1 * c["TT_ion"]
        tcp = 2.5 + TT1 * c["TT_ion"]
        cv = c["Rgas"] * mu1 * (1.5 + ycv * tcv ** 2)
        cp = c["Rgas"] * mu1 * (2.5 + ycp * tcp ** 2)
        gamma = cp / cv
        delta = 1.0 + ycp * tcp
        alpha1 = ((2.0 + self.xHe * (2.0 - yH))
                  / ((2.0 - yH) * (1.0 + yH + self.xHe)))
        cs2 = gamma * rho1 * pp * alpha1
        # e = 1.5·Rμ⁻¹T + y·Rμ₀⁻¹T_ion (:465)
        ee = (1.5 * c["Rgas"] * mu1 * TT
              + yH * c["Rgas"] * c["mu1_0"] * c["TT_ion"])
        return dict(yH=yH, mu1=mu1, pp=pp, cv=cv, cp=cp, gamma=gamma,
                    delta=delta, cs2=cs2, ee=ee)

    def yH(self, pen):
        return self.ion_pencils(pen)["yH"]

    def lnTT(self, pen):
        return pen.field("lnTT")

    def cs2(self, pen):
        return self.ion_pencils(pen)["cs2"]

    def fpres(self, pen):
        """−∇p/ρ = −γ⁻¹cs²(∇lnρ + δ∇lnT) (:459 rho1gpp)."""
        p = self.ion_pencils(pen)
        return -(p["cs2"] / p["gamma"])[None] * (
            pen.glnrho() + p["delta"][None] * pen.grad("lnTT"))

    def ss(self, pen):
        """Sackur-Tetrode entropy from (lnρ, lnT) — reuses the
        eos_ionization inversion (eoscalc ilnrho_lnTT)."""
        return self.ss_from_lnTT(pen.lnrho(), pen.field("lnTT"))

    def yH_arrays(self, lnrho, lnTT):
        """Explicit Saha at the evolved T (ioncalc :540-566) on raw
        arrays — radiation's H⁻ opacity on ghosted slabs."""
        import jax.numpy as jnp
        c = self._cti
        lnr = (jnp.log(c["rho_e"]) - lnrho
               + 1.5 * (lnTT - jnp.log(c["TT_ion"]))
               - c["TT_ion"] * jnp.exp(-jnp.clip(lnTT, -600.0, 600.0)))
        rhs = jnp.exp(jnp.clip(lnr, -80.0, 80.0))
        s = jnp.sqrt(rhs)
        return 2.0 * s / (s + jnp.sqrt(4.0 + rhs))

    def hminus_consts(self):
        """H⁻ opacity constants (eos_temperature_ionization.f90:165
        kappa0 = σ_H·μ₀⁻¹/(4 m_u), :850-866 exponent uses this EOS's
        ρ_e)."""
        import math
        ul, uv, ud = (self.unit_length, self.unit_velocity,
                      self.unit_density)
        umass = ud * ul ** 3
        sigmaH = 4.0e-17 / ul ** 2
        m_u = 1.66053886e-24 / umass
        c = self._cti
        return dict(kappa0=sigmaH * c["mu1_0"] / (4.0 * m_u),
                    lnrho_e=math.log(c["rho_e"]),
                    lnTT_ion=math.log(c["TT_ion"]),
                    TT_ion=c["TT_ion"])


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
