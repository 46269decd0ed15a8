"""ISM radiative heating/cooling (reference ``src/interstellar.f90``):
optically-thin piecewise power-law cooling ρΛ(T) with UV (Wolfire)
heating and the smoothed average supernova heating layers,

    T·Ds/Dt += Γ(T,z) − ρΛ(T),   Λ = H_i·T^{B_i} on T_i ≤ T < T_{i+1}

(calc_heat_cool_interstellar :1719-1866, calc_cool_func :1868-1898,
calc_heat :1900-1934).  The cgs cooling tables (select_cooling :822) are
converted to code units here from the run's unit system
(lncoolH = ln coolH_cgs − ln unit_Λ + B ln unit_T, :1134).  Supernova
*injection* (check_SN) is a stochastic subsystem; the smooth
``laverage_SN*_heating`` vertical layers it maintains are implemented
(:1771-1789) — used by the supernova-driven-turbulence 1D/ISM
equilibrium samples which run with lSNI=lSNII=F."""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate

# cgs physical constants (interstellar.f90:234-236, cdata)
_M_P = 1.67262158e-24
_KPC = 3.086e21
_YR = 3.155692e7

# cooling_select tables: (name → (coolT_cgs, coolH_cgs, coolB))
# coolH for the first three sets is divided by m_p² (number-density form)
_TABLES = {
    # cooling_select='off': no radiative cooling (interstellar.f90 'off');
    # the equal band edges terminate the band loop immediately
    "off": ((1.0, 1.0), (0.0,), (0.0,)),
    "WSW": (    # Wolfire + Sarazin & White fit (:1045-1080)
        (90.0, 141.0, 313.0, 6102.0, 1e5, 2.88e5, 4.73e5, 2.11e6,
         3.98e6, 2.0e7, 1e17),
        (3.703109927416290e16, 9.455658188464892e18, 1.185035244783337e20,
         1.102120336e10, 1.236602671e27, 2.390722374e42, 4.003272698e26,
         1.527286104e44, 1.608087849e22, 9.228575532e20),
        (2.12, 1.0, 0.56, 3.21, -0.20, -3.0, -0.22, -3.00, 0.33, 0.50),
    ),
    "RBN": (    # Rosen & Bregman 1993 (:846-881); H scaled by 1/m_p²
        (100.0, 2000.0, 8000.0, 1e5, 4.0e7, 1e9),
        tuple(h / _M_P ** 2 for h in
              (2.238751968e-32, 1.0012e-30, 4.6240e-36, 1.7800e-18,
               3.2217e-27)),
        (2.0, 1.5, 2.867, -0.65, 0.5),
    ),
    "RBNr": (   # revised RBN (:890-925)
        (10.0, 2000.0, 8000.0, 1e5, 1e6, 1e17),
        tuple(h / _M_P ** 2 for h in
              (2.2380e-32, 1.0012e-30, 4.6240e-36, 1.7783524e-18,
               2.238814e-25)),
        (2.0, 1.5, 2.867, -0.65, 0.5),
    ),
    "SS": (     # Sanchez-Salcedo et al. 2002 (:927-960)
        (10.0, 141.0, 313.0, 6102.0, 1e5, 1e17),
        (3.42e16, 9.10e18, 1.11e20, 2.00e8, 7.962e29),
        (2.12, 1.0, 0.56, 3.67, -0.65),
    ),
    "SSr": (    # revised SS (:962-995)
        (10.0, 141.0, 313.0, 6102.0, 1e5, 1e9, 1e17),
        (3.70e16, 9.46e18, 1.185e20, 2.00e8, 7.96e29, 0.0),
        (2.12, 1.0, 0.56, 3.67, -0.65, 0.0),
    ),
}

# Wolfire UV heating constants (:331-332)
_GAMMA_UV_CGS = 0.0147
_T0UV_CGS = 20000.0
_CUV_CGS = 5.0e-4

# average-SN-heating constants (:214-299)
_R_SNI_YRKPC2 = 4.0e-6
_R_SNII_YRKPC2 = 3.0e-5
_AMPL_SN_CGS = 1e51
_SN_INTERVAL_RHOM_CGS = 2.8e-25
_H_SNI_CGS = 1.00295e21
_H_SNII_CGS = 2.7774e20


@dataclass(frozen=True)
class Interstellar(ModuleBase):
    name: ClassVar[str] = "interstellar"

    cooling_select: str = "WSW"
    heating_select: str = "wolfire"
    heating_rate: float = 0.015           # cgs erg/g/s for 'cst'
    GammaUV: float = 0.0                  # code units; 0 → cgs default
    coolingfunction_scalefactor: float = 1.0
    heatingfunction_scalefactor: float = 1.0
    heatingfunction_fadefactor: float = 0.0
    laverage_SNI_heating: bool = False
    laverage_SNII_heating: bool = False
    lSNI: bool = True
    lSNII: bool = True
    h_SNI: float = 0.0                    # code units; 0 → cgs default
    h_SNII: float = 0.0
    # unit system (cgs base units of the run)
    unit_length: float = 1.0
    unit_velocity: float = 1.0
    unit_density: float = 1.0
    unit_temperature: float = 1.0

    @property
    def _units(self):
        ul, uv, ud, ut = (self.unit_length, self.unit_velocity,
                          self.unit_density, self.unit_temperature)
        utime = ul / uv
        unit_Lambda = uv ** 2 / ud / utime
        unit_Gamma = uv ** 3 / ul
        return ul, uv, ud, ut, utime, unit_Lambda, unit_Gamma

    def _cool_table(self):
        """(lncoolT, lncoolH, coolB) in code units."""
        ul, uv, ud, ut, utime, uL, uG = self._units
        Tt, Ht, Bt = _TABLES[self.cooling_select]
        ncool = len(Ht)
        lncoolT = [math.log(T / ut) for T in Tt]
        lncoolH = [math.log(max(H, 1e-300)) - math.log(uL)
                   + B * math.log(ut)
                   + math.log(self.coolingfunction_scalefactor)
                   for H, B in zip(Ht, Bt)]
        return lncoolT, lncoolH, list(Bt), ncool

    def rhs(self, pen, df, ts):
        if "ss" not in pen.reg.slots:
            return
        ul, uv, ud, ut, utime, uL, uG = self._units
        lnTT = pen.lnTT()
        lnrho = pen.lnrho()
        # cooling: ρΛ(T), bandwise in log space (calc_cool_func)
        lncoolT, lncoolH, coolB, ncool = self._cool_table()
        cool = jnp.zeros_like(lnTT)
        for i in range(ncool):
            if lncoolT[i] >= lncoolT[i + 1]:
                break
            band = (lncoolT[i] <= lnTT) & (lnTT < lncoolT[i + 1])
            cool = cool + jnp.where(
                band, jnp.exp(lncoolH[i] + lnrho + lnTT * coolB[i]), 0.0)
        # heating (calc_heat)
        gamma_uv = self.GammaUV if self.GammaUV > 0 else _GAMMA_UV_CGS / uG
        T0UV = _T0UV_CGS / ut
        cUV = _CUV_CGS * ut
        if self.heating_select == "cst":
            heat = self.heating_rate * (ul / uv ** 3) + 0.0 * lnTT
        elif self.heating_select in ("wolfire", "wolfire_min"):
            heat = gamma_uv * 0.5 * (1.0 + jnp.tanh(
                cUV * (T0UV - jnp.exp(lnTT))))
            if self.heating_select == "wolfire_min":
                heat = jnp.maximum(heat, self.heating_rate * (ul / uv ** 3))
        else:
            heat = 0.0 * lnTT
        # smooth average-SN heating layers (:1771-1789); lSNI/lSNII off →
        # no fade factor
        z = pen.grid.zg
        if self.laverage_SNI_heating or self.laverage_SNII_heating:
            r_SNI = _R_SNI_YRKPC2 * (utime / _YR) * (ul / _KPC) ** 2
            r_SNII = _R_SNII_YRKPC2 * (utime / _YR) * (ul / _KPC) ** 2
            ampl_SN = _AMPL_SN_CGS / (ud * ul ** 3 * uv ** 2)
            rhom = _SN_INTERVAL_RHOM_CGS / ud
            hI = self.h_SNI if self.h_SNI > 0 else _H_SNI_CGS / ul
            hII = self.h_SNII if self.h_SNII > 0 else _H_SNII_CGS / ul
            s2pi = math.sqrt(2.0 * math.pi)
            if self.laverage_SNI_heating:
                avg = r_SNI * ampl_SN / (s2pi * hI * rhom)
                heat = heat + (avg * jnp.exp(-(2.0 * z / hI) ** 2)
                               * self.heatingfunction_scalefactor)
            if self.laverage_SNII_heating:
                avg = r_SNII * ampl_SN / (s2pi * hII * rhom)
                heat = heat + (avg * jnp.exp(-(2.0 * z / hII) ** 2)
                               * self.heatingfunction_scalefactor)
        heatcool = jnp.exp(-lnTT) * (heat - cool)
        accumulate(df, "ss", heatcool)
