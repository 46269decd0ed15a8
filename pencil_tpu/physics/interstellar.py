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

# discrete-SN constants (:237-290)
_SOLAR_MASS_CGS = 1.989e33
_WIDTH_SN_CGS = 6.172e19
_PC_CGS = 3.0856776e18
_KYR_CGS = 3.1556952e10
_M_H_CGS = 1.6726e-24

# spherical profile-integral norms ∫profile dV (:160-184): index 2 = 3-D
_CNORM = {"gaussian": (0.8862269254527579, math.pi, 5.568327996831708),
          "gaussian2": (0.9064024770554771, 2.784163998415854,
                        3.849760110050832),
          "gaussian3": (0.9277193336300392, 2.805377873352155,
                        3.712218664554472)}
_VNORM = {"gaussian": (0.6266570686577501, 1.570796326794897,
                       1.9687012432153024),
          "gaussian2": (0.7621905937330379, 1.968701243215302,
                        2.2890810569630537),
          "gaussian3": (0.8265039651250117, 2.226629893663761,
                        2.624934990953737)}


def _ism_thermo(eos):
    """(lnTT_of(lnρ,ss), ss_of(lnρ,lnT), ee_of(lnρ,lnT),
    lnTT_from_ee(lnρ,e)) host-side numpy conversions — ideal-gas closed
    forms, or Saha-consistent bisections when the run uses
    eos_ionization (the reference routes SN thermodynamics through
    eoscalc, which dispatches per EOS — interstellar.f90 explode_SN)."""
    import numpy as np
    if hasattr(eos, "ss_from_lnTT"):
        c = eos._c
        xHe = eos.xHe

        def _yH(lnrho, lnTT):
            lnK = (c["lnrho_e"] - lnrho + 1.5 * (lnTT - c["lnTT_ion"])
                   - c["TT_ion"] * np.exp(-np.clip(lnTT, -600.0, 600.0)))
            K = np.exp(np.clip(lnK, -80.0, 80.0))
            # stable Saha root (eos_temperature_ionization.f90:565):
            # the naive 0.5(−K+√(K²+4K)) cancels catastrophically at
            # large K
            s = np.sqrt(K)
            return np.clip(2.0 * s / (s + np.sqrt(4.0 + K)),
                           0.0, 1.0 - 1e-8)

        def ss_of(lnrho, lnTT):
            return np.asarray(eos.ss_from_lnTT(
                np.asarray(lnrho, np.float64),
                np.asarray(lnTT, np.float64)), np.float64)

        def ee_of(lnrho, lnTT):
            y = _yH(lnrho, lnTT)
            return (1.5 * (1.0 + y + xHe) * c["ss_ion"] * np.exp(lnTT)
                    + y * c["ss_ion"] * c["TT_ion"])

        def _invert(g, target, lnrho):
            # both ss and ee increase monotonically with lnT
            lo = np.full(np.shape(target),
                         np.log(1e-10 * c["TT_ion"]))
            hi = np.full(np.shape(target), np.log(1e5 * c["TT_ion"]))
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                low = g(lnrho, mid) < target
                lo = np.where(low, mid, lo)
                hi = np.where(low, hi, mid)
            return 0.5 * (lo + hi)

        def lnTT_of(lnrho, ss):
            return _invert(ss_of, ss, lnrho)

        def lnTT_from_ee(lnrho, ee):
            return _invert(ee_of, ee, lnrho)

        return lnTT_of, ss_of, ee_of, lnTT_from_ee
    gam, cp = eos.gamma, eos.cp
    cv = cp / gam
    gm1 = gam - 1.0

    def lnTT_of(lnrho, ss):
        return eos.lnTT0 + gam * ss / cp + gm1 * (lnrho - eos.lnrho0)

    def ss_of(lnrho, lnTT):
        return (cp / gam) * (lnTT - eos.lnTT0
                             - gm1 * (lnrho - eos.lnrho0))

    def ee_of(lnrho, lnTT):
        import numpy as np
        return cv * np.exp(lnTT)

    def lnTT_from_ee(lnrho, ee):
        import numpy as np
        return np.log(ee / cv)

    return lnTT_of, ss_of, ee_of, lnTT_from_ee


@dataclass(frozen=True)
class Interstellar(ModuleBase):
    name: ClassVar[str] = "interstellar"

    cooling_select: str = "WSW"
    heating_select: str = "wolfire"
    heating_rate: float = 0.015           # cgs erg/g/s for 'cst'
    cdts: float = 1.0                     # cooling-time CFL (cdata cdts)
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
    # discrete SN injection at start (init_interstellar :1470-1604 +
    # explode_SN :3182-3805).  Runtime stochastic check_SN scheduling is
    # not yet wired into the step; 'multiple' seeds initial_SNI type-I
    # remnants into the initial state with the reference's seeded RNG.
    initinterstellar: str = "nothing"
    initial_SNI: int = 0
    # runtime stochastic SN scheduling (check_SN :1934-2195).  t_next_* < 0
    # disables a channel (the namelist default `impossible`); >= 0 arms it
    # and the runner fires discrete explosions host-side between device
    # steps, rescheduling each channel as a Poisson process with rate
    # 1/t_interval = SN*_factor * SN*_area_rate * Lx * Ly (:699-700).
    t_next_SNI: float = -1.0
    t_next_SNII: float = -1.0
    ampl_SN: float = 0.0          # code units; 0 → 1e51 erg/unit_energy
    mass_SN: float = 0.0          # ejecta mass; 0 → 10 M_sun (:272)
    lSN_mass: bool = False
    mass_profile: str = "gaussian"
    mass_width_ratio: float = 1.0
    rho_SN_min: float = 0.0       # site floor; 0 → 1e-28 g/cc (:203)
    rho_SN_max: float = 0.0       # site cap;   0 → 2.364e-23 g/cc
    TT_SN_min: float = -1.0       # site floor; <0 → 1 K (:207)
    TT_SN_max: float = 0.0        # remnant cap; 0 → 2.5e6 K
    SN_TT_ratio: float = 20.0     # diffuse-remnant TT headroom (:210)
    SN_rho_ratio: float = 1e4     # remnant rarification cap (:210)
    eps_mass: float = 0.05        # min ambient mass fraction (:390)
    SNI_factor: float = 1.0
    SNII_factor: float = 1.0
    SNI_area_rate: float = 0.0    # 0 → 1.330982784e-56 /s/cm² (:214)
    SNII_area_rate: float = 0.0   # 0 → 7.5× the SNI rate (:566)
    center_SN: tuple = (0.0, 0.0, 0.0)   # 'single' test position
    # runtime fixed-position firing (check_SNI ltestSN →
    # position_SN_testposition at center_SN_x/y/z)
    ltestSN: bool = False
    lSN_scale_rad: bool = False
    N_mass: float = 250.0
    rfactor_SN: float = 5.0
    lSN_eth: bool = True
    lSN_mass: bool = False
    lSN_momentum: bool = True
    lSN_autofrackin: bool = True
    kin_max: float = 0.075
    frac_ecr: float = 0.0
    frac_kin: float = 0.0
    thermal_profile: str = "gaussian"
    velocity_profile: str = "gaussian"
    energy_width_ratio: float = 1.0
    velocity_width_ratio: float = 1.0
    width_SN: float = 0.0                 # 0 → max(cgs default, rfactor·dx)
    xsi_sedov: float = 2.026
    seed0: int = 1812
    mu_ism: float = 0.62                  # mean molecular weight (getmu)
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

    def heat_cool(self, pen):
        """(heat, cool) fields in code units — the specific heating and
        ρΛ cooling the entropy equation receives (calc_heat_cool_
        interstellar; cached per pencil evaluation for diagnostics)."""
        if "ism_heat_cool" in pen._cache:
            return pen._cache["ism_heat_cool"]
        heat, cool = self._heat_cool_impl(pen)
        pen._cache["ism_heat_cool"] = (heat, cool)
        return heat, cool

    def rhs(self, pen, df, ts):
        if "ss" not in pen.reg.slots:
            return
        heat, cool = self.heat_cool(pen)
        lnTT = pen.lnTT()
        heatcool = jnp.exp(-lnTT) * (heat - cool)
        accumulate(df, "ss", heatcool)
        # heating/cooling dt constraint (entropy.f90:3444): dt1 ≥
        # |Hmax|/(ee·cdts), where Hmax accumulates interstellar heat−cool
        # (:1855) AND the viscous heating (viscosity.f90:2567) — at a
        # radiative blast shell the shock heating largely cancels the
        # cooling, so the net is the right limiter
        ent = pen.cfg.module("entropy") if pen.cfg is not None else None
        if ent is not None and getattr(ent, "lthdiff_Hmax", False):
            return   # entropy's |df(ss)| constraint replaces this one
        hm = heat - cool
        vh = pen._cache.get("visc_heat")
        if vh is not None:
            hm = hm + vh
        eos = pen.eos
        ee = pen.cs2() / (eos.gamma * (eos.gamma - 1.0)) \
            if eos.gamma != 1.0 else pen.cs2()
        ts.max_rate(jnp.abs(hm) / (ee * self.cdts))

    def _heat_cool_impl(self, pen):
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
        if isinstance(heat, float):
            heat = heat + 0.0 * lnTT
        return heat, cool

    # ---- discrete SN injection (explode_SN :3182-3805) -----------------
    def post_init(self, fields, model):
        """Seed initial_SNI type-I remnants into the assembled initial
        state (init_interstellar 'multiple' :1566-1582): position from the
        reference's seeded RNG (position_SN_gaussianz :2601-2872), radius
        bisected to enclose N_mass solar masses (:3233-3272), thermal
        energy + momentum kick injection (:3595-3675)."""
        if self.initinterstellar in ("single", "sedov", "kompaneets",
                                     "courant-friedricks"):
            # fixed-position initial remnant(s) through the runtime
            # explode path (init_interstellar :1503-1553 — explode_SN is
            # called WITHOUT ierr at init, so validation is bypassed)
            import numpy as np
            sched = SNScheduler(self, model)
            centers = {"single": [self.center_SN],
                       "sedov": [(0.0, 0.0, 0.0)],
                       "kompaneets": [(0.0, 0.0, 0.0)],
                       "courant-friedricks": [(0.0, 0.0, -0.015),
                                              (0.0, 0.0, 0.015)],
                       }[self.initinterstellar]
            out = {k: np.asarray(v) for k, v in fields.items()}
            for (cx, cy, cz) in centers:
                lc = int(np.argmin(np.abs(sched.x - cx)))
                mc = int(np.argmin(np.abs(sched.y - cy)))
                nc = int(np.argmin(np.abs(sched.z - cz)))
                rho = sched._rho_of(out)
                ss = np.array(out["ss"], np.float64)
                res = sched._explode(out, rho, ss, lc, mc, nc,
                                     check=False)
                if res is not None:
                    out.update({k: np.asarray(v) for k, v in res.items()})
            dtype = jnp.asarray(fields["ss"]).dtype
            return {k: jnp.asarray(v, dtype) if k in
                    ("ss", "uu", "rho", "lnrho") else fields[k]
                    for k, v in out.items()}
        if self.initinterstellar != "multiple" or self.initial_SNI < 1:
            return fields
        import numpy as np
        from ..compat.pencil_rng import Ran0

        eos = model.eos
        gs = model.cfg.grid
        ng = gs.nghost
        x = np.asarray(model.grid.x, np.float64)[ng:-ng]
        y = np.asarray(model.grid.y, np.float64)[ng:-ng]
        z = np.asarray(model.grid.z, np.float64)[ng:-ng]
        dVol = gs.dx * gs.dy * gs.dz
        ul, uv, ud, ut, utime, uL, uG = self._units
        uE = ud * ul ** 3 * uv ** 2         # unit energy
        ampl_SN = _AMPL_SN_CGS / uE
        solar_mass = _SOLAR_MASS_CGS / (ud * ul ** 3)
        hSN = self.h_SNII if self.h_SNII > 0 else _H_SNII_CGS / ul
        TT_SN_max = 2.5e6 / ut
        Nsig = {"gaussian3": 1.25, "gaussian2": 1.75,
                "gaussian": 2.25}.get(self.thermal_profile, 1.5)
        cnorm = _CNORM[self.thermal_profile][2]
        vnorm = _VNORM[self.velocity_profile][2]
        # Sedov / shell-formation dimensional norms (:581-597)
        sedov_norm = ud / 1e-24 * _AMPL_SN_CGS / uE
        SFt_norm = (26.5 * _KYR_CGS / utime
                    * (1.4 * _M_H_CGS / ud) ** (4.0 / 7)
                    * (uE / _AMPL_SN_CGS) ** (3.0 / 14))
        SFr_norm = (18.5 * _PC_CGS / ul * (uE / _AMPL_SN_CGS) ** (2.0 / 7)
                    * (1.4 * _M_H_CGS / ud) ** (3.0 / 7))
        kfrac_norm = (3.97e-6 * self.mu_ism / 1.4 / _M_H_CGS * ud
                      * _AMPL_SN_CGS / uE * (ul / _PC_CGS) ** 5
                      * (_KYR_CGS / utime) ** 2)

        rho = np.array(fields["rho"] if "rho" in fields
                       else np.exp(fields["lnrho"]), np.float64)
        ss = np.array(fields["ss"], np.float64)
        uu = np.array(fields["uu"], np.float64)
        gam, cp = eos.gamma, eos.cp
        cv = cp / gam
        gm1 = gam - 1.0

        lnTT_of, ss_of, ee_of, lnTT_from_ee = _ism_thermo(eos)

        rng = Ran0(self.seed0)
        nx, ny, nz = gs.nx, gs.ny, gs.nz
        nzskip = 10

        def dr2_of(lc, mc, nc):
            dx_ = x - x[lc]
            if gs.periodic[0]:
                dx_ = np.where(dx_ > gs.Lx / 2, dx_ - gs.Lx, dx_)
                dx_ = np.where(dx_ < -gs.Lx / 2, dx_ + gs.Lx, dx_)
            dy_ = y - y[mc]
            if gs.periodic[1]:
                dy_ = np.where(dy_ > gs.Ly / 2, dy_ - gs.Ly, dy_)
                dy_ = np.where(dy_ < -gs.Ly / 2, dy_ + gs.Ly, dy_)
            dz_ = z - z[nc]
            if gs.periodic[2]:
                dz_ = np.where(dz_ > gs.Lz / 2, dz_ - gs.Lz, dz_)
                dz_ = np.where(dz_ < -gs.Lz / 2, dz_ + gs.Lz, dz_)
            d2 = (dx_[:, None, None] ** 2 + dy_[None, :, None] ** 2
                  + dz_[None, None, :] ** 2)
            return d2, (dx_, dy_, dz_)

        def props(dr2, radius):
            """(rhom, ekintot) over the Nsigma·radius sphere
            (get_properties :3807-3913)."""
            radius2 = Nsig ** 2 * radius ** 2
            mask = dr2 <= radius2
            M = (rho * mask).sum() * dVol
            rhom = M * 0.75 / math.pi / radius2 ** 1.5
            ekin = 0.5 * (rho * (uu ** 2).sum(0)).sum() * dVol
            return rhom, ekin

        for _ in range(self.initial_SNI):
            fran3 = rng.draw(3)
            i = int(fran3[0] * nx) + 1
            j = int(fran3[1] * ny) + 1
            if i > nx:
                i -= nx
            if j > ny:
                j -= ny
            # z from the cumulative gaussian about zdisk=0 (:2820-2843)
            cum = np.zeros(nz)
            for k in range(1, nz + 1):
                if k < nzskip:
                    cum[k - 1] = 0.0
                elif k > nz - nzskip:
                    cum[k - 1] = cum[k - 2]
                else:
                    prev = cum[k - 2] if k > 1 else 0.0
                    cum[k - 1] = prev + math.exp(
                        -0.5 * ((k * gs.Lz / nz + gs.z0) / hSN) ** 2)
            cum = cum / max(cum[nz - nzskip - 1], 1e-37)
            cum[nz - nzskip:] = 1.0
            kz = nzskip + 1
            for k in range(nzskip + 1, nz - nzskip + 1):
                lo = cum[k - 2] if k > 1 else 0.0
                if lo <= fran3[2] < cum[k - 1]:
                    kz = k
                    break
            lc, mc, nc = i - 1, j - 1, kz - 1
            # local spacing from the ghosted coordinate vectors (:3125)
            xg_ = np.asarray(model.grid.x, np.float64)
            yg_ = np.asarray(model.grid.y, np.float64)
            zg_ = np.asarray(model.grid.z, np.float64)
            dr = max(xg_[ng + lc + 1] - xg_[ng + lc],
                     yg_[ng + mc + 1] - yg_[ng + mc],
                     zg_[ng + nc + 1] - zg_[ng + nc])
            site_rho = rho[lc, mc, nc]
            radius = self.width_SN if self.width_SN > 0 else max(
                _WIDTH_SN_CGS / ul, self.rfactor_SN * dr)
            if self.lSN_scale_rad:
                radius = (0.75 * solar_mass / site_rho / math.pi
                          * self.N_mass) ** (1.0 / 3.0)
                radius = max(radius, self.rfactor_SN * dr)
            dr2, deltas = dr2_of(lc, mc, nc)
            rhom, ekintot = props(dr2, radius)
            if self.lSN_scale_rad:
                # bisect radius to enclose N_mass solar masses (:3233-3272)
                sol_tot = solar_mass * self.N_mass
                SNvol = 4.0 / 3.0 * math.pi / sol_tot
                r_min = self.rfactor_SN * dr
                r_max = 200 * _PC_CGS / ul
                r_best = radius
                ratio = SNvol * rhom * radius ** 3
                best = abs(ratio - 1) if ratio > 0.99 else 1e6
                for _i in range(25):
                    if ratio < 1:
                        r_min = radius
                    else:
                        r_max = radius
                    radius = 0.5 * (r_min + r_max)
                    rhom, ekintot = props(dr2, radius)
                    ratio = SNvol * rhom * radius ** 3
                    if ratio >= 0.99 and abs(ratio - 1) < best:
                        best = ratio    # sic — reference stores the ratio
                        r_best = radius
                    if r_max - r_min < dr * 0.04:
                        break
                radius = r_best
                rhom, ekintot = props(dr2, radius)
            # shell-formation kinetic fraction (:3297-3330)
            t_SF = SFt_norm / rhom ** (4.0 / 7) * ampl_SN ** (3.0 / 14)
            RPDS = SFr_norm * ampl_SN ** (2.0 / 7) / rhom ** (3.0 / 7)
            etmp, ktmp = (1.0 - self.frac_ecr) * ampl_SN, \
                self.frac_kin * ampl_SN
            if RPDS < radius and self.lSN_autofrackin:
                if rhom > 0.8 * _M_H_CGS / ud and dr > _PC_CGS / ul:
                    frackin = (kfrac_norm * rhom * RPDS ** 7 / ampl_SN
                               / (t_SF * dr) ** 2)
                    if frackin < 1e-3:
                        frackin = 0.0
                else:
                    frackin = 0.0
                frackin = min(self.kin_max, frackin)
                etmp = (1.0 - frackin - self.frac_ecr) * ampl_SN
                ktmp = frackin * ampl_SN
            width_E = radius * self.energy_width_ratio
            width_v = radius * self.velocity_width_ratio
            c_SN = etmp / (cnorm * width_E ** 3)
            c_SNmax = ampl_SN / (cnorm * self.rfactor_SN * dr ** 3)
            cvel = 0.0
            if ktmp > 0:
                cvel = math.sqrt(2 * ktmp / (rhom * vnorm * width_v ** 3))

            def prof(d2, w):
                p = d2 / w ** 2
                if self.thermal_profile == "gaussian3":
                    p = p ** 3
                elif self.thermal_profile == "gaussian2":
                    p = p ** 2
                return np.exp(-p)

            dr_lin = np.sqrt(np.maximum(dr2, 1e-300))
            normal = np.stack([
                deltas[0][:, None, None] / dr_lin + 0.0 * dr2,
                deltas[1][None, :, None] / dr_lin + 0.0 * dr2,
                deltas[2][None, None, :] / dr_lin + 0.0 * dr2])
            normal = np.where(dr2[None] == 0.0, 0.0, normal)

            def deltauu_of(cv_):
                scale = (cv_ * np.sqrt(rhom / rho) if self.lSN_momentum
                         else cv_)
                return scale * prof(dr2, width_v) * normal
            # rescale kick so added kinetic energy ≈ ktmp (:3577-3593)
            if cvel > 0:
                du = deltauu_of(cvel)
                ek_new = 0.5 * (rho * ((uu + du) ** 2).sum(0)).sum() * dVol
                dek = ek_new - ekintot
                if dek < ktmp:
                    if self.lSN_eth:
                        c_SN = (min(c_SNmax, c_SN * (ktmp + ekintot - ek_new
                                                     + etmp) / (ktmp + etmp))
                                if dek > 0 else c_SNmax)
                else:
                    cvel = cvel * math.sqrt(ktmp / dek)
            # apply (:3595-3675): thermal energy, then momentum kick
            if self.lSN_eth:
                lnrho_ = np.log(rho)
                ee_old = ee_of(lnrho_, lnTT_of(lnrho_, ss))
                dEE = c_SN * prof(dr2, width_E)
                ee_new = (ee_old * rho + dEE) / rho
                ss = ss_of(lnrho_, lnTT_from_ee(lnrho_, ee_new))
            if cvel > 0:
                uu = uu + deltauu_of(cvel)

        dtype = fields["ss"].dtype
        out = dict(fields)
        out["ss"] = jnp.asarray(ss, dtype)
        out["uu"] = jnp.asarray(uu, dtype)
        return out


class SNScheduler:
    """Runtime stochastic supernova driver (reference check_SN at
    interstellar.f90:1934-1998, check_SNI :2000-2104, check_SNIIb
    :2106-2195, set_next_SNI/II :2197-2312, explode_SN :3182-3805).

    Runs HOST-SIDE between jitted device steps: discrete SN events are
    rare (t_interval ≫ dt), data-dependent, and mutate the state in one
    shot, so they live outside the traced step — the runner syncs the
    fields after each step while a channel is armed and calls this.
    Mutable: carries the Park-Miller RNG stream (`random_number_wrapper`
    with the 'min_std' default generator), the firing times, and zdisk.
    """

    def __init__(self, ism: Interstellar, model):
        import numpy as np
        self.ism = ism
        self.model = model
        from ..compat.pencil_rng import Ran0
        self.rng = Ran0(ism.seed0)
        ul, uv, ud, ut, utime, uL, uG = ism._units
        uE = ud * ul ** 3 * uv ** 2
        gs = model.cfg.grid
        self.ampl = ism.ampl_SN if ism.ampl_SN > 0 else _AMPL_SN_CGS / uE
        self.mass = (ism.mass_SN if ism.mass_SN > 0
                     else 10.0 * _SOLAR_MASS_CGS / (ud * ul ** 3))
        rate_I = (ism.SNI_area_rate if ism.SNI_area_rate > 0
                  else 1.330982784e-56 * ul ** 2 * utime)
        rate_II = (ism.SNII_area_rate if ism.SNII_area_rate > 0
                   else 7.5 * 1.330982784e-56 * ul ** 2 * utime)
        area = gs.Lx * gs.Ly
        self.t_interval_SNI = 1.0 / (ism.SNI_factor * rate_I * area)
        self.t_interval_SNII = 1.0 / (ism.SNII_factor * rate_II * area)
        # -2.0 is the loader's "namelist did not set it" sentinel: the
        # reference default is 0 (fire at once), EXCEPT that start-time
        # seeded explosions already called set_next_SNI — consuming RNG
        # draws (3 position + 1 interval per remnant) and pushing
        # t_next_SNI one Poisson interarrival into the future, a state
        # persisted into var.dat (explode_SN :3704-3710)
        import math as _math
        tI = float(ism.t_next_SNI)
        tII = float(ism.t_next_SNII)
        if tI == -2.0:
            tI = 0.0
        if tII == -2.0:
            tII = 0.0
        if ism.initinterstellar == "multiple" and ism.initial_SNI > 0:
            for _ in range(ism.initial_SNI):
                self.rng.draw(3)
                u = float(self.rng.draw(1)[0])
                if float(ism.t_next_SNI) == -2.0:
                    tI = -_math.log(u) * self.t_interval_SNI
        elif ism.initinterstellar in ("single", "sedov", "kompaneets"):
            u = float(self.rng.draw(1)[0])
            if float(ism.t_next_SNI) == -2.0:
                tI = -_math.log(u) * self.t_interval_SNI
        elif ism.initinterstellar == "courant-friedricks":
            for _ in range(2):
                u = float(self.rng.draw(1)[0])
            if float(ism.t_next_SNI) == -2.0:
                tI = -_math.log(u) * self.t_interval_SNI
        self.t_next_SNI = tI
        self.t_next_SNII = tII
        self.rho_SN_min = (ism.rho_SN_min if ism.rho_SN_min > 0
                           else 1e-28 / ud)
        self.rho_SN_max = (ism.rho_SN_max if ism.rho_SN_max > 0
                           else 2.364e-23 / ud)
        self.TT_SN_min = ism.TT_SN_min if ism.TT_SN_min >= 0 else 1.0 / ut
        self.TT_SN_max = ism.TT_SN_max if ism.TT_SN_max > 0 else 2.5e6 / ut
        self.h_SNI = ism.h_SNI if ism.h_SNI > 0 else _H_SNI_CGS / ul
        self.h_SNII = ism.h_SNII if ism.h_SNII > 0 else _H_SNII_CGS / ul
        self.solar_mass = _SOLAR_MASS_CGS / (ud * ul ** 3)
        # Sedov / shell-formation dimensional norms (:581-597)
        self.sedov_norm = ud / 1e-24 * _AMPL_SN_CGS / uE
        self.SFt_norm = (26.5 * _KYR_CGS / utime
                         * (1.4 * _M_H_CGS / ud) ** (4.0 / 7)
                         * (uE / _AMPL_SN_CGS) ** (3.0 / 14))
        # NOTE on the density normalization: the committed SN goldens
        # (sedov/snowplough ekintot@it0 = kin_max·ampl exactly) require
        # the shell-formation gate RPDS < radius to PASS at ρ = m_H,
        # radius = 5·dr = 20 pc; with the current source's 1.4·m_H
        # factor RPDS = 21.3 pc and the gate would fail — the goldens
        # were produced with the n = ρ/m_H convention (RPDS = 18.4 pc)
        self.SFr_norm = (18.5 * _PC_CGS / ul
                         * (uE / _AMPL_SN_CGS) ** (2.0 / 7)
                         * (_M_H_CGS / ud) ** (3.0 / 7))
        self.kfrac_norm = (3.97e-6 * ism.mu_ism / 1.4 / _M_H_CGS * ud
                           * _AMPL_SN_CGS / uE * (ul / _PC_CGS) ** 5
                           * (_KYR_CGS / utime) ** 2)
        self.Nsig = {"gaussian3": 1.25, "gaussian2": 1.75,
                     "gaussian": 2.25}.get(ism.thermal_profile, 1.5)
        self.cnorm = _CNORM[ism.thermal_profile][2]
        self.cnorm_mass = _CNORM.get(ism.mass_profile,
                                     _CNORM["gaussian"])[2]
        self.vnorm = _VNORM[ism.velocity_profile][2]
        ng = gs.nghost
        self.x = np.asarray(model.grid.x, np.float64)[ng:-ng]
        self.y = np.asarray(model.grid.y, np.float64)[ng:-ng]
        self.z = np.asarray(model.grid.z, np.float64)[ng:-ng]
        self.dVol = gs.dx * gs.dy * gs.dz
        self.zdisk = 0.0
        self.nfired = 0

    @property
    def active(self) -> bool:
        return ((self.ism.lSNI and self.t_next_SNI >= 0)
                or (self.ism.lSNII and self.t_next_SNII >= 0))

    # ---- geometry helpers -------------------------------------------
    def _dr2(self, lc, mc, nc):
        import numpy as np
        gs = self.model.cfg.grid
        ds = []
        for dq, L, per, q, c in ((None, gs.Lx, gs.periodic[0], self.x, lc),
                                 (None, gs.Ly, gs.periodic[1], self.y, mc),
                                 (None, gs.Lz, gs.periodic[2], self.z, nc)):
            d = q - q[c]
            if per:
                d = np.where(d > L / 2, d - L, d)
                d = np.where(d < -L / 2, d + L, d)
            ds.append(d)
        dr2 = (ds[0][:, None, None] ** 2 + ds[1][None, :, None] ** 2
               + ds[2][None, None, :] ** 2)
        return dr2, ds

    def _prof(self, dr2, w, profile):
        import numpy as np
        p = dr2 / w ** 2
        if profile == "gaussian3":
            p = p ** 3
        elif profile == "gaussian2":
            p = p ** 2
        return np.exp(-p)

    def _props(self, rho, uu, dr2, radius):
        """Mean density in the energy_Nsigma sphere + TOTAL box kinetic
        energy + remnant ρ extremes (get_properties :3807-3913)."""
        import math
        radius2 = self.Nsig ** 2 * radius ** 2
        mask = dr2 <= radius2
        M = (rho * mask).sum() * self.dVol
        rhom = M * 0.75 / math.pi / radius2 ** 1.5
        ekin = 0.5 * (rho * (uu ** 2).sum(0)).sum() * self.dVol
        if mask.any():
            rin = rho[mask]
            rmin, rmax = float(rin.min()), float(rin.max())
        else:
            rmin, rmax = 1e20, 0.0
        return rhom, ekin, rmin, rmax

    # ---- scheduling -------------------------------------------------
    def __call__(self, fields, t, it):
        """Check both channels at time t; returns updated field dict or
        None.  Mirrors check_SN ordering: SNI first, then SNIIb with the
        zdisk recomputed from the vertical mass profile (:2128-2144)."""
        import math
        upd = None
        if self.ism.lSNI and 0 <= self.t_next_SNI <= t:
            self.zdisk = 0.0              # check_SNI: zdisk=0 (:2112)
            out = self._try_fire(fields, 1, it)
            if out is not None:
                fields = upd = out
                # set_next_SNI (:2197-2231): Poisson interarrival
                self.t_next_SNI = t - math.log(
                    self.rng.draw(1)[0]) * self.t_interval_SNI
        if self.ism.lSNII and 0 <= self.t_next_SNII <= t:
            self._set_zdisk(fields, it)
            out = self._try_fire(fields, 2, it)
            if out is not None:
                fields = upd = out
                self.t_next_SNII = t - math.log(
                    self.rng.draw(1)[0]) * self.t_interval_SNII
        return upd

    def _rho_of(self, fields):
        import numpy as np
        return np.array(fields["rho"] if "rho" in fields
                        else np.exp(fields["lnrho"]), np.float64)

    def _set_zdisk(self, fields, it):
        """zdisk = z of the peak horizontally-summed density, scan
        direction alternating with it parity to avoid N-S tie bias
        (position_SN_gaussianz Get_zdisk :2655-2745)."""
        import numpy as np
        rho = self._rho_of(fields)
        rhoz = rho.sum(axis=(0, 1))
        order = range(len(rhoz)) if it % 2 == 0 else \
            range(len(rhoz) - 1, -1, -1)
        rhomax = rhoz.max()
        for n in order:
            if rhoz[n] == rhomax:
                self.zdisk = self.z[n]
        return self.zdisk

    def _try_fire(self, fields, sn_type, it):
        """Position attempts with site-property rejection (check_SNI
        :2100-2160): 10 tries, each drawing fran3 for (x, y, cum-z)."""
        import numpy as np
        ism = self.ism
        gs = self.model.cfg.grid
        eos = self.model.eos
        hSN = self.h_SNI if sn_type == 1 else self.h_SNII
        nx, ny, nz = gs.nx, gs.ny, gs.nz
        nzskip = 10
        if ism.ltestSN:
            # position_SN_testposition: nearest grid point to center_SN
            lc = int(np.argmin(np.abs(self.x - ism.center_SN[0])))
            mc = int(np.argmin(np.abs(self.y - ism.center_SN[1])))
            nc = int(np.argmin(np.abs(self.z - ism.center_SN[2])))
            rho = self._rho_of(fields)
            ss = np.array(fields["ss"], np.float64)
            out = self._explode(fields, rho, ss, lc, mc, nc, check=False)
            if out is not None:
                self.nfired += 1
            return out
        for _try in range(10):
            fran3 = self.rng.draw(3)
            i = int(fran3[0] * nx) + 1
            j = int(fran3[1] * ny) + 1
            if i > nx:
                i -= nx
            if j > ny:
                j -= ny
            # cumulative gaussian about zdisk (:2820-2843)
            cum = np.zeros(nz)
            for k in range(1, nz + 1):
                if k < nzskip:
                    cum[k - 1] = 0.0
                elif k > nz - nzskip:
                    cum[k - 1] = cum[k - 2]
                else:
                    prev = cum[k - 2] if k > 1 else 0.0
                    cum[k - 1] = prev + np.exp(
                        -0.5 * ((k * gs.Lz / nz + gs.z0 - self.zdisk)
                                / hSN) ** 2)
            cum = cum / max(cum[nz - nzskip - 1], 1e-37)
            cum[nz - nzskip:] = 1.0
            kz = nzskip + 1
            for k in range(nzskip + 1, nz - nzskip + 1):
                lo = cum[k - 2] if k > 1 else 0.0
                if lo <= fran3[2] < cum[k - 1]:
                    kz = k
                    break
            lc, mc, nc = i - 1, j - 1, kz - 1
            rho = self._rho_of(fields)
            ss = np.array(fields["ss"], np.float64)
            site_rho = rho[lc, mc, nc]
            _lnTT_of = _ism_thermo(eos)[0]
            site_TT = float(np.exp(_lnTT_of(
                np.log(site_rho), ss[lc, mc, nc])))
            if not ism.lSN_scale_rad:
                if site_rho < self.rho_SN_min or site_TT > self.TT_SN_max:
                    continue
            else:
                if site_rho > self.rho_SN_max or \
                        (sn_type == 2 and site_TT < self.TT_SN_min):
                    continue
            out = self._explode(fields, rho, ss, lc, mc, nc)
            if out is not None:
                self.nfired += 1
                return out
        return None

    def _explode(self, fields, rho, ss, lc, mc, nc, check=True):
        """Inject one remnant at (lc,mc,nc): ejecta mass, thermal energy,
        radial velocity kick with the shell-formation kinetic fraction
        (explode_SN :3182-3675).  Returns the new field dict, or None if
        the remnant fails the max-temperature validation."""
        import math
        import numpy as np
        ism = self.ism
        gs = self.model.cfg.grid
        eos = self.model.eos
        gam, cp = eos.gamma, eos.cp
        cv = cp / gam
        gm1 = gam - 1.0
        uu = np.array(fields["uu"], np.float64)
        dr = max(gs.dx, gs.dy, gs.dz)
        radius = ism.width_SN if ism.width_SN > 0 else max(
            _WIDTH_SN_CGS / ism.unit_length, ism.rfactor_SN * dr)
        dr2, deltas = self._dr2(lc, mc, nc)
        rhom, ekintot, rmin, rmax = self._props(rho, uu, dr2, radius)
        if ism.lSN_scale_rad:
            # bisect radius to enclose N_mass solar masses (:3233-3272)
            sol_tot = self.solar_mass * ism.N_mass
            SNvol = 4.0 / 3.0 * math.pi / sol_tot
            r_min, r_max = ism.rfactor_SN * dr, \
                200 * _PC_CGS / ism.unit_length
            r_best = radius
            ratio = SNvol * rhom * radius ** 3
            best = abs(ratio - 1) if ratio > 0.99 else 1e6
            for _i in range(25):
                if ratio < 1:
                    r_min = radius
                else:
                    r_max = radius
                radius = 0.5 * (r_min + r_max)
                rhom, ekintot, rmin, rmax = self._props(rho, uu, dr2,
                                                        radius)
                ratio = SNvol * rhom * radius ** 3
                if ratio >= 0.99 and abs(ratio - 1) < best:
                    best = ratio
                    r_best = radius
                if r_max - r_min < dr * 0.04:
                    break
            radius = r_best
            rhom, ekintot, rmin, rmax = self._props(rho, uu, dr2, radius)
            if check:
                # remnant-quality rejections (get_properties :3900-3906 +
                # explode_SN :3276-3286): excessive density contrast
                # inside the remnant, or too little ambient mass
                if rmax / max(rmin, 1e-30) > ism.SN_rho_ratio:
                    return None       # iEXPLOSION_TOO_UNEVEN
                if SNvol * rhom * radius ** 3 < ism.eps_mass:
                    return None       # iEXPLOSION_TOO_RARIFIED
        ampl = self.ampl
        # shell-formation kinetic fraction (:3297-3330)
        t_SF = self.SFt_norm / rhom ** (4.0 / 7) * ampl ** (3.0 / 14)
        RPDS = self.SFr_norm * ampl ** (2.0 / 7) / rhom ** (3.0 / 7)
        frac_eth = 1.0 - ism.frac_ecr - ism.frac_kin
        etmp = frac_eth * ampl
        ktmp = ism.frac_kin * ampl
        if RPDS < radius and ism.lSN_autofrackin:
            ud, ul = ism.unit_density, ism.unit_length
            if rhom > 0.8 * _M_H_CGS / ud and dr > _PC_CGS / ul:
                frackin = (self.kfrac_norm * rhom * RPDS ** 7 / ampl
                           / (t_SF * dr) ** 2)
                if frackin < 1e-3:
                    frackin = 0.0
            else:
                frackin = 0.0
            frackin = min(ism.kin_max, frackin)
            etmp = (1.0 - frackin - ism.frac_ecr) * ampl
            ktmp = frackin * ampl
        width_E = radius * ism.energy_width_ratio
        width_m = radius * ism.mass_width_ratio
        width_v = radius * ism.velocity_width_ratio
        c_SN = etmp / (self.cnorm * width_E ** 3)
        c_SNmax = ampl / (self.cnorm * ism.rfactor_SN * dr ** 3)
        cmass = (self.mass / (self.cnorm_mass * width_m ** 3)
                 if ism.lSN_mass else 0.0)
        cvel = (math.sqrt(2 * ktmp / (rhom * self.vnorm * width_v ** 3))
                if ktmp > 0 else 0.0)
        # --- validate: max post-injection TT within Nsigma (:3440-3500)
        rho_new = rho + (cmass * self._prof(dr2, width_m, ism.mass_profile)
                         if cmass > 0 else 0.0)
        lnrho_old = np.log(rho)
        lnTT_of, ss_of, ee_of, lnTT_from_ee = _ism_thermo(eos)
        lnTT_old = lnTT_of(lnrho_old, ss)
        ee_old = ee_of(lnrho_old, lnTT_old)
        dEE = c_SN * self._prof(dr2, width_E, ism.thermal_profile)
        if ism.lSN_eth and check:
            ee_new = (ee_old * rho + dEE * frac_eth) / rho_new
            TTmask = np.where(dr2 <= self.Nsig ** 2 * radius ** 2,
                              np.exp(lnTT_from_ee(np.log(rho_new),
                                                  ee_new)), 0.0)
            maxTT = TTmask.max()
            if radius <= 1.1 * ism.rfactor_SN * dr:
                if maxTT > self.TT_SN_max:
                    return None           # iEXPLOSION_TOO_HOT
            else:
                if maxTT > ism.SN_TT_ratio * self.TT_SN_max:
                    return None
        # --- velocity normalisation check (:3577-3593)
        dr_lin = np.sqrt(np.maximum(dr2, 1e-300))
        normal = np.stack([deltas[0][:, None, None] / dr_lin + 0.0 * dr2,
                           deltas[1][None, :, None] / dr_lin + 0.0 * dr2,
                           deltas[2][None, None, :] / dr_lin + 0.0 * dr2])
        normal = np.where(dr2[None] == 0.0, 0.0, normal)

        def deltauu_of(cv_):
            scale = (cv_ * np.sqrt(rhom / rho_new) if ism.lSN_momentum
                     else cv_)
            return (scale * self._prof(dr2, width_v, ism.velocity_profile)
                    * normal)

        if cvel > 0:
            du = deltauu_of(cvel)
            ek_new = 0.5 * (rho_new * ((uu + du) ** 2).sum(0)).sum() \
                * self.dVol
            dek = ek_new - ekintot
            if dek < ktmp:
                if ism.lSN_eth:
                    c_SN = (min(c_SNmax, c_SN * (ktmp + ekintot - ek_new
                                                 + etmp) / (ktmp + etmp))
                            if dek > 0 else c_SNmax)
                    dEE = c_SN * self._prof(dr2, width_E,
                                            ism.thermal_profile)
            else:
                cvel = cvel * math.sqrt(ktmp / dek)
        # --- apply (:3595-3675)
        out = dict(fields)
        dtype = np.asarray(fields["ss"]).dtype
        if cmass > 0:
            if "rho" in fields:
                out["rho"] = rho_new.astype(dtype)
            else:
                out["lnrho"] = np.log(rho_new).astype(dtype)
        if ism.lSN_eth:
            ee_new = (ee_old * rho + dEE * frac_eth) / rho_new
            lnrho_new = np.log(rho_new)
            ss = ss_of(lnrho_new, lnTT_from_ee(lnrho_new, ee_new))
            out["ss"] = ss.astype(dtype)
        if cvel > 0:
            out["uu"] = (uu + deltauu_of(cvel)).astype(dtype)
        return out
