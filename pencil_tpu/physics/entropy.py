"""Entropy equation (reference ``src/entropy.f90``, ``denergy_dt`` at
:3242-3452):

    ρT Ds/Dt = ∇·(K∇T) + 2νρS² + ημ₀J² + Γ_heat − Λ_cool

evolved in specific-entropy form:

    Ds/Dt = −u·∇s + conduction + 2νS²/T + ημ₀J²/(ρT) + (Γ−Λ)/(ρT)

Heat-conduction flavors (iheatcond):
  'K-const'    (K/ρ)(∇²lnT + |∇lnT|²)/cp·cp   — constant conductivity
  'chi-const'  cp·χ(∇²lnT + ∇lnT·(∇lnT + ∇lnρ)) — constant χ=K/(ρcp)
Cooling: Newtonian layer near the top boundary relaxing cs² → cs2cool over
width wcool (reference calc_heat_cool 'cooling profile')."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Entropy(ModuleBase):
    name: ClassVar[str] = "entropy"

    iheatcond: Tuple[str, ...] = ("K-const",)
    hcond0: float = 0.0        # K for 'K-const'
    chi: float = 0.0           # χ for 'chi-const'
    chi_shock: float = 0.0     # iheatcond 'shock' (entropy.f90:4675)
    chi_hyper3: float = 0.0
    chi_hyper3_mesh: float = 0.0
    chi_hyper3_aniso: tuple = (0.0, 0.0, 0.0)  # per-axis (iheatcond
    #                                           'hyper3-aniso')
    # Newtonian relaxation toward TTref_cool on timescale tau_cool
    # (entropy.f90:5938-5949: heat −= ρ·cp·(T−TTref)/(γ·τ))
    tau_cool: float = 0.0
    TTref_cool: float = 0.0
    lupw_ss: bool = False
    # dt limited by the total entropy tendency |dss/dt|·cv1/cdts
    # (entropy.f90:3440, needed by strong-heating ISM runs)
    lthdiff_Hmax: bool = False  # dt1 ≥ |df(ss)|·cv1/cdts on the TOTAL
    #                             entropy RHS (entropy.f90:3440-3443)

    def adjust_df(self, pen, df, ts):
        if self.lthdiff_Hmax and "ss" in df:
            import jax.numpy as jnp
            e = pen.eos
            cv1 = e.gamma / e.cp
            cdts = pen.cfg.time.cdts if pen.cfg is not None else 1.0
            dss = df["ss"]
            if getattr(dss, "ndim", 3) == 4:
                dss = dss[0]
            ts.max_rate(jnp.abs(dss) * cv1 / cdts)
    lweno_transport: bool = False  # WENO flux advection (entropy.f90:3342)
    # heating/cooling layers (conv-slab style)
    luminosity: float = 0.0
    wheat: float = 0.1
    cool: float = 0.0
    wcool: float = 0.2
    cs2cool: float = 0.0
    zcool: float = 0.0          # cooling layer center (default: top boundary)
    # z-cooling profile shape (get_heat_cool_gravz, entropy.f90:6243-6268):
    # 'gaussian' (at ztop), 'step'/'cubic_step' (at z2), 'step2' (at
    # zcool), 'lin-z'
    cooling_profile: str = "gaussian"
    # star-in-a-box radial cooling shell (get_heat_cool_gravr:
    # rcool default r_ext)
    rcool: float = 0.0
    r_ext: float = 1.0
    # spherical-shell boundary cooling (cooltype='shell',
    # entropy.f90:6348-6372 get_heat_cool_gravr): heat/cool layers at
    # r_int/r_ext relaxing cs² → cs2_int/cs2_ext; cs2_int/ext are derived
    # by the loader from the polytropic shell profile (entropy.f90:830-868)
    cooltype: str = ""
    cool_ext: float = 0.0
    cool_int: float = 0.0
    cs2_int: float = 0.0
    cs2_ext: float = 0.0
    rshell_int: float = 0.0
    rshell_ext: float = 1.0
    # piecewise-polytrope stratification parameters (conv-slab style)
    mpoly0: float = 1.0
    mpoly1: float = 3.0
    mpoly2: float = 0.0
    z1: float = 0.0
    z2: float = 1.0
    isothtop: int = 1
    init: str = "zero"
    ampl: float = 0.0
    width: float = 0.05
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    ss_left: float = 0.0       # for init='xjump'
    ss_right: float = 0.0
    radius: float = 1.0        # init='blob'/'blob_hs' (radius_ss)
    center1: tuple = (0.0, 0.0, 0.0)
    init_list_pars: tuple = () # per-entry overrides for list inits
    T0: float = 1.0            # 'geo-kws' exterior temperature
    # 'Fgs'/'Fct' boundary-flux parameters (run_pars sigmaSBt + entropy
    # chi_t/chit_prof1/chit_prof2/Fbot/Ftop, hcond at the boundaries;
    # kramers conductivity pars — eos_idealgas.f90 bc_ss_flux_turb*)
    sigmaSBt: float = 0.0
    chi_t: float = 0.0
    chit_prof1: float = 1.0
    chit_prof2: float = 1.0
    hcondbot: float = 0.0
    hcondtop: float = 0.0
    Fbot: float = 0.0
    Ftop: float = 0.0
    hcond0_kramers: float = 0.0
    nkramers: float = 1.0
    chimax_kramers: float = 0.0
    chimin_kramers: float = 0.0
    chi_t1: float = 0.0        # iheatcond 'chit' fluctuation diffusion
    chi_cspeed: float = 0.5    # 'chi-cspeed' exponent (χ ∝ T^c)
    # spatially uniform volumetric heating/cooling (entropy.f90:5913-5926:
    # heat += heat_uniform; heat −= cool_uniform·ρ·cp·T; ds/dt += heat/ρT)
    heat_uniform: float = 0.0
    cool_uniform: float = 0.0
    # radial K(x), dK/dx table (lread_hcond + hcond_glhc.dat)
    hcond_table: tuple = ()

    def register(self, reg):
        reg.register("ss", 1, "pde")

    def rhs(self, pen, df, ts):
        eos = pen.eos
        if self.lweno_transport and "rho" in pen.reg.slots:
            # dss −= (∇·(uρs) − s∇·(uρ))·ρ⁻¹ (reference entropy.f90:3342-3344;
            # weno_transp iq=iss, iq1=irho)
            from .thermal_energy import weno_div_flux_3d
            rho1 = pen.rho1()
            out = (weno_div_flux_3d(pen, ("ss", 0, "rho"))
                   - pen.ss() * weno_div_flux_3d(pen, "rho")) * rho1
        else:
            out = -pen.ugrad("ss", upwind=self.lupw_ss)

        if self.heat_uniform != 0.0 or self.cool_uniform != 0.0:
            heat_u = (self.heat_uniform
                      - self.cool_uniform * pen.rho() * eos.cp * pen.TT())
            out = out + heat_u * pen.rho1() * pen.TT1()

        glnTT = pen.glnTT()
        glnTT2 = glnTT[0] ** 2 + glnTT[1] ** 2 + glnTT[2] ** 2
        if "K-const" in self.iheatcond and self.hcond0 > 0.0:
            # (1/ρT)∇·(K∇T) = (K/ρ)(∇²lnT + |∇lnT|²)
            out = out + self.hcond0 * pen.rho1() * (pen.del2lnTT() + glnTT2)
            # χ = K/(ρ cp) for the CFL; use max over the box via pencil value
            ts.diffus(self.hcond0 * pen.rho1() / eos.cp * eos.gamma)
        if "K-profile" in self.iheatcond and self.hcond_table:
            # radial conductivity profile READ FROM FILE (lread_hcond,
            # entropy.f90:1172-1177 read_hcond of hcond_glhc.dat:
            # per-x-point K and dK/dx, spherical/gravx runs)
            tab = jnp.asarray(self.hcond_table)       # (nx, 2)
            K = tab[:, 0][:, None, None]
            dKdx = tab[:, 1][:, None, None]
            # (1/ρT)∇·(K∇T) = (K/ρ)(∇²lnT+|∇lnT|²) + (K'/ρ)∂_x lnT
            out = out + pen.rho1() * (
                K * (pen.del2lnTT() + glnTT2) + dKdx * glnTT[0])
            ts.diffus(K * pen.rho1() / eos.cp * eos.gamma)
        elif "K-profile" in self.iheatcond and self.hcond0 > 0.0:
            # z-dependent conductivity, K ∝ (mpoly+1) per polytrope layer
            # (reference entropy.f90 iheatcond='K-profile')
            from .stratification import hcond_profile
            g = pen.grid
            K = hcond_profile(g.zg, self.z1, self.z2, self.mpoly0,
                              self.mpoly1, self.mpoly2, self.hcond0,
                              self.width)
            dz = 1e-3 * (1.0 / jnp.max(g.dz_1))
            dKdz = (hcond_profile(g.zg + dz, self.z1, self.z2, self.mpoly0,
                                  self.mpoly1, self.mpoly2, self.hcond0,
                                  self.width) - K) / dz
            out = out + pen.rho1() * (
                K * (pen.del2lnTT() + glnTT2) + dKdz * glnTT[2])
            ts.diffus(K * pen.rho1() / eos.cp * eos.gamma)
        if "kramers" in self.iheatcond and self.hcond0_kramers > 0.0:
            # Kramers-opacity conduction K = K0·(T^6.5/ρ²)^n
            # (entropy.f90:5099-5133 calc_heatcond_kramers):
            # K/ρ = K0·ρ^(−2n−1)·T^(6.5n), optionally clipped to
            # [chimin, chimax]·cp
            n_ = self.nkramers
            Krho1 = self.hcond0_kramers * jnp.exp(
                -(2.0 * n_ + 1.0) * pen.lnrho()
                + (6.5 * n_) * pen.lnTT())
            if self.chimax_kramers > 0.0:
                Krho1 = jnp.clip(Krho1,
                                 self.chimin_kramers * eos.cp,
                                 self.chimax_kramers * eos.cp)
            glnrho = pen.glnrho()
            g2 = sum((-2.0 * n_ * glnrho[a]
                      + (6.5 * n_ + 1.0) * glnTT[a]) * glnTT[a]
                     for a in range(3))
            out = out + Krho1 * (pen.del2lnTT() + g2)
            ts.diffus(Krho1 / eos.cp * eos.gamma)
        if "chit" in self.iheatcond and self.chi_t1 != 0.0:
            # turbulent diffusion of ENTROPY FLUCTUATIONS around the
            # yz-mean (entropy.f90:5735-5768 lchit_fluct +
            # lcalc_ssmeanxy; chit_fluct_prof1/2 default 1 → constant
            # χ_t1 profile): χ_t1·(∇²s′ + (∇lnρ+∇lnT)·∇s′)
            gss = pen.gss()
            d2ss = pen.del2s("ss")
            gss1 = [gss[a] - jnp.mean(gss[a], axis=(1, 2), keepdims=True)
                    for a in range(3)]
            d2ss1 = d2ss - jnp.mean(d2ss, axis=(1, 2), keepdims=True)
            glnrho = pen.glnrho()
            g2 = sum((glnrho[a] + glnTT[a]) * gss1[a] for a in range(3))
            out = out + self.chi_t1 * (d2ss1 + g2)
            ts.diffus(self.chi_t1)
        if ({"chi-cspeed", "chi-therm"} & set(self.iheatcond)) \
                and self.chi > 0.0:
            # temperature-sensitive conduction χ_eff = χ·T^chi_cspeed
            # (entropy.f90:4351-4441 calc_heatcond_cspeed_chi — caps SN
            # remnant core temperatures): ds/dt += cp·χ_eff·(∇²lnT +
            # (∇lnρ + (1+c)∇lnT)·∇lnT), CFL γ·χ_eff
            thchi = self.chi * jnp.exp(self.chi_cspeed * pen.lnTT())
            glnrho = pen.glnrho()
            g2 = sum((glnrho[a] + (1.0 + self.chi_cspeed) * glnTT[a])
                     * glnTT[a] for a in range(3))
            out = out + thchi * (pen.del2lnTT() + g2) * eos.cp
            ts.diffus(eos.gamma * thchi)
        if "chi-const" in self.iheatcond and self.chi > 0.0:
            glnrho = pen.glnrho()
            gdot = sum(glnTT[a] * (glnTT[a] + glnrho[a]) for a in range(3))
            out = out + eos.cp * self.chi * (pen.del2lnTT() + gdot)
            ts.diffus(self.chi * eos.gamma)
        if "shock" in self.iheatcond and self.chi_shock > 0.0 \
                and "shock" in pen.reg.slots:
            # χ_sh·[shock·(∇²lnT + (∇lnρ+∇lnT)·∇lnT) + ∇shock·∇lnT]
            # (entropy.f90:4675 calc_heatcond_shock, non-density-dep form)
            shock = pen.field("shock")
            gshock = pen.grad("shock")
            glnrho = pen.glnrho()
            g2 = sum((glnrho[a] + glnTT[a]) * glnTT[a] for a in range(3))
            gsglnTT = sum(gshock[a] * glnTT[a] for a in range(3))
            out = out + self.chi_shock * (
                shock * (pen.del2lnTT() + g2) + gsglnTT)
            ts.diffus(eos.gamma * self.chi_shock * shock)
        if self.chi_hyper3 > 0.0:
            if {"hyper3-sph", "hyper3_sph", "hyper3-cyl",
                    "hyper3_cyl"} & set(self.iheatcond):
                # polar form χ₃/π⁴·δ⁶s·dline_1² (entropy.f90:4596
                # calc_heatcond_hyper3_polar); CFL χ₃/π⁴·dxmin⁴
                d1 = pen.dline_1()
                pi4_1 = 1.0 / 97.40909103400243
                out = out + self.chi_hyper3 * pi4_1 * sum(
                    pen.d6_raw("ss", a)[0] * d1[a] ** 2 for a in range(3))
                dxmin = 1.0 / jnp.maximum(jnp.maximum(
                    jnp.max(d1[0]), jnp.max(d1[1])), jnp.max(d1[2]))
                ts.diffus3(self.chi_hyper3 * pi4_1 * dxmin ** 4)
            else:
                out = out + self.chi_hyper3 * pen.del6s_scaled("ss")
                ts.diffus3(self.chi_hyper3)
        if any(c != 0.0 for c in self.chi_hyper3_aniso):
            # anisotropic hyperdiffusion Σ_j χ₃ⱼ ∂⁶s/∂x_j⁶
            # (entropy.f90 iheatcond 'hyper3-aniso')
            out = out + sum(self.chi_hyper3_aniso[a]
                            * pen.d6_raw("ss", a)[0] * pen._inv(a) ** 6
                            for a in range(3))
            d1 = pen.dline_1()
            dxyz6 = d1[0] ** 6 + d1[1] ** 6 + d1[2] ** 6
            ts.diffus3(sum(self.chi_hyper3_aniso[a] * d1[a] ** 6
                           for a in range(3)) / dxyz6)
        if self.tau_cool != 0.0:
            # ds/dt −= cp(T − TTref)/(γ·τ·T)  (heat/(ρT) with
            # heat = −ρcpγ⁻¹(T−TTref)/τ, entropy.f90:5947)
            TT = pen.TT()
            out = out - eos.cp / eos.gamma * (TT - self.TTref_cool) \
                / (self.tau_cool * TT)
        if self.chi_hyper3_mesh > 0.0:
            d1 = pen.dline_1()
            pi5_1 = 1.0 / 306.0196847852814
            out = out + self.chi_hyper3_mesh * pi5_1 * sum(
                pen.d6_raw("ss", a)[0] * d1[a] / 60.0 for a in range(3))
            ts.advec_mesh(self.chi_hyper3_mesh * pi5_1
                          * jnp.sqrt(d1[0]**2 + d1[1]**2 + d1[2]**2))

        # viscous + ohmic heating published by those modules
        heat = pen._cache.get("visc_heat")
        if heat is not None:
            out = out + heat * pen.TT1()
        ohm = pen._cache.get("ohmic_heat")
        if ohm is not None:
            out = out + ohm * pen.rho1() * pen.TT1()

        if self.cooltype == "shell" and (self.cool_ext != 0.0
                                         or self.cool_int != 0.0):
            # shell-boundary heating/cooling (entropy.f90:6348-6372):
            # heat = −cool_ext·step(r,r_ext,wcool)·(cs²−cs²_ext)/cs²_ext
            #        −cool_int·(1−step(r,r_int,wcool))·(cs²−cs²_int)/cs²_int
            # entering as ds/dt += heat·ρ⁻¹T⁻¹ (calc_heat_cool :5994)
            g = pen.grid
            gs = pen.cfg.grid
            if gs.coords == "spherical":
                r = g.xg + jnp.zeros((gs.nx, gs.ny, gs.nz), g.z.dtype)
            else:
                r = jnp.sqrt(g.xg ** 2 + g.yg ** 2 + g.zg ** 2) \
                    + jnp.zeros((gs.nx, gs.ny, gs.nz), g.z.dtype)
            w = max(self.wcool, 1e-30)
            cs2 = pen.cs2()
            heat = 0.0
            if self.cool_ext != 0.0:
                prof = 0.5 * (1.0 + jnp.tanh((r - self.rshell_ext) / w))
                heat = heat - self.cool_ext * prof \
                    * (cs2 - self.cs2_ext) / self.cs2_ext
            if self.cool_int != 0.0:
                prof = 0.5 * (1.0 - jnp.tanh((r - self.rshell_int) / w))
                heat = heat - self.cool_int * prof \
                    * (cs2 - self.cs2_int) / self.cs2_int
            out = out + pen.rho1() * pen.TT1() * heat
        grav = pen.cfg.module("gravity") if pen.cfg is not None else None
        lgravr = bool(grav is not None and getattr(grav, "ipotential", ""))
        if lgravr and (self.luminosity != 0.0 or self.cool != 0.0) \
                and self.cooltype != "shell":
            # star-in-a-box (get_heat_cool_gravr, entropy.f90:6286-6386):
            # normalized CENTRAL gaussian heating + radial-shell cooling;
            # applied as ds/dt += ρ⁻¹T⁻¹·heat
            g = pen.grid
            gs = pen.cfg.grid
            r = jnp.sqrt(g.xg ** 2 + g.yg ** 2 + g.zg ** 2) \
                + jnp.zeros((gs.nx, gs.ny, gs.nz), g.z.dtype)
            dim2 = gs.nz == 1
            norm = (2.0 * jnp.pi * self.wheat ** 2) ** (-1.0 if dim2
                                                        else -1.5)
            heat = self.luminosity * norm \
                * jnp.exp(-0.5 * (r / self.wheat) ** 2)
            if self.cool != 0.0:
                rcool = self.rcool if self.rcool != 0.0 else self.r_ext
                prof = 0.5 * (1.0 + jnp.tanh((r - rcool)
                                             / max(self.wcool, 1e-30)))
                cs2 = pen.cs2()
                cs2c = self.cs2cool
                if cs2c == 0.0:
                    # the isentropic-star init shares cs2cool = cs2_ext =
                    # cs20·(1 − (γ−1)(Φ(r_ext)−Φ0)/cs20)
                    # (density.f90:1276-1296) — a static host-side number
                    import jax as _jax
                    e = pen.eos
                    with _jax.ensure_compile_time_eval():
                        pot_ext = float(grav.potential(
                            jnp.asarray(float(self.r_ext))))
                        pot0 = float(jnp.asarray(
                            getattr(grav, "pot0", 0.0)))
                    cs2c = e.cs20 * (1.0 - (e.gamma - 1.0)
                                     * (pot_ext - pot0) / e.cs20)
                fac = cs2c if cs2c != 0.0 else 1.0
                term = self.cool * prof * (cs2 - cs2c) / fac
                if self.cooltype in ("cs2-rho", "Temp-rho", "pressure"):
                    term = term * pen.rho()   # /rho1 (time-step neutral)
                heat = heat - term
            out = out + pen.rho1() * pen.TT1() * heat
        elif self.cool != 0.0 and self.cooltype != "shell":
            # vertical-gravity cooling layer (get_heat_cool_gravz,
            # entropy.f90:6243-6276):
            # ds/dt −= ρ⁻¹T⁻¹·cool·prof(z)·(cs²−cs2cool)/cs2cool
            from .initcond import cubic_step as _cstep
            g = pen.grid
            gs = pen.cfg.grid
            ztop = gs.z0 + gs.Lz
            cp_ = self.cooling_profile
            if cp_ == "step":
                w = max(self.wcool, 1e-30)
                prof = 0.5 * (1.0 + jnp.tanh((g.zg - self.z2) / w))
            elif cp_ == "step2":
                w = max(self.wcool, 1e-30)
                prof = 0.5 * (1.0 + jnp.tanh((g.zg - self.zcool) / w))
            elif cp_ == "cubic_step":
                prof = _cstep(g.zg, self.z2, self.wcool)
            elif cp_ == "lin-z":
                prof = g.zg / max(self.wcool, 1e-30)
            else:               # 'gaussian' (default, at the top)
                zref = self.zcool if self.zcool != 0.0 else ztop
                prof = jnp.exp(-0.5 * ((g.zg - zref) / self.wcool) ** 2)
            cs2 = pen.cs2()
            # cs2cool=0 inherits cs2top (initialize_energy,
            # entropy.f90:691-699); cs2top itself defaults to cs20
            cs2c = self.cs2cool if self.cs2cool != 0.0 else \
                (pen.eos.cs20 if pen.eos is not None else 1.0)
            out = out - pen.rho1() * pen.TT1() \
                * self.cool * prof * (cs2 - cs2c) / cs2c
        if self.luminosity != 0.0 and not lgravr:
            # gaussian heating layer at the bottom, volume-normalized so
            # the integral is L (entropy.f90:6222-6231)
            g = pen.grid
            gs = pen.cfg.grid
            zbot = gs.z0
            prof = jnp.exp(-0.5 * ((g.zg - zbot) / self.wheat) ** 2)
            hnorm = (2.0 * jnp.pi) ** 0.5 / 2.0 * self.wheat * gs.Lx
            if gs.ny > 1:
                hnorm = hnorm * gs.Ly
            norm = self.luminosity / hnorm
            out = out + norm * prof * pen.rho1() * pen.TT1()

        accumulate(df, "ss", out)

    def init_fields(self, grid, spec, eos, key, cfg=None, fields=None):
        if isinstance(self.init, (list, tuple)):
            # ninit cascade — each entry ADDS (entropy.f90 init loop)
            import dataclasses

            import jax
            out = {}
            for i, nm in enumerate(self.init):
                key, sub = jax.random.split(key)
                over = dict(self.init_list_pars[i]) \
                    if i < len(self.init_list_pars) else {}
                d = dataclasses.replace(
                    self, init=str(nm), init_list_pars=(), **over) \
                    .init_fields(
                    grid, spec, eos, sub, cfg,
                    fields={**(fields or {}),
                            **{k: v for k, v in out.items()
                               if not k.startswith("+")}})
                for k, v in d.items():
                    out[k] = out.get(k, 0.0) + v
            return out
        if self.init in ("geo-kws", "geo-benchmark"):
            # spherical-shell temperature profile (shell_ss, entropy.f90):
            # T = T_ext(1 + β₁(r_out/r − 1)), β₁ = (1/cp)·g0/(m+1)·γ/(γ−1);
            # ss from eoscalc(ilnrho_lnTT)
            grav = cfg.module("gravity") if cfg else None
            g0 = getattr(grav, "g0", 1.0) if grav else 1.0
            gamma = eos.gamma
            m = self.mpoly0
            beta1 = (1.0 / eos.cp) * g0 / (m + 1.0) * gamma / (gamma - 1.0)
            ones = jnp.ones(spec.shape, grid.z.dtype)
            TT_ext = self.T0
            if getattr(spec, "coords", "cartesian") != "cartesian":
                r = grid.xg + 0.0 * ones
                r_out = float(grid.interior(grid.x)[-1])
                TT = TT_ext * (1.0 + beta1 * (r_out / r - 1.0))
                TT = TT.at[-1].set(TT_ext)
            else:
                # shell-in-a-box branch: T = T_ext + β₁(1/r − 1/r_ext)
                # between r_int..r_ext, clamped outside (shell_ss)
                r = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2
                             + grid.zg ** 2) + 0.0 * ones
                den = cfg.module("density") if cfg else None
                r_int = (getattr(den, "r_int", 0.0) or 0.5) if den else 0.5
                r_ext = (getattr(den, "r_ext", 0.0) or 1.0) if den else 1.0
                TT_int = TT_ext + beta1 * (1.0 / r_int - 1.0 / r_ext)
                TT = TT_ext + beta1 * (1.0 / jnp.maximum(r, 1e-9)
                                       - 1.0 / r_ext)
                TT = jnp.where(r >= r_ext, TT_ext,
                               jnp.where(r <= r_int, TT_int, TT))
            lnrho = None
            if fields is not None and "lnrho" in fields:
                lnrho = fields["lnrho"]
            if lnrho is None:
                lnrho = jnp.full(spec.shape, eos.lnrho0, grid.z.dtype)
            lnTT = jnp.log(jnp.maximum(TT, 1e-30))
            ss = (eos.cp / gamma) * (lnTT - eos.lnTT0
                                     - (gamma - 1.0) * (lnrho - eos.lnrho0))
            return {"ss": ss + 0.0 * ones}
        if self.init == "blob_hs":
            # blob in hydrostatic equilibrium: +A on ss, −A on lnrho
            # (entropy.f90:1722-1726)
            from .initcond import init_scalar
            b = init_scalar("blob", grid, spec, eos, key, ampl=self.ampl,
                            radius=self.radius, center1=self.center1)
            return {"ss": b, "+lnrho": -b}
        if self.init in ("isothermal", "const_ss"):
            if self.init == "const_ss":
                # uniform entropy ss_const (entropy.f90 'const_ss')
                return {"ss": jnp.full(spec.shape, self.ampl,
                                       grid.z.dtype)}
            # isothermal_entropy (eos_idealgas.f90 isothermal_entropy):
            # lnTT = ln T0, ss from eoscalc(ilnrho_lnTT):
            # s = cv(lnT0 − lnTT0) − (cp−cv)(lnρ−lnρ0)
            lnrho = None
            if fields is not None:
                if "lnrho" in fields:
                    lnrho = fields["lnrho"]
                elif "rho" in fields:
                    lnrho = jnp.log(jnp.maximum(fields["rho"], 1e-30))
            if lnrho is None:
                lnrho = jnp.full(spec.shape, eos.lnrho0, grid.z.dtype)
            import math as _m
            ss0 = eos.cv * (_m.log(self.T0) - eos.lnTT0)
            return {"ss": ss0 - (eos.cp - eos.cv) * (lnrho - eos.lnrho0)}
        if self.init in ("xjump", "yjump", "zjump"):
            from .initcond import init_scalar
            return {"ss": init_scalar(self.init, grid, spec, eos, key,
                                      width=self.width, left=self.ss_left,
                                      right=self.ss_right)}
        if self.init == "polytropic_simple":
            # layer_ss (entropy.f90:2323): T = β₁(z−z∞),
            # β₁ = (γ/((γ−1)cp))·g_z/(m+1), then ss from
            # eoscalc(ilnrho_lnTT) with the already-initialized lnrho —
            # an ASSIGNMENT that replaces any density-init contribution
            grav = cfg.module("gravity") if cfg else None
            den = cfg.module("density") if cfg else None
            gravz = grav.gravz if grav else -1.0
            zinfty = getattr(grav, "zinfty", 0.0) if grav else 0.0
            gamma = eos.gamma
            m = getattr(den, "mpoly", self.mpoly0) if den else self.mpoly0
            beta1 = (1.0 / eos.cp) * gamma / (gamma - 1.0) * gravz / (m + 1.0)
            TT = beta1 * (grid.zg - zinfty)
            lnTT = jnp.log(jnp.maximum(TT, 1e-30))
            lnrho = None
            if fields is not None:
                if "lnrho" in fields:
                    lnrho = fields["lnrho"]
                elif "rho" in fields:
                    lnrho = jnp.log(jnp.maximum(fields["rho"], 1e-30))
            if lnrho is None:
                lnrho = jnp.full(spec.shape, eos.lnrho0, grid.z.dtype)
            ss = (eos.cp / gamma) * (lnTT - eos.lnTT0
                                     - (gamma - 1.0) * (lnrho - eos.lnrho0))
            return {"ss": ss * jnp.ones(spec.shape, grid.z.dtype)}
        if self.init in ("polytropic", "5"):
            # single polytropic layer (entropy.f90:1672 → polytropic_ss_z
            # :1849):  ss = (1−m(γ−1))/γ · ln(1 + β₁(z−zref)/cs₀²),
            # β₁ = γ g_z/(m+1); zref is set by the density
            # polytropic_simple init from zinfty
            # (density.f90:3274: zref = z∞ − (m+1)cs₀²/(−γ g_z))
            grav = cfg.module("gravity") if cfg else None
            den = cfg.module("density") if cfg else None
            gravz = grav.gravz if grav else -1.0
            zinfty = getattr(grav, "zinfty", 0.0) if grav else 0.0
            gamma = eos.gamma
            cs20 = eos.cs20
            m_den = getattr(den, "mpoly", self.mpoly0) if den else self.mpoly0
            if grav is not None and getattr(grav, "zref", 9e99) < 1e99:
                # explicit zref namelist value wins (gravity_simple zref)
                zref = grav.zref
            else:
                zref = zinfty - (m_den + 1.0) * cs20 / (-gamma * gravz)
            m = self.mpoly0
            beta1 = gamma * gravz / (m + 1.0)
            arg = jnp.maximum(1.0 + beta1 * (grid.zg - zref) / cs20, 1e-30)
            ss = ((1.0 - m * (gamma - 1.0)) / gamma * jnp.log(arg)
                  / eos.cp)
            return {"ss": ss * jnp.ones(spec.shape, grid.z.dtype)}
        if self.init == "piecew-poly":
            from .stratification import piecew_poly_profiles
            grav = cfg.module("gravity") if cfg else None
            _, ss = piecew_poly_profiles(
                grid.interior(grid.z), spec, eos,
                gravz=grav.gravz if grav else -1.0,
                z1=self.z1, z2=self.z2, mpoly0=self.mpoly0,
                mpoly1=self.mpoly1, mpoly2=self.mpoly2,
                isothtop=self.isothtop, width=self.width)
            return {"ss": ss[None, None, :]
                    * jnp.ones(spec.shape, grid.z.dtype)}
        from .initcond import init_scalar
        return {"ss": init_scalar(self.init, grid, spec, eos, key,
                                  ampl=self.ampl, width=self.width,
                                  kx=self.kx, ky=self.ky, kz=self.kz,
                                  radius=self.radius, center1=self.center1,
                                  field="ss")}
