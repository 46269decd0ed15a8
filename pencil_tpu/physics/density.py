"""Continuity equation (reference ``src/density.f90``, ``dlnrho_dt`` at
:2474-2872):  Dlnρ/Dt = −∇·u in the default log formulation, or with
``lnolog`` (reference ldensity_nolog) ∂ρ/∂t = −∇·(ρu) in conservative
flux form (+ mass diffusion / hyperdiffusion)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Density(ModuleBase):
    name: ClassVar[str] = "density"

    lupw_lnrho: bool = False       # 5th-order upwinding of the advection term
    lnolog: bool = False           # evolve rho itself (ldensity_nolog)
    lrelativistic_eos: bool = False  # p=ρ/3 fluid (density.f90:2546-2554)
    lweno_transport: bool = False  # WENO5 flux transport (weno_transport.f90)
    diffrho: float = 0.0           # Fickian mass diffusion
    diffrho_shock: float = 0.0     # idiff='shock' (density.f90:2668)
    diffrho_hyper3: float = 0.0    # del6 hyperdiffusion (simplified flavor)
    # idiff='hyper3-sph'/'hyper3-cyl': D₃/π⁴·δ⁶·dline_1² polar form
    # (density.f90:2751-2768 ldiff_hyper3_polar)
    lhyper3_polar: bool = False
    diffrho_hyper3_mesh: float = 0.0  # resolution-independent mesh flavor
    diffrho_hyper3_aniso: tuple = (0.0, 0.0, 0.0)  # per-axis flavor
    init: str = "zero"             # initial condition name
    ampl: float = 0.0
    width: float = 0.05
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    phase: float = 0.0         # 'sinwave-phase'/'coswave-phase'
    rho_left: float = 1.0      # for init='xjump'
    rho_right: float = 1.0
    rho_const: float = 1.0     # for init='const_rho'
    mpoly: float = 1.5         # polytropic index for 'polytropic_simple'
    # init='stratification': rows of (z, lnrho, ss|lnTT) read from the run
    # directory's stratification.dat (initcond.f90:2660); strati_type
    # selects the second-column meaning
    strati_type: str = "lnrho_ss"
    strati_data: tuple = ()
    # 'planet' (GNG87 vortex) / 'geo-kws' shell parameters
    eps_planet: float = 0.5
    radius_lnrho: float = 1.0
    rbound: float = 1.0
    hh0: float = 0.0
    r_int: float = 0.0
    r_ext: float = 0.0

    def register(self, reg):
        reg.register("rho" if self.lnolog else "lnrho", 1, "pde")

    def rhs(self, pen, df, ts):
        if "uu" not in pen.reg.slots:
            # HYDRO=nohydro: no advection/compression — continuity is
            # dρ/dt = 0 (the reference omits all u-terms), diffusion only
            name = "rho" if self.lnolog else "lnrho"
            if self.diffrho > 0.0:
                accumulate(df, name, self.diffrho * pen.del2s(name))
                ts.diffus(self.diffrho)
            else:
                accumulate(df, name, jnp.zeros_like(pen.field(name)))
            return
        if self.lnolog:
            rho = pen.field("rho")
            if self.lweno_transport:
                from .thermal_energy import weno_div_flux_3d
                out = weno_div_flux_3d(pen, "rho")
            else:
                out = (-pen.ugrad("rho", upwind=self.lupw_lnrho)
                       - rho * pen.divu())
            if self.diffrho > 0.0:
                out = out + self.diffrho * pen.del2s("rho")
                ts.diffus(self.diffrho)
            if self.diffrho_hyper3 > 0.0:
                if self.lhyper3_polar:
                    d1 = pen.dline_1()
                    pi4_1 = 1.0 / 97.40909103400243
                    out = out + self.diffrho_hyper3 * pi4_1 * sum(
                        pen.d6_raw("rho", a)[0] * d1[a] ** 2
                        for a in range(3))
                    dxmin = 1.0 / jnp.maximum(jnp.maximum(
                        jnp.max(d1[0]), jnp.max(d1[1])), jnp.max(d1[2]))
                    ts.diffus3(self.diffrho_hyper3 * pi4_1 * dxmin ** 4)
                else:
                    out = out + self.diffrho_hyper3 \
                        * pen.del6s_scaled("rho")
                    ts.diffus3(self.diffrho_hyper3)
            if any(c != 0.0 for c in self.diffrho_hyper3_aniso):
                # idiff='hyper3-aniso': Σ_j D₃ⱼ ∂⁶ρ/∂x_j⁶ (density.f90
                # ldiff_hyper3_aniso del6fj)
                out = out + sum(self.diffrho_hyper3_aniso[a]
                                * pen.d6_raw("rho", a)[0]
                                * pen._inv(a) ** 6 for a in range(3))
                d1 = pen.dline_1()
                dxyz6 = d1[0] ** 6 + d1[1] ** 6 + d1[2] ** 6
                ts.diffus3(sum(self.diffrho_hyper3_aniso[a] * d1[a] ** 6
                               for a in range(3)) / dxyz6)
            if self.diffrho_hyper3_mesh > 0.0:
                d1 = pen.dline_1()
                pi5_1 = 1.0 / 306.0196847852814
                out = out + self.diffrho_hyper3_mesh * pi5_1 * sum(
                    pen.d6_raw("rho", a)[0] * d1[a] / 60.0 for a in range(3))
                ts.advec_mesh(self.diffrho_hyper3_mesh * pi5_1
                              * jnp.sqrt(d1[0]**2 + d1[1]**2 + d1[2]**2))
            accumulate(df, "rho", out)
            return
        out = -pen.ugrad("lnrho", upwind=self.lupw_lnrho) - pen.divu()
        if self.lrelativistic_eos:
            # ultrarelativistic p=ρ/3: dlnρ/dt = (4/3)(−divu − u·∇lnρ) and
            # the momentum gains +(1/3)u(divu + u·∇lnρ)
            # (reference density.f90:2548-2553)
            accumulate(df, "uu", (-1.0 / 3.0) * pen.uu() * out[None])
            out = (4.0 / 3.0) * out
        if self.diffrho > 0.0:
            # diffusion of rho in lnrho form: D(∇²lnρ + |∇lnρ|²)
            gl = pen.glnrho()
            g2 = gl[0] ** 2 + gl[1] ** 2 + gl[2] ** 2
            out = out + self.diffrho * (pen.del2lnrho() + g2)
            ts.diffus(self.diffrho)
        if self.diffrho_shock > 0.0 and "shock" in pen.reg.slots:
            # D_sh·[shock·(∇²lnρ + |∇lnρ|²) + ∇shock·∇lnρ]
            # (density.f90:2668-2678, log branch)
            shock = pen.field("shock")
            gshock = pen.grad("shock")
            gl = pen.glnrho()
            g2 = gl[0] ** 2 + gl[1] ** 2 + gl[2] ** 2
            gsgl = sum(gshock[a] * gl[a] for a in range(3))
            out = out + self.diffrho_shock * (
                shock * (pen.del2lnrho() + g2) + gsgl)
            ts.diffus(self.diffrho_shock * shock)
        if self.diffrho_hyper3 > 0.0:
            if self.lhyper3_polar:
                d1 = pen.dline_1()
                pi4_1 = 1.0 / 97.40909103400243
                out = out + self.diffrho_hyper3 * pi4_1 * sum(
                    pen.d6_raw("lnrho", a)[0] * d1[a] ** 2
                    for a in range(3))
                dxmin = 1.0 / jnp.maximum(jnp.maximum(
                    jnp.max(d1[0]), jnp.max(d1[1])), jnp.max(d1[2]))
                ts.diffus3(self.diffrho_hyper3 * pi4_1 * dxmin ** 4)
            else:
                out = out + self.diffrho_hyper3 * pen.del6s_scaled("lnrho")
                ts.diffus3(self.diffrho_hyper3)
        if self.diffrho_hyper3_mesh > 0.0:
            d1 = pen.dline_1()
            pi5_1 = 1.0 / 306.0196847852814
            out = out + self.diffrho_hyper3_mesh * pi5_1 * sum(
                pen.d6_raw("lnrho", a)[0] * d1[a] / 60.0 for a in range(3))
            ts.advec_mesh(self.diffrho_hyper3_mesh * pi5_1
                          * jnp.sqrt(d1[0]**2 + d1[1]**2 + d1[2]**2))
        accumulate(df, "lnrho", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        import math
        import jax.numpy as jnp
        if self.lnolog:
            # build in lnrho form, exp at the end (the reference's
            # ldensity_nolog conversion, density.f90:1650); keep any
            # cross-field '+' contributions
            out = Density(**{**self.__dict__, "lnolog": False}).init_fields(
                grid, spec, eos, key, cfg)
            out["rho"] = jnp.exp(out.pop("lnrho"))
            return out
        if self.init in ("const_rho", "const_lnrho"):
            lnrho0 = math.log(self.rho_const) if self.init == "const_rho" \
                else self.ampl
            return {"lnrho": jnp.full(spec.shape, lnrho0,
                                      dtype=grid.x.dtype)}
        if self.init in ("xjump", "yjump", "zjump"):
            from .initcond import init_scalar
            return {"lnrho": init_scalar(
                self.init, grid, spec, eos, key, width=self.width,
                left=math.log(self.rho_left), right=math.log(self.rho_right))}
        if self.init == "isothermal":
            # isothermal stratification lnρ = lnρ0 − γΦ/cs₀², with the
            # matching ss = −(cp−cv)(lnρ−lnρ0) when entropy is evolved
            # (reference isothermal_density, density.f90:3108-3175)
            grav = cfg.module("gravity") if cfg else None
            ones = jnp.ones(spec.shape, grid.x.dtype)
            pot = grav.potential_field(grid, spec) if grav else 0.0
            lnrho = (eos.lnrho0 - eos.gamma * pot / eos.cs20) * ones
            out = {"lnrho": lnrho}
            if cfg is not None and cfg.module("entropy") is not None:
                # the reference always sets ss here; skip only when the
                # entropy init will itself ASSIGN (not add) a profile
                ent = cfg.module("entropy")
                einit = getattr(ent, "init", "zero")
                assigners = {"isothermal", "const_ss", "polytropic",
                             "polytropic_simple", "piecew-poly", "5"}
                names = (einit if isinstance(einit, (list, tuple))
                         else (einit,))
                if not any(str(n) in assigners for n in names):
                    out["+ss"] = -(eos.cp - eos.cv) * (lnrho - eos.lnrho0)
            return out
        if self.init in ("polytropic",):
            # single polytropic layer from zref downward (density.f90:1379
            # → polytropic_lnrho_z :1774): lnρ = lnρ0 + m·ln(1 +
            # β₁(z−zref)/cs₀²), β₁ = γ g_z/(m+1)
            grav = cfg.module("gravity") if cfg else None
            gravz = grav.gravz if grav else -1.0
            zref = grav.zref if grav and grav.zref < 1e99 else 0.0
            m = self.mpoly
            beta1 = eos.gamma * gravz / (m + 1.0)
            arg = jnp.maximum(1.0 + beta1 * (grid.zg - zref) / eos.cs20,
                              1e-30)
            ones = jnp.ones(spec.shape, grid.x.dtype)
            return {"lnrho": (eos.lnrho0 + m * jnp.log(arg)) * ones}
        if self.init == "piecew-poly":
            from .stratification import piecew_poly_profiles
            ent = cfg.module("entropy") if cfg else None
            grav = cfg.module("gravity") if cfg else None
            lnrho, _ = piecew_poly_profiles(
                grid.interior(grid.z), spec, eos,
                gravz=grav.gravz if grav else -1.0,
                z1=ent.z1 if ent else 0.0, z2=ent.z2 if ent else 1.0,
                mpoly0=ent.mpoly0 if ent else 1.0,
                mpoly1=ent.mpoly1 if ent else 3.0,
                mpoly2=ent.mpoly2 if ent else 0.0,
                isothtop=ent.isothtop if ent else 1, width=self.width)
            return {"lnrho": lnrho[None, None, :]
                    * jnp.ones(spec.shape, grid.z.dtype)}
        if self.init == "polytropic_simple":
            # lnρ = lnρ0 + m·ln(−γΦ/((m+1)cs₀²)) with Φ = −g_z(z−z∞), and
            # the matching polytropic entropy  ss += ((m+1)/γ − m)·dlncs2
            # (reference density.f90:3243 polytropic_simple, lgravz const
            # branch; ggamma=1+1/m so m(ggamma/γ−1)=(m+1)/γ−m)
            grav = cfg.module("gravity") if cfg else None
            gravz = grav.gravz if grav else -1.0
            zinfty = getattr(grav, "zinfty", 0.0) if grav else 0.0
            gamma = eos.gamma if eos else 5.0 / 3.0
            cs20 = eos.cs20 if eos else 1.0
            lnrho0 = eos.lnrho0 if eos else 0.0
            m = self.mpoly
            ones = jnp.ones(spec.shape, grid.z.dtype)
            pot = -gravz * (grid.zg - zinfty)
            dlncs2 = jnp.log(-gamma * pot / ((m + 1.0) * cs20)) * ones
            out = {"lnrho": lnrho0 + m * dlncs2}
            ent = cfg.module("entropy") if cfg is not None else None
            # the ss contribution survives only when the entropy init does
            # not itself ASSIGN a profile afterwards (e.g. layer_ss for
            # initss='polytropic_simple' overwrites f(iss))
            if ent is not None and getattr(ent, "init", "zero") in (
                    "zero", "nothing", ""):
                out["+ss"] = ((m + 1.0) / gamma - m) * dlncs2
            return out
        if self.init == "stratification":
            # interpolate the tabulated profile onto our interior z; the
            # reference requires the table to line up with the grid
            # (nzgrid or mzgrid rows) — interp makes that exact for
            # matching grids and robust otherwise
            import numpy as np
            rows = np.asarray(self.strati_data, dtype=np.float64)
            if rows.size == 0:
                raise ValueError("init='stratification' needs strati_data "
                                 "(stratification.dat not found)")
            zt = grid.interior(grid.z)
            lnrho = jnp.asarray(
                np.interp(np.asarray(zt), rows[:, 0], rows[:, 1]),
                grid.z.dtype)
            col2 = np.interp(np.asarray(zt), rows[:, 0], rows[:, 2]) \
                if rows.shape[1] > 2 else None
            ones = jnp.ones(spec.shape, grid.z.dtype)
            out = {"lnrho": lnrho[None, None, :] * ones}
            if col2 is not None and cfg is not None:
                _ent = cfg.module("entropy")
                _lnTT_evolved = (cfg.module("temperature") is not None
                                 or (_ent is not None
                                     and hasattr(_ent, "initlnTT")))
                if self.strati_type in ("lnrho_lnTT", "lnrho_lnTT_acc") \
                        and _lnTT_evolved:
                    # energy slot evolves lnTT: install the column directly
                    out["+lnTT"] = jnp.asarray(
                        col2, grid.z.dtype)[None, None, :] * ones
                elif self.strati_type in ("lnrho_lnTT",
                                          "lnrho_lnTT_acc") \
                        and cfg.module("entropy") is not None:
                    lnTTcol = jnp.asarray(col2, grid.z.dtype)
                    if hasattr(eos, "ss_from_lnTT"):
                        # ionization EOS: exact Saha inversion
                        ss = eos.ss_from_lnTT(lnrho, lnTTcol)
                    else:
                        # eoscalc(ilnrho_lnTT → ss): invert
                        # lnTT = lnTT0 + (γ/cp)·ss + (γ−1)(lnρ−lnρ0)
                        g = eos.gamma
                        ss = (eos.cp / g) * (lnTTcol - eos.lnTT0
                                             - (g - 1.0)
                                             * (lnrho - eos.lnrho0))
                    out["+ss"] = ss[None, None, :] * ones
                elif self.strati_type in ("lnrho_lnTT", "lnrho_lnTT_acc") \
                        and cfg.module("temperature") is not None:
                    out["+lnTT"] = jnp.asarray(
                        col2, grid.z.dtype)[None, None, :] * ones
                elif cfg.module("entropy") is not None:
                    out["+ss"] = jnp.asarray(
                        col2, grid.z.dtype)[None, None, :] * ones
            return out
        if self.init == "geo-kws":
            # hydrostatic spherical-shell stratification (shell_lnrho,
            # density.f90:1904): lnρ = lnρ0 + m·ln(1 + β₁(r_out/r − 1)),
            # β₁ = g0/(m+1)·γ/(γ−1); the outermost radius keeps lnρ0
            grav = cfg.module("gravity") if cfg else None
            g0 = getattr(grav, "g0", 1.0) if grav else 1.0
            gamma = eos.gamma
            m = self.mpoly
            beta1 = g0 / (m + 1.0) * gamma / (gamma - 1.0)
            ones = jnp.ones(spec.shape, grid.x.dtype)
            if getattr(spec, "coords", "cartesian") != "cartesian":
                r = grid.xg + 0.0 * ones
                r_out = float(grid.interior(grid.x)[-1])
                prof = eos.lnrho0 + m * jnp.log(
                    jnp.maximum(1.0 + beta1 * (r_out / r - 1.0), 1e-30))
                return {"lnrho": prof.at[-1].set(eos.lnrho0)}
            r = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2 + grid.zg ** 2) \
                + 0.0 * ones
            r_int = getattr(self, "r_int", 0.0) or 0.7
            r_ext = getattr(self, "r_ext", 0.0) or 1.0
            prof = eos.lnrho0 + m * jnp.log(
                jnp.maximum(1.0 + beta1 * (r_ext / jnp.maximum(r, 1e-9)
                                           - 1.0), 1e-30))
            lnrho_int = eos.lnrho0 + m * math.log(
                1.0 + beta1 * (r_ext / r_int - 1.0))
            out = jnp.where(r <= r_int, lnrho_int,
                            jnp.where(r >= r_ext, eos.lnrho0, prof))
            return {"lnrho": out}
        if self.init == "toomre-wave-x":
            # sound wave + self-gravity + rotation (density.f90:1580):
            # lnρ = lnρ0 + A sin(kx·x); ux, uy from the complex Toomre
            # dispersion ω_J = √(cs₀²kx² + Ω² − 4πGρ₀)/(ρ₀kx)
            import cmath
            sg = cfg.module("selfgravity") if cfg else None
            hyd = cfg.module("hydro") if cfg else None
            OO = float(getattr(hyd, "Omega", 0.0) or 0.0)
            rhs_pc = 4.0 * math.pi * (sg.gravitational_const if sg else 0.0)
            rho0 = eos.rho0
            om_j = cmath.sqrt(complex(
                eos.cs20 * self.kx ** 2 + OO ** 2 - rhs_pc * rho0)) \
                / (rho0 * self.kx)
            x = grid.xg
            ones = jnp.ones(spec.shape, grid.x.dtype)
            lnrho = eos.lnrho0 + self.ampl * jnp.sin(self.kx * x) * ones
            oa = om_j * self.ampl
            ux = abs(oa) * jnp.sin(self.kx * x + cmath.phase(oa)) * ones
            ca = self.ampl * complex(0.0, -0.5 * OO / (self.kx * rho0))
            uy = abs(ca) * jnp.sin(self.kx * x + cmath.phase(ca)) * ones
            return {"lnrho": lnrho,
                    "+uu": jnp.stack([ux, uy, jnp.zeros_like(ux)])}
        if self.init == "planet":
            # GNG87 cylindrical planet vortex (initcond.f90:3171 planet):
            # enthalpy hh inside the ellipse r_ell<1 from the σ,δ params,
            # u = (ε²σΩy, (q−σ)Ωx)·ξ, lnρ = ln((γ−1)h/cs₀²)/(γ−1), then
            # normalized to unit box-average density
            shear = cfg.module("shear") if cfg else None
            hyd = cfg.module("hydro") if cfg else None
            OO = float(getattr(shear, "Omega", 0.0)
                       or getattr(hyd, "Omega", 0.0) or 1.0)
            q = float(getattr(shear, "qshear", 1.5) if shear else 1.5)
            eps = self.eps_planet
            radius = self.radius_lnrho
            sigma = math.sqrt(2.0 * q / (1.0 - eps ** 2))
            delta2 = (2.0 - sigma) * sigma
            gamma = eos.gamma
            x, y, z = grid.xg, grid.yg, grid.zg
            ones = jnp.ones(spec.shape, grid.x.dtype)
            b_ell, a_ell = radius, radius / eps
            ztop = spec.z0 + spec.Lz
            r_ell = jnp.sqrt((x / b_ell) ** 2 + (y / a_ell) ** 2) \
                + 0.0 * ones
            w = max(self.width, 1e-9)
            xi = 1.0 / (jnp.exp((r_ell - self.rbound) / w) + 1.0)
            hh = (0.5 * delta2 * OO ** 2
                  * (radius ** 2 - x ** 2 - eps ** 2 * y ** 2)
                  - 0.5 * OO ** 2 * z ** 2 + 0.5 * OO ** 2 * ztop ** 2
                  + self.hh0)
            hh_out = (-0.5 * OO ** 2 * z ** 2 + 0.5 * OO ** 2 * ztop ** 2
                      + self.hh0) + 0.0 * ones
            hh = jnp.where(r_ell > 1.0, hh_out, hh + 0.0 * ones)
            ux = eps ** 2 * sigma * OO * y * xi + 0.0 * ones
            uy = (q - sigma) * OO * x * xi + ones * 0.0
            if abs(gamma - 1.0) < 1e-6:
                lnrho = hh / eos.cs20 + ones * 0.0
            else:
                lnrho = jnp.log(jnp.maximum(
                    (gamma - 1.0) * hh / eos.cs20, 1e-30)) / (gamma - 1.0)
            lnrho = lnrho - jnp.mean(lnrho)   # <ρ> → rho0 normalization
            return {"lnrho": lnrho + ones * 0.0,
                    "+uu": jnp.stack([ux, uy, jnp.zeros_like(ux)])}
        if self.init == "jeans-wave-x":
            # Jeans wave: lnρ = A sin(kx·x), ux += |ω_J A| sin(kx·x + arg)
            # with ω_J = sqrt(cs₀²kx² − rhs_poisson·ρ₀)/(ρ₀ kx)
            # (reference src/density.f90:1526-1549); rhs_poisson = 4πG.
            sg = cfg.module("selfgravity") if cfg else None
            rhs_pc = 4.0 * math.pi * (sg.gravitational_const if sg else 0.0)
            rho0 = eos.rho0 if eos else 1.0
            cs20 = eos.cs20 if eos else 1.0
            om2 = cs20 * self.kx ** 2 - rhs_pc * rho0
            omega = complex(om2, 0.0) ** 0.5 / (rho0 * self.kx)
            x = grid.xg
            ones = jnp.ones(spec.shape, grid.x.dtype)
            lnrho = self.ampl * jnp.sin(self.kx * x) * ones
            oa = omega * self.ampl
            ux = abs(oa) * jnp.sin(self.kx * x
                                   + math.atan2(oa.imag, oa.real)) * ones
            uu = jnp.stack([ux, jnp.zeros_like(ux), jnp.zeros_like(ux)])
            return {"lnrho": lnrho, "+uu": uu}
        from .initcond import init_scalar
        return {"lnrho": init_scalar(self.init, grid, spec, eos, key,
                                     ampl=self.ampl, width=self.width,
                                     kx=self.kx, ky=self.ky, kz=self.kz,
                                     phase=self.phase, field="lnrho",
                                     radius=self.radius_lnrho)}
