"""Initial-condition plug-in slot (reference ``src/initial_condition/``:
65 user plug-ins implementing initial_condition_uu/lnrho/ss/aa hooks,
selected by ``INITIAL_CONDITION = initial_condition/<name>`` in
Makefile.local).

The plug-in runs AFTER the per-module inits and overrides their fields.
Registry entries are ``fn(grid, spec, eos, cfg, params) -> {field: array}``.

Implemented plug-ins:
  * 'kelvin_helmholtz' — double shear layer with density contrast
    (reference src/initial_condition/kelvin_helmholtz.f90: bands at
    y ∈ [0,.25,.5,.75,1] with exponential smoothing ``lsmooth``, ux = ±0.5,
    ρ = 1↔2, seed uy = 0.01·sin(4πx); the 2d-tests/Kelvin-Helmholtz golden)
  * 'fluxring' — a circular magnetic flux ring in the (x,y) plane.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, ClassVar, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .base import ModuleBase

IC_REGISTRY: Dict[str, Callable] = {}


def register_ic(name):
    def deco(fn):
        IC_REGISTRY[name] = fn
        return fn
    return deco


def _bands(y, v1, v2, lsmooth):
    """Reference kelvin_helmholtz band profile: value v1 in the outer
    quarters, v2 in the middle half, exponentially smoothed at the four
    interfaces.  y is wrapped into (0, 1] (the reference grid is half-cell
    shifted and never hits y = 0; ours isn't)."""
    ls = max(lsmooth, 1e-9)
    y = jnp.where(y <= 0.0, y + 1.0, y)
    out = jnp.where(
        (y > 0.0) & (y <= 0.25),
        v1 - 0.5 * (v1 - v2) * jnp.exp((y - 0.25) / ls),
        jnp.where(
            (y > 0.25) & (y <= 0.5),
            v2 + 0.5 * (v1 - v2) * jnp.exp((-y + 0.25) / ls),
            jnp.where(
                (y > 0.5) & (y <= 0.75),
                v2 + 0.5 * (v1 - v2) * jnp.exp(-(0.75 - y) / ls),
                v1 - 0.5 * (v1 - v2) * jnp.exp(-(y - 0.75) / ls),
            ),
        ),
    )
    return out


@register_ic("kelvin_helmholtz")
def ic_kelvin_helmholtz(grid, spec, eos, cfg, params):
    lsmooth = float(params.get("lsmooth", 0.025))
    x, y = grid.xg, grid.yg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    ux = _bands(y, 0.5, -0.5, lsmooth) * ones
    uy = 0.01 * jnp.sin(4.0 * np.pi * x) * ones
    uz = jnp.zeros_like(ux)
    rho = _bands(y, 1.0, 2.0, lsmooth) * ones
    out = {"uu": jnp.stack([ux, uy, uz])}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = rho
    else:
        out["lnrho"] = jnp.log(rho)
    if cfg.module("entropy") is not None and eos is not None:
        # isobaric start (reference initial_condition_ss): p = p0 uniform,
        # T = p0/((cp−cv)ρ), then s from the ideal-gas inversion
        TT0 = eos.cs20 / eos.cp / (eos.gamma - 1.0)
        lnTT = jnp.log(TT0 * eos.rho0 / rho)  # T/T0 = rho0/rho at p = p0
        lnTT0 = jnp.log(TT0)
        ss = eos.cp / eos.gamma * (
            (lnTT - lnTT0) - (eos.gamma - 1.0) * (jnp.log(rho) - eos.lnrho0))
        out["ss"] = ss * jnp.ones(spec.shape, grid.x.dtype)
    return out


@register_ic("fluxring")
def ic_fluxring(grid, spec, eos, cfg, params):
    """A_z = ampl·exp(−(ϖ−R)²/w²) → a magnetic flux ring of radius R."""
    ampl = float(params.get("ampl", 1e-3))
    R = float(params.get("radius", 0.3 * min(spec.Lx, spec.Ly)))
    w = float(params.get("width", 0.1 * R))
    xc = spec.x0 + 0.5 * spec.Lx
    yc = spec.y0 + 0.5 * spec.Ly
    x, y = grid.xg, grid.yg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    varpi = jnp.sqrt((x - xc) ** 2 + (y - yc) ** 2)
    az = ampl * jnp.exp(-((varpi - R) / w) ** 2) * ones
    zero = jnp.zeros_like(az)
    return {"aa": jnp.stack([zero, zero, az])}


@dataclass(frozen=True)
class InitialCondition(ModuleBase):
    name: ClassVar[str] = "initial_condition"

    plugin: str = ""
    params: tuple = ()   # (("lsmooth", 0.025), ...) — hashable param pairs

    def init_fields(self, grid, spec, eos, key, cfg=None):
        fn = IC_REGISTRY.get(self.plugin)
        if fn is None:
            raise KeyError(f"unknown initial_condition plugin "
                           f"{self.plugin!r}; known: {sorted(IC_REGISTRY)}")
        import inspect
        if "key" in inspect.signature(fn).parameters:
            return fn(grid, spec, eos, cfg, dict(self.params), key=key)
        return fn(grid, spec, eos, cfg, dict(self.params))


@register_ic("shallow_water_init")
def ic_shallow_water_init(grid, spec, eos, cfg, params):
    """Shallow-water initial states (reference
    src/initial_condition/shallow_water_init.f90): 'solid-body' rotation
    u = Ω×r (+ the balanced gh profile), 'gaussian-blob' geopotential."""
    x, y = grid.xg, grid.yg
    dtype = grid.x.dtype
    ones = jnp.ones(spec.shape, dtype)
    sw = cfg.module("shallow_water") if cfg else None
    Om = float(params.get("omega_sb", sw.Omega_SB if sw else 1.0))
    gam = float(params.get("gamma_parameter",
                           sw.gamma_parameter if sw else 1.0))
    eta0 = float(params.get("eta0", 0.0))
    out = {}
    hydro = str(params.get("init_shallow_hydro", "nothing"))
    if hydro == "solid-body":
        ux = -Om * y * ones
        uy = Om * x * ones
        out["uu"] = jnp.stack([ux, uy, jnp.zeros_like(ux)])
    dens = str(params.get("init_shallow_density", "nothing"))
    if dens == "solid-body":
        r2 = x ** 2 + y ** 2
        out["rho"] = (eta0 + Om ** 2 * r2
                      * (1.5 - 0.25 * gam / Om * r2)) * ones
    elif dens == "gaussian-blob":
        k_eta = float(params.get("k_eta", 1.0))
        x0 = float(params.get("x0_drop", 0.0))
        y0 = float(params.get("y0_drop", 0.0))
        out["rho"] = eta0 * jnp.exp(
            -k_eta * ((x - x0) ** 2 + (y - y0) ** 2)) * ones
    return out


@register_ic("Rayleigh-Taylor")
def ic_rayleigh_taylor(grid, spec, eos, cfg, params):
    """Rayleigh–Taylor setup (reference
    src/initial_condition/Rayleigh-Taylor.f90): heavy-over-light tanh
    density interface in hydrostatic + isobaric-entropy balance, seeded by
    a single uz mode."""
    import numpy as np
    ampluu = float(params.get("ampluu", 0.0))
    w = float(params.get("widthrho", 1.0))
    x, z = grid.xg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    grav = cfg.module("gravity") if cfg else None
    gz = grav.gravz if grav else -0.1
    dz = spec.Lz / max(spec.nz - 1, 1)
    dd = 6.0 * dz
    uz = (ampluu / 4.0) * (1 + jnp.cos(2 * np.pi * x / spec.Lx)) \
        * (1 + jnp.cos(2 * np.pi * z / spec.Lz)) * ones
    rhoprof = (w / 2.0) * (jnp.tanh(z / dd) + 1.0) + eos.rho0
    P0 = eos.rho0 * eos.cs20 / eos.gamma
    Pprof = (P0 + gz * (w / 2.0 + eos.rho0) * z
             + gz * (w / 2.0) * dd * jnp.log(jnp.cosh(z / dd)))
    ss = (-jnp.log(rhoprof / eos.rho0)
          + jnp.log(Pprof / P0) / eos.gamma) * ones
    zero = jnp.zeros_like(uz)
    return {"uu": jnp.stack([zero, zero, uz]),
            "lnrho": jnp.log(rhoprof) * ones, "ss": ss}


def _der_x6(a, dx_1, g=3):
    """6th-order central d/dx along axis 0 of a ghosted numpy array
    (reference deriv.f90:89 der_main coefficients 45/-9/1 over 60),
    scaled by the non-equidistant metric dx_1 (ghosted 1-D)."""
    mx = a.shape[0]
    d = (45.0 * (a[g + 1:mx - g + 1] - a[g - 1:mx - g - 1])
         - 9.0 * (a[g + 2:mx - g + 2] - a[g - 2:mx - g - 2])
         + (a[g + 3:mx - g + 3] - a[g - 3:mx - g - 3])) / 60.0
    sc = np.asarray(dx_1, np.float64)[g:mx - g]
    return d * sc.reshape((-1,) + (1,) * (a.ndim - 1))


@register_ic("centrifugal_balance")
def ic_centrifugal_balance(grid, spec, eos, cfg, params):
    """Accretion-disk start in rotational equilibrium (reference
    src/initial_condition/centrifugal_balance.f90):

      * cs²(r) = cs₀²·((r/r_ref)²+rsmooth²)^(−q/2)  (power_law :538)
      * lnρ_mid = lnρ₀ − ·5p·ln((r/r_ref)²+rsmooth²) (imidplane='power-law'
        :551) + vertical stratification (:570-626: spherical latitude
        log-cos law / potential-difference law) + optional pressure bump
      * u_φ: Ω² = −g_r/r for a gravity module (:254-256), or the Keplerian
        power law Ω = √g0·r_sph^(−qgshear) for pointmasses runs (:264);
        spherical puts u_φ in component 3 (:294)
      * pressure-gradient correction (:1372-1444): the NUMERICAL radial
        lnρ gradient + analytic ∇ln cs², folded into Ω via
        correct_azimuthal_velocity (:1569-1611)
      * lenergy runs set ss (or lnTT) from the same cs² profile
        (set_thermodynamical_quantities :946-952)

    Returns "+uu" so the rotation ADDS to any noise init, like the
    reference cascade (initial_condition_uu after init_uu)."""
    import jax.numpy as jnp
    p = dict(params)
    q_T = float(p.get("temperature_power_law", 1.0))
    p_rho = float(p.get("density_power_law", 0.0))
    r_ref = float(p.get("r_ref", 1.0))
    rsmooth = float(p.get("rsmooth", 0.0))
    qgshear = float(p.get("qgshear", 1.5))
    g0_ic = float(p.get("g0", 1.0))
    grav = cfg.module("gravity")
    lgrav = grav is not None and bool(getattr(grav, "ipotential", ""))
    lpm = cfg.module("pointmasses") is not None
    coords = cfg.grid.coords
    spherical = coords == "spherical"
    cylindrical = coords == "cylindrical"
    ent_mod = cfg.module("entropy")
    tt_mod = cfg.module("temperature")
    lenergy = ent_mod is not None or tt_mod is not None
    llocal_iso = hasattr(eos, "glnTT_profile")
    cs20 = eos.cs20 if eos is not None else 1.0
    gamma = eos.gamma if eos is not None else 1.0
    lnrho0 = float(np.log(eos.rho0)) if eos is not None else 0.0
    lcyl_grav = bool(p.get("lcylindrical_gravity", False)) \
        or bool(getattr(grav, "lcylindrical_gravity", False))
    g = spec.nghost
    ones = jnp.ones(spec.shape, grid.z.dtype)
    xg1 = np.asarray(grid.x, np.float64)            # ghosted 1-D
    yg1 = np.asarray(grid.y, np.float64)
    zg1 = np.asarray(grid.z, np.float64)
    if not (spherical or cylindrical):
        # cartesian disk-in-a-box: analytic midplane correction (the
        # pre-round-5 path; cartesian samples don't exercise the
        # numerical-gradient machinery at census tolerance)
        rr_cyl = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2) + 0.0 * ones
        rr_sph = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2
                          + grid.zg ** 2) + 0.0 * ones
        if llocal_iso or lenergy:
            cs2 = cs20 * ((rr_cyl / r_ref) ** 2 + rsmooth ** 2) ** \
                (-0.5 * q_T)
            gslnTT = -q_T / ((rr_cyl / r_ref) ** 2 + rsmooth ** 2) \
                * rr_cyl / r_ref ** 2
        else:
            cs2 = cs20 * ones
            gslnTT = 0.0 * ones
        lnrho = (lnrho0 - 0.5 * p_rho
                 * jnp.log((rr_cyl / r_ref) ** 2 + rsmooth ** 2))
        if (not lcyl_grav) and spec.nz > 1:
            if lgrav:
                strat = -(grav.potential(rr_sph)
                          - grav.potential(rr_cyl)) / cs2
            else:
                strat = -(-g0_ic / rr_sph + g0_ic / rr_cyl) / cs2
            if lenergy:
                strat = gamma * strat
            lnrho = lnrho + strat
        if lgrav:
            gr = grav.g_r(rr_cyl)
            OO2 = jnp.maximum(-gr / rr_cyl, 0.0)
        else:
            OOk = np.sqrt(g0_ic) * ((rr_cyl / 1.0) ** 2
                                    + rsmooth ** 2) ** (-0.5 * qgshear)
            OO2 = OOk ** 2 * (rr_sph / rr_cyl if lcyl_grav else 1.0)
        gslnrho = -p_rho * (rr_cyl / r_ref ** 2) \
            / ((rr_cyl / r_ref) ** 2 + rsmooth ** 2)
        fpres_thermal = (gslnrho + gslnTT) * cs2 / gamma
        OO2 = jnp.maximum(OO2 + fpres_thermal / rr_cyl, 0.0)
        OO = jnp.sqrt(OO2)
        uu = jnp.stack([-grid.yg * OO + 0.0 * ones,
                        grid.xg * OO + 0.0 * ones, 0.0 * ones])
    else:
        # curvilinear: compute on the ghosted (x, transverse) plane in
        # numpy so the pressure correction can use the real 6th-order
        # radial gradient like the reference's grad(f,ilnrho) call
        if spherical:
            tr = yg1                      # θ (colatitude)
            rr_sph = xg1[:, None] + 0.0 * tr[None, :]
            rr_cyl = xg1[:, None] * np.sin(tr)[None, :]
            rr = rr_sph
            lzed = spec.ny > 1
        else:
            tr = zg1
            rr_cyl = xg1[:, None] + 0.0 * tr[None, :]
            rr_sph = np.sqrt(xg1[:, None] ** 2 + tr[None, :] ** 2)
            rr = rr_cyl
            lzed = spec.nz > 1
        if llocal_iso or lenergy:
            cs2p = cs20 * ((rr / r_ref) ** 2 + rsmooth ** 2) ** \
                (-0.5 * q_T)
            gslnTT = -q_T / ((rr / r_ref) ** 2 + rsmooth ** 2) \
                * rr / r_ref ** 2
        else:
            cs2p = cs20 + 0.0 * rr
            gslnTT = 0.0 * rr
        # midplane density
        if bool(p.get("lexponential_smooth", False)):
            rshift = float(p.get("rshift", 0.0))
            rmid = rshift + (spec.Lx / float(
                p.get("radial_percent_smooth", 10.0)))
            lnrho = lnrho0 + p_rho * np.log(
                (1.0 - np.exp(-((rr - rshift) / rmid) ** 2)) / rr)
        else:
            lnrho = lnrho0 - 0.5 * p_rho * np.log(
                (rr / r_ref) ** 2 + rsmooth ** 2)
        bump = str(p.get("ipressurebump", "nobump"))
        if bump == "gaussian":
            lnrho = lnrho + np.log(
                1.0 + float(p.get("bump_ampl", 0.4)) * np.exp(
                    -(rr_cyl - float(p.get("bump_radius", 1.0))) ** 2
                    / (2.0 * float(p.get("bump_width", 0.1)) ** 2)))
        elif bump == "step":
            lnrho = lnrho + np.log(
                1.0 + 0.5 * float(p.get("bump_ampl", 0.4)) * (np.tanh(
                    (rr_cyl - float(p.get("bump_radius", 1.0)))
                    / float(p.get("bump_width", 0.1))) + 1.0))
        # vertical stratification
        if (not lcyl_grav) and lzed:
            if spherical:
                # (centrifugal_balance.f90:583-598): log-cos latitude law
                if lgrav:
                    g_r = np.asarray(grav.g_r(rr_sph))
                else:
                    g_r = -g0_ic / rr_sph ** 2
                tmp2 = -g_r * rr_sph - cs2p * (p_rho + q_T) / gamma
                lat = np.pi / 2.0 - tr[None, :]
                strat = (tmp2 * gamma / cs2p) * np.log(np.cos(lat))
            else:
                if lgrav:
                    t1 = np.asarray(grav.potential(rr_sph))
                    t2 = np.asarray(grav.potential(rr_cyl))
                else:
                    t1 = -g0_ic / rr_sph
                    t2 = -g0_ic / rr_cyl
                strat = -(t1 - t2) / cs2p
                if lenergy:
                    strat = gamma * strat
            lnrho = lnrho + strat
        # rotation: Ω on the same ghosted plane
        if lgrav:
            rad = rr_sph if spherical else rr_cyl
            g_r = np.asarray(grav.g_r(rad))
            OO2p = np.maximum(-g_r / rad, 0.0)
        elif lpm:
            OOk = np.sqrt(g0_ic) * (rr_sph ** 2
                                    + rsmooth ** 2) ** (-0.5 * qgshear)
            if lcyl_grav and not spherical:
                OOk = OOk * np.sqrt(rr_sph / rr_cyl)
            OO2p = OOk ** 2
        else:
            OO2p = np.maximum(g0_ic / rr ** 3, 0.0)  # plain Keplerian
        # pressure-gradient correction with the NUMERICAL d(lnρ)/dr
        if bool(p.get("lcorrect_pressuregradient", True)):
            gslnrho = np.zeros_like(lnrho)
            gslnrho[g:-g] = _der_x6(lnrho, grid.dx_1, g)
            fpres = (gslnrho + gslnTT) * cs2p / gamma
            rr_corr = rr_sph if spherical else rr_cyl
            OO2p = np.maximum(OO2p + fpres / rr_corr, 0.0)
        OOp = np.sqrt(OO2p)
        # lift the ghosted plane back onto the interior 3-D grid
        def _lift(a):
            ai = a[g:a.shape[0] - g, g:a.shape[1] - g]
            if spherical:
                return jnp.asarray(ai, grid.z.dtype)[:, :, None] + 0.0 * ones
            return jnp.asarray(ai, grid.z.dtype)[:, None, :] + 0.0 * ones
        lnrho_f = _lift(lnrho)
        cs2 = _lift(cs2p)
        OO = _lift(OOp)
        zero = 0.0 * ones
        if spherical:
            uphi = OO * _lift(rr_sph)
            uu = jnp.stack([zero, zero, uphi])
        else:
            uphi = OO * _lift(rr_cyl)
            uu = jnp.stack([zero, uphi, zero])
        lnrho = lnrho_f
    out = {"+uu": uu}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = jnp.exp(lnrho) * ones
    else:
        out["lnrho"] = lnrho * ones
    # lenergy: bind the cs² profile into the evolved thermo variable
    # (set_thermodynamical_quantities, centrifugal_balance.f90:941-952)
    if lenergy and eos is not None:
        cp = getattr(eos, "cp", 1.0)
        if tt_mod is not None:
            lnTTf = jnp.log(cs2 / (cp * (gamma - 1.0))) * ones
            if getattr(tt_mod, "lnolog", False):
                out["TT"] = jnp.exp(lnTTf)
            else:
                out["lnTT"] = lnTTf
        else:
            out["ss"] = (cp / gamma) * (jnp.log(cs2 / cs20)
                                        - (gamma - 1.0)
                                        * (lnrho - lnrho0)) * ones
    if str(p.get("initcond_aa", "")) == "lambda_over_Lz_cte" \
            and cfg.module("magnetic") is not None:
        # radially-dependent vertical field Bz = B₀(r/r_ref)^(−pblaw),
        # B₀ = Lz/(zmode·2π), capped between rm_int/rm_ext by tanh steps,
        # then Aφ = (1/r)∫Bz·r dr via the reference's 7-point composite
        # rule (centrifugal_balance.f90:1164-1173 + set_field/cap_field/
        # integrate :1192-1290)
        zmode = float(p.get("zmode_mag", 1.0))
        pblaw = float(p.get("magnetic_power_law", 1.5 + 0.5 * p_rho))
        B0 = spec.Lz / (zmode * 2.0 * np.pi)
        g = spec.nghost
        xg1 = np.asarray(grid.x, np.float64)      # ghosted 1-D x
        dx = spec.dx
        Breal = B0 * (np.maximum(xg1, 1e-30) / r_ref) ** (-pblaw)
        rm_int = float(p.get("rm_int", -1e30))
        rm_ext = float(p.get("rm_ext", 1e30))
        w1 = float(p.get("widthbb1", 0.0)) or 5.0 * dx
        w2 = float(p.get("widthbb2", 0.0)) or 5.0 * dx

        def _step(xv, x0, w):
            return 0.5 * (1.0 + np.tanh((xv - x0) / w))

        bz = Breal * (_step(xg1, rm_int, w1) - _step(xg1, rm_ext, w2))
        bb = bz * xg1                              # integrand Bz·r
        acc = np.zeros(spec.nx + 1)
        for i in range(g, g + spec.nx):
            ig = i - g + 1
            acc[ig] = acc[ig - 1] + dx / 6.0 * (
                bb[i - 3] + bb[i + 3]
                + 4.0 * (bb[i - 2] + bb[i] + bb[i + 2])
                + 2.0 * (bb[i - 1] + bb[i + 1])) / 3.0
        aphi = acc[1:]
        xi = np.asarray(grid.interior(grid.x), np.float64)
        aa = jnp.zeros((3,) + spec.shape, grid.x.dtype)
        ay_prof = jnp.asarray(aphi / xi, grid.x.dtype)
        if cfg.grid.coords == "spherical":
            az = ay_prof[:, None, None] * jnp.sin(grid.yg) + 0.0 * ones
            aa = aa.at[2].set(az)
        else:
            aa = aa.at[1].set(ay_prof[:, None, None] + 0.0 * ones)
        out["+aa"] = aa
    elif str(p.get("initcond_aa", "")) == "Alfven-zconst" \
            and cfg.module("magnetic") is not None:
        # radially variable vertical field, 4 Balbus-Hawley wavelengths:
        # Aφ = A/(r(2−q))·(r²+r0²)^{1−q/2} (cartesian cylinder-in-box) /
        # Aφ = −A/(2−q+1+1)·r^{2−q}... (spherical branch)
        # (centrifugal_balance.f90:1015-1051)
        zmode = float(p.get("zmode_mag", 16.0))
        qg = float(p.get("qgshear", 1.5))
        r0p = float(getattr(grav, "r0_pot", 0.0)) if grav else 0.0
        aa = jnp.zeros((3,) + spec.shape, grid.x.dtype)
        if cfg.grid.coords == "spherical":
            amplbb = spec.Ly / (2.0 * zmode * jnp.pi)
            pblaw = 1.0 - qg
            rr = grid.xg + 0.0 * ones
            Aphi = -amplbb / (pblaw + 2.0) * rr ** (pblaw + 1.0)
            aa = aa.at[2].set(Aphi / jnp.sin(grid.yg))
        else:
            amplbb = spec.Lz / (2.0 * zmode * jnp.pi)
            rr = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2) + 0.0 * ones
            Aphi = amplbb / (rr * (2.0 - qg)) \
                * (rr ** 2 + r0p ** 2) ** (1.0 - qg / 2.0)
            aa = aa.at[0].set(-Aphi * grid.yg / rr)
            aa = aa.at[1].set(Aphi * grid.xg / rr)
        out["+aa"] = aa
    return out


@register_ic("baroclinic_init")
def ic_baroclinic_init(grid, spec, eos, cfg, params):
    """Finite-amplitude density perturbation for baroclinic-vortex runs
    (reference src/initial_condition/baroclinic_init.f90):

        ρ = 1 + A·Σ_modes sin(2π(l·x/Lx + m·y/Ly + n·z/Lz + φ_mode))·fac(x)

    with one random phase per (l, m, n) mode (l = −xmodes..xmodes,
    m = 0..ymodes, n = −zmodes..zmodes), a gaussian x-envelope of width
    d0 = 0.2·Lx, and A normalized so std(ρ) = rho_rms (:27-113).  The
    entropy starts isobaric: s = −cv·γ·lnρ (initial_condition_ss with
    T = ρ₀/ρ).  Phases are replayed from the min_std/nr_f90 stream via
    the 'phases' param (compat/rundir._parity_replay)."""
    import jax.numpy as jnp
    p = dict(params)
    xmodes = int(p.get("xmodes", 10))
    ymodes = int(p.get("ymodes", 10))
    zmodes = int(p.get("zmodes", 0))
    rho_rms = float(p.get("rho_rms", 0.05))
    xmid = float(p.get("xmid", 0.0))
    lgauss = bool(p.get("lgaussian_distributed_noise", True))
    phases = p.get("phases")
    if phases is None:
        # no replay stream available: deterministic fallback phases
        phases = tuple(
            (0.618034 * k) % 1.0
            for k in range((2 * xmodes + 1) * (ymodes + 1)
                           * (2 * zmodes + 1)))
    Lx, Ly, Lz = spec.Lx, spec.Ly, spec.Lz
    d0 = 0.2 * Lx
    x, y, z = grid.xg, grid.yg, grid.zg
    ones = jnp.ones(spec.shape, x.dtype)
    lump = jnp.zeros(spec.shape, x.dtype)
    k = 0
    two_pi = 2.0 * np.pi
    for ll in range(-xmodes, xmodes + 1):
        for mm in range(0, ymodes + 1):
            for nn in range(-zmodes, zmodes + 1):
                ph = float(phases[k])
                k += 1
                lump = lump + jnp.sin(two_pi * (
                    ll * x / Lx + mm * y / Ly
                    + (nn * z / Lz if Lz > 0 else 0.0) + ph)) * ones
    fac = jnp.exp(-(0.5 * (x - xmid) / d0) ** 2) * ones if lgauss else ones
    f = 1.0 + lump * fac
    std = jnp.sqrt(jnp.mean(f ** 2) - jnp.mean(f) ** 2)
    rho = 1.0 + rho_rms / std * (f - 1.0)
    # ADDITIVE in log space: the reference saves the pre-existing noise
    # and sets lnρ = noise + ln(ρ_lump) (baroclinic_init.f90:100,202) —
    # the model's "+lnrho" rule multiplies a nolog rho field accordingly
    out = {"+lnrho": jnp.log(rho)}
    if cfg.module("entropy") is not None and eos is not None:
        # isobaric start: s = −cv·γ·lnρ  (cv = cp/γ); the noise is NOT
        # in the entropy (initial_condition_ss uses the saved lump only)
        out["ss"] = -eos.cp * jnp.log(rho)
    return out


def _hyp2f1_ref(a, b, c, z, tol=1e-2):
    """Reference ``hypergeometric2F1`` series (sub.f90): accumulate terms
    while fac > tol — per-point termination, truncation included (the
    IC's tol=1e-2 makes this a 1-2 term series)."""
    fac = np.ones_like(z)
    out = np.ones_like(z)
    aa, bb, cc = a, b, c
    for n in range(1, 30):
        live = fac > tol
        if not live.any():
            break
        fac = np.where(live, fac * aa * bb * z / (cc * n), fac)
        out = np.where(live, out + fac, out)
        aa, bb, cc = aa + 1, bb + 1, cc + 1
    return out


@register_ic("dust-equilibrium")
def ic_dust_equilibrium(grid, spec, eos, cfg, params):
    """Vertical equilibrium of a photoelectric-heated gas+dust column
    (reference src/initial_condition/dust-equilibrium.f90): gas density
    from the analytic balance of linear gravity against the polytropic +
    photoelectric pressure (hypergeometric correction for the drag
    backreaction), a gaussian dust layer of scale height Hd, and the
    dust settling flow ud_z = −v_damp·z."""
    import jax.numpy as jnp
    p = dict(params)
    Hd = float(p.get("hd", p.get("Hd", 1.0)))
    eps = float(p.get("eps_dtog", 1.0))
    vdampl = float(p.get("vdampl_dust", 1.0))
    OOg = float(p.get("oog", p.get("OOg", 1.0)))
    input_fac = float(p.get("input_fac", 1.0))
    tau = float(p.get("tau", 1.0))
    ldrag_gas = bool(p.get("ldragforce_gas", True))
    cb20 = float(p.get("cb20", 0.0))
    cs20 = eos.cs20 if eos is not None else 1.0
    rho0 = eos.rho0 if eos is not None else 1.0
    a1, b1, c1 = cb20, cs20 * eps, Hd * Hd
    d1 = eps * vdampl / tau
    f1 = OOg * OOg
    chi = f1 * c1 / a1 if a1 != 0 else 0.0
    z = np.asarray(grid.z[3:-3] if grid.z.shape[0] > spec.nz
                   else grid.z, np.float64)
    if a1 != 0:
        expp = np.exp(z ** 2 / (2 * c1))
        expm = np.exp(-z ** 2 / (2 * c1))
        lntmp = z ** 2 / (2 * c1) - (1 + chi) * np.log(a1 * expp + b1)
        tmp1 = rho0 * np.exp(lntmp)
        if b1 != 0 and ldrag_gas:
            fac = (d1 * c1 / (b1 * (1 - chi))
                   * (b1 / a1 * expm + 1) ** (-chi)
                   / (a1 / b1 * expp + 1))
            tmp2 = input_fac * fac * _hyp2f1_ref(
                -chi, 1 - chi, 2 - chi, -b1 / a1 * expm)
        else:
            tmp2 = 0.0 * z
        lnrho_z = np.log(tmp1 + tmp2)
    else:
        lnrho_z = 0.0 * z
    ones = jnp.ones(spec.shape, grid.z.dtype)
    out = {}
    lnr = jnp.asarray(lnrho_z, grid.z.dtype)[None, None, :] * ones
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = jnp.exp(lnr)
    else:
        out["lnrho"] = lnr
    zg = grid.zg
    out["lnnd"] = (jnp.log(eps * rho0) - zg ** 2 / (2 * Hd * Hd)) * ones
    zero = jnp.zeros(spec.shape, grid.z.dtype)
    out["uud"] = jnp.stack([zero, zero, -vdampl * zg + zero])
    return out


@register_ic("viscous_ring")
def ic_viscous_ring(grid, spec, eos, cfg, params):
    """Spreading viscous ring (reference
    src/initial_condition/viscous_ring.f90): the Lynden-Bell & Pringle
    self-similar ring at t = time0,

      ρ = (2π√(π t₀) r_cyl^{3/4})⁻¹ · e^{−(r_cyl−1)²/t₀ − (z−1)²/σ_z}
      u_φ = r_cyl·√(1/r_cyl³ − 2cs₀²(r_cyl−1)/(r_cyl t₀))
      u_R = −3ν/(2 r_cyl) + 6ν(r_cyl−1)/t₀

    with the reference's spherical decomposition u_θ = u_R·cosθ/r
    (viscous_ring.f90:48, verbatim) and fixed time0=0.018, sigmaz=0.3."""
    import jax.numpy as jnp
    p = dict(params)
    nu = float(p.get("nu", 0.0))
    cs20 = float(p.get("cs20", 1.0))
    time0 = 0.018
    sigmaz = 0.3
    ones = jnp.ones(spec.shape, grid.z.dtype)
    if cfg.grid.coords == "spherical":
        rr_sph = grid.xg + 0.0 * ones
        sinth, costh = jnp.sin(grid.yg), jnp.cos(grid.yg)
        rr_cyl = rr_sph * sinth
        z_mn = rr_sph * costh
    else:
        rr_cyl = grid.xg + 0.0 * ones
        rr_sph = rr_cyl
        z_mn = grid.zg + 0.0 * ones
    pc = 2.0 * cs20 * (rr_cyl - 1.0) / (rr_cyl * time0)
    omega = jnp.sqrt(jnp.maximum(1.0 / rr_cyl ** 3 - pc, 0.0))
    uphi = rr_cyl * omega
    urad = -1.5 * nu / rr_cyl + 6.0 * nu * (rr_cyl - 1.0) / time0
    zero = 0.0 * ones
    if cfg.grid.coords == "spherical":
        uu = jnp.stack([urad * sinth + zero,
                        urad / rr_sph * costh + zero, uphi])
    else:
        uu = jnp.stack([urad + zero, uphi, zero])
    import math
    tmp = 1.0 / (2.0 * math.pi * math.sqrt(math.pi * time0)
                 * rr_cyl ** 0.75)
    lnrho = (jnp.log(tmp) - (rr_cyl - 1.0) ** 2 / time0
             - (z_mn - 1.0) ** 2 / sigmaz)
    out = {"+uu": uu}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = jnp.exp(lnrho) * ones
    else:
        out["lnrho"] = lnrho * ones
    return out


@register_ic("alfven_wave")
def ic_alfven_wave(grid, spec, eos, cfg, params):
    """Circularly-polarized Alfvén wave (reference
    src/initial_condition/alfven_wave.f90): u_i = amp0_i·sin(k·x+φ₀); for
    the bfield slot B_i = √(µ0ρ0)·amp0_i·sin(k·x+φ₀), otherwise
    A_x = −(c/k_z)amp0_y·cos(k·x+φ₀), A_y = +(c/k_z)amp0_x·cos(k·x+φ₀)."""
    import jax.numpy as jnp
    p = dict(params)
    amp = [float(v) for v in (p.get("init_amp0") or [0.0, 0.0, 0.0])]
    k0 = [float(v) for v in (p.get("init_k0") or [0.0, 0.0, 1.0])]
    phase = float(p.get("init_phase0", 0.0))
    ones = jnp.ones(spec.shape, grid.z.dtype)
    arg = (k0[0] * grid.xg + k0[1] * grid.yg + k0[2] * grid.zg
           + phase) + 0.0 * ones
    sin = jnp.sin(arg)
    uu = jnp.stack([amp[0] * sin, amp[1] * sin, amp[2] * sin])
    out = {"+uu": uu}
    rho0 = eos.rho0 if eos is not None else 1.0
    c = rho0 ** 0.5     # √(µ0 ρ0), µ0 = 1 code units
    bf = cfg.module("bfield")
    if bf is not None:
        out["+bb"] = c * uu
    elif cfg.module("magnetic") is not None:
        cos = jnp.cos(arg)
        ck = c / k0[2]
        zero = 0.0 * ones
        out["+aa"] = jnp.stack([-ck * amp[1] * cos, ck * amp[0] * cos,
                                zero])
    return out


def _ism_ss(lnrho, lnTT, eos):
    """eoscalc(ilnrho_lnTT → ss): invert lnTT = lnTT0 + (γ/cp)ss +
    (γ−1)(lnρ−lnρ0)."""
    import jax.numpy as jnp
    g = eos.gamma
    return (eos.cp / g) * (lnTT - eos.lnTT0
                           - (g - 1.0) * (lnrho - eos.lnrho0))


@register_ic("ths1D_equilibrium_ism")
def ic_ths1d_equilibrium_ism(grid, spec, eos, cfg, params):
    """1-D thermo-hydrostatic ISM start (reference
    src/initial_condition/ths1D_equilibrium_ism.f90): a 5-component
    vertical density stack (2 gaussian + 3 exponential scale heights
    from Dickey & Lockman) at uniform T_init, entropy from
    eoscalc(ilnrho_lnTT)."""
    import jax.numpy as jnp
    p = dict(params)
    ud = float(p.get("unit_density", 1.0))
    ul = float(p.get("unit_length", 1.0))
    ut = float(p.get("unit_temperature", 1.0))
    rhox = float(p.get("rhox", 1.0))
    He = float(p.get("he_factor", 1.101))
    T_init = float(p.get("t_init", 0.0)) or 1e3 / ut
    m_u = 1.66053907e-24
    nfrac = (0.399, 0.1083, 0.0627, 0.015, 0.025)
    hscale = tuple(h / ul for h in
                   (3.9188e20, 9.8125e20, 1.2435e21, 2.1600e20, 2.7771e21))
    frac = [rhox * He * n * m_u / ud for n in nfrac]
    z = grid.zg
    rho = (frac[0] * jnp.exp(-(z / hscale[0]) ** 2)
           + frac[1] * jnp.exp(-(z / hscale[1]) ** 2)
           + frac[2] * jnp.exp(-jnp.abs(z) / hscale[2])
           + frac[3] * jnp.exp(-jnp.abs(z) / hscale[3])
           + frac[4] * jnp.exp(-jnp.abs(z) / hscale[4]))
    lnrho = jnp.log(rho)
    lnTT = jnp.log(T_init) + 0.0 * lnrho
    ones = jnp.ones(spec.shape, grid.z.dtype)
    out = {}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = rho * ones
    else:
        out["lnrho"] = lnrho * ones
    if cfg.module("entropy") is not None:
        out["ss"] = _ism_ss(lnrho, lnTT, eos) * ones
    return out


@register_ic("ths_equilibrium_ism")
def ic_ths_equilibrium_ism(grid, spec, eos, cfg, params):
    """3-D ISM equilibrium start (reference ths_equilibrium_ism.f90):
    reads the precomputed (ρ_cgs, T_cgs) column from the run dir's
    init_ism.in (one row per global z point) and sets lnρ and ss."""
    import numpy as np
    import jax.numpy as jnp
    p = dict(params)
    rows = np.asarray(p.get("_init_ism_rows") or [], dtype=np.float64)
    if rows.size == 0:
        raise ValueError("ths_equilibrium_ism needs init_ism.in")
    ud = float(p.get("unit_density", 1.0))
    ut = float(p.get("unit_temperature", 1.0))
    nz = spec.nz
    rho_z = rows[:nz, 0] / ud
    TT_z = rows[:nz, 1] / ut
    lnrho = jnp.asarray(np.log(rho_z), grid.z.dtype)[None, None, :]
    lnTT = jnp.asarray(np.log(TT_z), grid.z.dtype)[None, None, :]
    ones = jnp.ones(spec.shape, grid.z.dtype)
    out = {}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = jnp.exp(lnrho) * ones
    else:
        out["lnrho"] = lnrho * ones
    if cfg.module("entropy") is not None:
        out["ss"] = _ism_ss(lnrho, lnTT, eos) * ones
    return out

@register_ic("fieldloop")
def ic_fieldloop(grid, spec, eos, cfg, params):
    """Advected field loop (reference initial_condition/fieldloop.f90):
    A_z = max(amplaa·(0.3 − dist), 0) with dist the distance to the loop
    center (offset 1.5 in azimuth off-cartesian)."""
    a = float(params.get("amplaa", 1e-3))
    x, y, z = grid.xg, grid.yg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    coords = getattr(spec, "coords", "cartesian")
    if coords == "cylindrical":
        dist = jnp.sqrt(x ** 2 + 1.5 ** 2 - 2.0 * x * 1.5 * jnp.cos(y))
    elif coords == "spherical":
        rr = x * jnp.sin(y)
        dist = jnp.sqrt(rr ** 2 + 1.5 ** 2 - 2.0 * rr * 1.5 * jnp.cos(z))
    else:
        dist = jnp.sqrt(x ** 2 + y ** 2)
    az = jnp.maximum(a * (0.3 - dist), 0.0) + 0.0 * ones
    zero = jnp.zeros_like(az)
    return {"+aa": jnp.stack([zero, zero, az])}


@register_ic("init_delta")
def ic_init_delta(grid, spec, eos, cfg, params):
    """Delta spike on A (samples/implicit_resistivity/src/init_delta.f90):
    A_i = dx_1(i)·dy_1(j)·dz_1(k) where |x_i|·dx_1(i) < 1 etc. — the
    POSITION-DEPENDENT inverse mesh spacings (the sample runs on a
    sinh-stretched grid, so dx_1 at the origin ≫ nx/Lx)."""
    x, y, z = grid.xg, grid.yg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    dx1 = grid.interior(grid.dx_1)[:, None, None]
    dy1 = grid.interior(grid.dy_1)[None, :, None]
    dz1 = grid.interior(grid.dz_1)[None, None, :]
    mask = ((jnp.abs(x) * dx1 < 1.0) & (jnp.abs(y) * dy1 < 1.0)
            & (jnp.abs(z) * dz1 < 1.0)) & (ones > 0)
    a = jnp.where(mask, dx1 * dy1 * dz1 + 0.0 * ones, 0.0)
    return {"+aa": jnp.stack([a, a, a])}


@register_ic("fluxring_cylindrical")
def ic_fluxring_cylindrical(grid, spec, eos, cfg, params):
    """Cylindrical flux ring in pressure equilibrium (reference
    initial_condition/fluxring_cylindrical.f90): A_z from the erf
    integral of the gaussian B_φ ring at s0, A_y = ½B_z·x, lnρ correction
    ε·ln(p/cs₀²)."""
    from jax.scipy.special import erf
    import math as _m
    b0 = float(params.get("b0", 0.0))
    b1 = float(params.get("b1", 0.0))
    b2 = float(params.get("b2", 0.0))
    s0 = float(params.get("s0", 2.0))
    w = float(params.get("width", 0.5))
    p0 = float(params.get("p0", 1.0))
    eps = float(params.get("eps", 0.0))
    bz = float(params.get("bz", 0.0))
    ampl_diffrot = float(params.get("ampl_diffrot", 0.0))
    om_exp = float(params.get("omega_exponent", 0.0))
    x = grid.xg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    sqrtpi, sqrt2 = _m.sqrt(_m.pi), _m.sqrt(2.0)
    arg = (x - s0) / w
    az = (-(0.5 * b0 / s0) * w * (s0 * sqrtpi * erf(arg)
                                  - w * jnp.exp(-arg ** 2))
          - b1 * x - b2 * jnp.log(jnp.maximum(x, 1e-30)))
    ay = 0.5 * bz * x
    out = {"+aa": jnp.stack([0.0 * ones, ay + 0.0 * ones,
                             az + 0.0 * ones])}
    if eps != 0.0:
        arg2 = sqrt2 * arg
        term1 = s0 * w * sqrtpi * sqrt2 * erf(arg2)
        term2 = (2.0 * x ** 2 - w ** 2) * jnp.exp(-arg2 ** 2)
        press = p0 - (0.5 * b0 / s0) ** 2 * (term1 + term2)
        out["+lnrho"] = eps * jnp.log(
            jnp.maximum(press / eos.cs20, 1e-30)) + 0.0 * ones
    if ampl_diffrot != 0.0:
        uy = x * ampl_diffrot * x ** om_exp + 0.0 * ones
        out["+uu"] = jnp.stack([0.0 * ones, uy, 0.0 * ones])
    return out

@register_ic("spherical_convection")
def ic_spherical_convection(grid, spec, eos, cfg, params):
    """Spherical-wedge star-in-a-wedge stratification (reference
    initial_condition/spherical_convection.f90, non-corona branch):
    T(r) = g_x/(cv(γ−1))·(ξ0/Rstar + (1/(npoly1+1))(1/r − 1/Rsurf)),
    ρ = ρ0(T/T00)^{1/(γ−1)}, ss = ln(cs²/cs₀²)/γ − (γ−1)/γ·lnρ/ρ0."""
    gamma = eos.gamma
    cv = eos.cp / gamma
    grav = cfg.module("gravity") if cfg else None
    gravx = float(params.get("gravx", getattr(grav, "gravx", 1.0)
                             if grav else 1.0))
    Rstar = float(params.get("rstar", params.get("Rstar", 1.0)))
    npoly1 = float(params.get("npoly1", 1.5))
    xi0 = float(params.get("xi0", 0.012))
    Rsurf = spec.x0 + spec.Lx
    r = grid.xg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    TT = gravx / (cv * (gamma - 1.0)) * (
        xi0 / Rstar + (1.0 / (npoly1 + 1.0)) * (1.0 / r - 1.0 / Rsurf))
    T00 = gravx / (cv * (gamma - 1.0)) * (
        xi0 / Rstar + (1.0 / (npoly1 + 1.0)) * (1.0 / spec.x0
                                                - 1.0 / Rsurf))
    lnrho = (1.0 / (gamma - 1.0)) * jnp.log(jnp.maximum(TT / T00, 1e-30))
    cs2 = eos.cs20 * TT * cv * gamma * (gamma - 1.0)
    ss = (jnp.log(jnp.maximum(cs2 / eos.cs20, 1e-30)) / gamma
          - (gamma - 1.0) / gamma * lnrho)
    return {"+lnrho": lnrho + 0.0 * ones, "+ss": ss + 0.0 * ones}


@register_ic("mhs_equilibrium")
def ic_mhs_equilibrium(grid, spec, eos, cfg, params, key=None):
    """Magnetohydrostatic global-disk equilibrium in SPHERICAL coordinates
    (reference initial_condition/mhs_equilibrium.f90): midplane power-law
    density p, temperature power-law q via cs² = cs₀²(R/r_ref)^{-q},
    vertical stratification −γ(Φ(r)−Φ(R))/(cs²ξ) with the magnetic
    pressure factor ξ = (1+β)/β (:76), sub-Keplerian rotation
    u_φ = R·√(Ω_K²(1 + H²/R²(ξ(p+q−2)+2) + q(1−sinθ))) (:160-171), a
    constant-plasma-β azimuthal seed field A_θ = (1/r)∫B_φ r dr with
    radial step-function capping (:308-455, :558-586), and optional
    cs-proportional velocity noise (:670-674)."""
    gamma = eos.gamma
    p = -float(params.get("density_power_law", 1.5))
    q = -float(params.get("temperature_power_law", 1.0))
    r_ref = float(params.get("r_ref", 1.0))
    beta = float(params.get("plasma_beta", 25.0))
    lmag = cfg is not None and cfg.module("magnetic") is not None
    ksi = (1.0 + beta) / beta if lmag else 1.0
    x, th = grid.xg, grid.yg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    sinth = jnp.sin(th)
    rr_sph = x + 0.0 * ones
    rr_cyl = x * jnp.maximum(sinth, 1e-9) + 0.0 * ones
    cs2 = eos.cs20 * (rr_cyl / r_ref) ** q
    grav = cfg.module("gravity") if cfg else None
    pm = cfg.module("pointmasses") if cfg else None
    if grav is not None and grav.g0 != 0.0:
        g_r = grav.g_r(rr_sph)
        pot_sph = grav.potential(rr_sph)
        pot_cyl = grav.potential(rr_cyl)
    else:
        g0 = float(pm.GNewton * pm.masses().sum()) if pm is not None else 1.0
        g_r = -g0 / rr_sph ** 2
        pot_sph = -g0 / rr_sph
        pot_cyl = -g0 / rr_cyl
    lnrho = (p * jnp.log(rr_cyl / r_ref)
             - gamma * (pot_sph - pot_cyl) / (cs2 * ksi))
    OOK2 = jnp.maximum(-g_r / (rr_sph * jnp.maximum(sinth, 1e-9) ** 3),
                       0.0)
    H2 = cs2 / (gamma * jnp.maximum(OOK2, 1e-30))
    OO2 = OOK2 * (1.0 + H2 / rr_cyl ** 2 * (ksi * (p + q - 2.0) + 2.0)
                  + q * (1.0 - sinth))
    uphi = rr_cyl * jnp.sqrt(jnp.maximum(OO2, 0.0))
    zero = jnp.zeros_like(uphi + ones)
    uu = jnp.stack([zero, zero, uphi + 0.0 * ones])
    if bool(params.get("ladd_noise_propto_cs", False)) and key is not None:
        fac = float(params.get("ampluu_cs_factor", 0.01))
        uu = uu + fac * jnp.sqrt(cs2) * jax.random.normal(
            key, (3,) + spec.shape, grid.x.dtype)
    out = {"+lnrho": lnrho + 0.0 * ones, "+uu": uu}
    if cfg is not None and cfg.module("entropy") is not None:
        # entropy runs carry the cs²(R) power-law profile through ss
        # (mhs_equilibrium.f90:588-625 initial_condition_ss:
        # ss = (1/(γ·cp1))·(ln(cs²/cs₀²) − (γ−1)(lnρ−lnρ₀)))
        gamma = eos.gamma
        ss = (eos.cp / gamma) * (jnp.log(cs2 / eos.cs20)
                                 - (gamma - 1.0) * (lnrho - eos.lnrho0))
        out["ss"] = ss + 0.0 * ones
    if lmag and bool(params.get("ladd_field", True)):
        # azimuthal constant-β field: B_φ = √(2ρcs²/β) capped radially by
        # step functions of width 5Δx, then A_θ(r) = (1/r)∫₀^r B_φ r' dr'
        # accumulated from the inner ghost point exactly like the
        # reference's serial x-scan (:434-452)
        rho = jnp.exp(lnrho)
        BB = jnp.sqrt(2.0 * rho * cs2 / beta)
        ng = spec.nghost
        x1d = grid.x[ng:-ng]                       # interior r coords
        dx1d = grid.x[ng:-ng] - grid.x[ng - 1:-ng - 1]
        if bool(params.get("lcap_field_radius", False)):
            rm_int = float(params.get("rm_int", 0.0))
            rm_ext = float(params.get("rm_ext", 1e30))
            # width = 5/dx_1 — the ANALYTIC local spacing (:570), not a
            # one-sided difference
            w = 5.0 / grid.dx_1[ng:-ng][:, None, None]
            xc = x1d[:, None, None]
            BB = BB * (0.5 * (1.0 + jnp.tanh((xc - rm_int) / w))
                       - 0.5 * (1.0 + jnp.tanh((xc - rm_ext) / w)))
        if bool(params.get("lcap_field_theta", False)):
            tm_bot = float(params.get("tm_bot", 0.0))
            tm_top = float(params.get("tm_top", 1e30))
            wy = spec.Ly / max(spec.ny, 1)
            BB = BB * (0.5 * (1.0 + jnp.tanh((th - tm_bot) / wy))
                       - 0.5 * (1.0 + jnp.tanh((th - tm_top) / wy)))
        integrand = BB * x1d[:, None, None] * dx1d[:, None, None]
        Atheta = jnp.cumsum(integrand, axis=0) / x1d[:, None, None]
        aa = jnp.stack([zero, Atheta + 0.0 * ones, zero])
        out["+aa"] = aa
    return out

def strat_mlt(rhotop, flux, nzgrid, dz, ztop, z1, z2, cs20, gamma,
              mpoly0, mpoly1, alpha_mlt, gravz=-1.0):
    """One downward MLT integration (entropy.f90:7680-7770 strat_MLT):
    temp/lnrho marched top→bottom with the zone-dependent gradient
    del; returns (lnrhom, tempm) top-first and rho at z=z1."""
    g1 = gamma - 1.0
    lnrhom = np.empty(nzgrid)
    tempm = np.empty(nzgrid)
    lnrhom[0] = np.log(rhotop)
    tempm[0] = cs20 / g1
    polyad = 1.0 / g1
    delad = 1.0 - 1.0 / gamma
    fr_frac = delad * (mpoly0 + 1.0)
    fc = (1.0 - fr_frac) * flux
    zz = ztop
    lnrhobot = lnrhom[0]
    prev_z = zz
    for iz in range(1, nzgrid):
        zm = ztop - iz * dz
        if zm < z1:
            delta = 1.0 / (mpoly1 + 1.0)
        elif zm <= z2:
            delta = delad + alpha_mlt * (fc / (
                np.exp(lnrhom[iz - 1])
                * (g1 * tempm[iz - 1]) ** 1.5)) ** (2.0 / 3.0)
        else:
            delta = 0.0
        dtemp = gamma * polyad * gravz * delta
        dlnrho = gamma * polyad * gravz * (1.0 - delta) / tempm[iz - 1]
        tempm[iz] = tempm[iz - 1] - dtemp * dz
        lnrhom[iz] = lnrhom[iz - 1] - dlnrho * dz
        # linear interpolation of lnrho at z=z1 (descending grid)
        if prev_z >= z1 > zm:
            w = (prev_z - z1) / dz
            lnrhobot = (1 - w) * lnrhom[iz - 1] + w * lnrhom[iz]
        prev_z = zm
    return lnrhom, tempm, float(np.exp(lnrhobot))


def mlt_iterate(flux, nzgrid, dz, ztop, z1, z2, cs20, gamma, rho0,
                mpoly0, mpoly1, alpha_mlt, gravz=-1.0):
    """Secant iteration on rhotop until rho(z1)=rho0
    (entropy.f90:2107-2190 mixinglength)."""
    args = (flux, nzgrid, dz, ztop, z1, z2, cs20, gamma, mpoly0, mpoly1,
            alpha_mlt, gravz)
    rt_old, rt_new = 0.1 * rho0, 0.12 * rho0
    _, _, rb_old = strat_mlt(rt_old, *args)
    lnr, tm, rb_new = strat_mlt(rt_new, *args)
    rhotop = rt_new
    for _ in range(10):
        rhotop = rt_old + (rt_new - rt_old) / (rb_new - rb_old) \
            * (rho0 - rb_old)
        if abs(rhotop / rt_new - 1.0) <= 1e-4:
            break
        lnr, tm, rhobot = strat_mlt(rhotop, *args)
        rt_old, rb_old, rt_new, rb_new = rt_new, rb_new, rhotop, rhobot
    lnr, tm, _ = strat_mlt(rhotop, *args)
    return rhotop, lnr, tm


@register_ic("mlt_profile")
def ic_mlt_profile(grid, spec, eos, cfg, params):
    """Mixing-length stratification profile (entropy.f90:2108
    'mixinglength'): the 1-D (lnrho, T) columns from mlt_iterate are
    spread over the box; ss from the eos inversion with the REDEFINED
    rho0=rhotop (handled by the run-dir loader)."""
    lnrhom = np.asarray(params["lnrhom"])      # top-first
    tempm = np.asarray(params["tempm"])
    nzgrid = len(lnrhom)
    # grid z index n=1..nz maps to profile entry nzgrid−iz (0-based flip)
    idx = nzgrid - 1 - np.arange(spec.nz)
    lnrho = lnrhom[idx]
    lnTT = np.log(tempm[idx])
    ones = jnp.ones(spec.shape, grid.x.dtype)
    gamma = eos.gamma
    ss = (eos.cp / gamma) * (lnTT - eos.lnTT0
                             - (gamma - 1.0) * (lnrho - eos.lnrho0))
    return {"+lnrho": jnp.asarray(lnrho)[None, None, :] + 0 * ones,
            "+ss": jnp.asarray(ss)[None, None, :] + 0 * ones}


@register_ic("ice_shell")
def ic_ice_shell(grid, spec, eos, cfg, params):
    """Ice-shell Stokes convection temperature seed (reference
    src/initial_condition/ice_shell.f90:120-186): a single (kx, kz) mode
    on TT plus, unless lsplit_temperature, the conductive Tbot→Tupp
    linear gradient (the split base state lives in the streamfunction
    special instead)."""
    Tupp = float(params.get("tupp", params.get("Tupp", 0.0)))
    Tbot = float(params.get("tbot", params.get("Tbot", 1.0)))
    ampl = float(params.get("ampltt", 0.0))
    kx = float(params.get("kx_tt", 1.0))
    kz = float(params.get("kz_tt", params.get("kz_TT", 1.0)))
    mode = str(params.get("inittt", params.get("initTT", "single-mode")))
    lsplit = bool(params.get("lsplit_temperature", False))
    x, z = grid.xg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    if mode == "single-mode":
        TT = ampl * jnp.cos(kx * x / spec.Lx) * jnp.sin(kz * z / spec.Lz)
    elif mode == "single-mode-periodic":
        TT = ampl * jnp.sin(kx * x / spec.Lx) * jnp.sin(kz * z / spec.Lz)
    else:
        TT = 0.0 * x
    if not lsplit:
        nn1 = jnp.arange(spec.nz, dtype=grid.x.dtype)[None, None, :]
        TT = TT + Tbot + nn1 * ((Tupp - Tbot) / max(spec.nz - 1, 1))
    return {"+TT": TT * ones}


def nsh_multispecies(taus, eps, eta_vK):
    """Multi-species NSH drag equilibrium (particles_sub.f90:1390
    dragforce_equi_multispecies; Bai & Stone 2010 App. A): solve the
    2n×2n linear system for (vpx_j, vpy_j), gas from momentum
    conservation."""
    taus = np.asarray(taus, np.float64)
    eps = np.asarray(eps, np.float64)
    n = len(taus)
    Lam = np.diag(taus)
    OPE = np.tile(eps, (n, 1)) + np.eye(n)
    M = np.block([[OPE, -2.0 * Lam], [0.5 * Lam, OPE]])
    B = np.concatenate([np.zeros(n), -eta_vK * np.ones(n)])
    sol = np.linalg.solve(M, B)
    vpx, vpy = sol[:n], sol[n:]
    ux = -float(eps @ vpx)
    uy = -float(eps @ vpy) - eta_vK
    return vpx, vpy, ux, uy


@register_ic("streaming_instability")
def ic_streaming_instability(grid, spec, eos, cfg, params):
    """Gas side of the multi-species streaming-instability exact wave
    mode (initial_condition/streaming_instability.f90:166-247): NSH
    equilibrium background (ux0, uy0) + eigenmode perturbations from
    si_ev(1:3) and the density mode from si_ev(4)."""
    taus = tuple(float(v) for v in params.get("taus", ()))
    eps = tuple(float(v) for v in params.get("eps", ()))
    dlnr = float(params.get("dlnrhodlnr", 0.0))
    kx = float(params.get("si_kx", 0.0))
    kz = float(params.get("si_kz", 0.0))
    si_amp = float(params.get("si_amp", 1e-6))
    ev = np.asarray(params.get("si_ev", ()), np.float64).reshape(-1, 2)
    evc = ev[:, 0] + 1j * ev[:, 1]
    eta_vK = -0.5 * dlnr * eos.cs0
    vpx, vpy, ux0, uy0 = nsh_multispecies(taus, eps, eta_vK)
    amp_scale = si_amp * np.sum(eps) / np.abs(evc[7::4]).sum()
    x, z = grid.xg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    ck, sk = jnp.cos(kx * x), jnp.sin(kx * x)
    cz, sz = jnp.cos(kz * z), jnp.sin(kz * z)
    du = amp_scale * eta_vK
    ux = ux0 + du * (evc[0].real * ck - evc[0].imag * sk) * cz
    uy = uy0 + du * (evc[1].real * ck - evc[1].imag * sk) * cz
    uz = -du * (evc[2].real * sk + evc[2].imag * ck) * sz
    drho = amp_scale * eos.rho0 * (evc[3].real * ck
                                   - evc[3].imag * sk) * cz
    lnrho = jnp.log(eos.rho0 + drho)
    return {"+uu": jnp.stack([ux * ones, uy * ones, uz * ones]),
            "+lnrho": lnrho * ones}


@register_ic("streaming_coldstart_gas")
def ic_streaming_coldstart_gas(grid, spec, eos, cfg, params):
    """Gas side of the streaming-instability eigenmode + NSH drag
    equilibrium (particles_dust.f90:2580-2606 streaming_coldstart fluid
    fields; particles_drag.f90:152-160 global equilibrium): additive
    δu from coeff(4:6), δlnρ from coeff(7), background (ux0, uy0)."""
    c = tuple(float(v) for v in params.get("coeff", ()))
    A = float(params.get("amplxxp", 0.0))
    kx = float(params.get("kx_xxp", 0.0))
    kz = float(params.get("kz_xxp", 0.0))
    eta_vK = float(params.get("eta_vk", 0.0))
    ux0 = float(params.get("ux0", 0.0))
    uy0 = float(params.get("uy0", 0.0))
    x, z = grid.xg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    cx, sx = jnp.cos(kx * x), jnp.sin(kx * x)
    cz, sz = jnp.cos(kz * z), jnp.sin(kz * z)
    du = eta_vK * A
    ux = ux0 + du * (c[6] * cx - c[7] * sx) * cz
    uy = uy0 + du * (c[8] * cx - c[9] * sx) * cz
    uz = -du * (c[11] * cx + c[10] * sx) * sz
    lnrho = A * (c[12] * cx - c[13] * sx) * cz
    return {"+uu": jnp.stack([ux * ones, uy * ones, uz * ones]),
            "+lnrho": lnrho * ones}


@register_ic("fluxrings")
def ic_fluxrings(grid, spec, eos, cfg, params):
    """Interlocked magnetic flux rings (reference
    src/initial_condition/fluxrings.f90:205-391 + manual §C.3):
    each ring is the canonical x-y-plane ring A₀ rotated by the axis
    direction and translated: A(x) = D·A₀(D⁻¹(x − disp)).  Profiles:
    'tanh' (default), 'gaussian', 'const'."""
    import math as _m
    from jax.scipy.special import erf
    x, y, z = grid.xg, grid.yg, grid.zg
    dtype = grid.x.dtype
    ones = jnp.ones(spec.shape, dtype)
    ampl = float(params.get("amplaa", 1.0))
    prof = str(params.get("fring_profile", "tanh"))
    aa = jnp.zeros((3,) + spec.shape, dtype)
    epsi = 1e-30
    for i in ("1", "2", "3"):
        fring = float(params.get(f"fring{i}", 0.0))
        Iring = float(params.get(f"iring{i}", params.get(f"Iring{i}", 0.0)))
        if fring == 0.0 and Iring == 0.0:
            continue
        R0 = float(params.get(f"rring{i}", params.get(f"Rring{i}", 1.0)))
        w = float(params.get(f"wr{i}", 0.3))
        axis = [float(v) for v in params.get(f"axisr{i}", [0, 0, 1])]
        disp = [float(v) for v in params.get(f"dispr{i}", [0, 0, 0])]
        phi0 = _m.atan2(axis[1], axis[0] + epsi)
        th0 = _m.atan2(_m.sqrt(axis[0] ** 2 + axis[1] ** 2) + epsi,
                       axis[2])
        ct, st = _m.cos(th0), _m.sin(th0)
        cp, sp = _m.cos(phi0), _m.sin(phi0)
        dx_, dy_, dz_ = x - disp[0], y - disp[1], z - disp[2]
        xx1 = ct * cp * dx_ + ct * sp * dy_ - st * dz_
        yy1 = -sp * dx_ + cp * dy_
        zz1 = st * cp * dx_ + st * sp * dy_ + ct * dz_
        rr = jnp.sqrt(xx1 ** 2 + yy1 ** 2) - R0
        if prof == "gaussian":
            az = (-fring * 0.5 * (1.0 + erf(rr / (_m.sqrt(2.0) * w)))
                  * jnp.exp(-0.5 * (zz1 / w) ** 2)
                  / (_m.sqrt(2.0 * _m.pi) * w))
        elif prof == "const":
            az = (-fring * 0.5 * (1.0 + jnp.clip(rr / w, -1.0, 1.0))
                  * 0.25 / w * (1.0 - jnp.sign(jnp.abs(zz1) - w)))
        else:                                       # 'tanh'
            az = (-fring * 0.5 * (1.0 + jnp.tanh(rr / w))
                  * 0.5 / w / jnp.cosh(zz1 / w) ** 2)
        tmp = Iring * 0.5 * (1.0 + jnp.tanh(
            (w - jnp.sqrt(rr ** 2 + zz1 ** 2)) / w))
        ph = jnp.arctan2(yy1, xx1)
        ax_, ay_ = -tmp * jnp.sin(ph), tmp * jnp.cos(ph)
        aa = aa + ampl * jnp.stack([
            (ct * cp * ax_ - sp * ay_ + st * cp * az) * ones,
            (ct * sp * ax_ + cp * ay_ + st * sp * az) * ones,
            (-st * ax_ + ct * az) * ones])
    return {"+aa": aa}


@register_ic("isentropic_star")
def ic_isentropic_star(grid, spec, eos, cfg, params):
    """Isentropic hydrostatic sphere with isothermal atmosphere
    (reference density.f90:1250-1312 + entropy.f90:1580-1625
    'isentropic-star'): inside r_ext ss=0 and
    lnρ = lnρ0 + ln(1−(γ−1)(Φ−Φ0)/cs20)/(γ−1); outside isothermal at
    cs2cool with a pressure-continuous entropy jump."""
    import math as _m
    grav = cfg.module("gravity") if cfg else None
    if grav is None:
        raise ValueError("isentropic-star needs a gravity module")
    gamma = eos.gamma
    g1 = gamma - 1.0
    cs20 = eos.cs20
    r_ext = float(params.get("r_ext", 1.0))
    cs2cool = float(params.get("cs2cool", 0.0))
    x, y, z = grid.xg, grid.yg, grid.zg
    r = jnp.sqrt(x * x + y * y + z * z)
    pot = grav.potential(r)
    pot0 = grav.pot0
    pot_ext = float(grav.potential(jnp.asarray(r_ext)))
    ones = jnp.ones(spec.shape, grid.x.dtype)
    if gamma == 1.0:
        lnrho = eos.lnrho0 - (pot - pot0) / cs20
        return {"lnrho": lnrho + 0.0 * ones}
    tmp1_ext = 1.0 - g1 * (pot_ext - pot0) / cs20
    lnrho_ext = eos.lnrho0 + _m.log(tmp1_ext) / g1
    cs2_ext = cs20 * tmp1_ext
    if cs2cool != 0.0:
        lnrho_ext -= _m.log(cs2cool / cs2_ext)
    else:
        cs2cool = cs2_ext
    inside = pot <= pot_ext
    lnrho = jnp.where(
        inside,
        eos.lnrho0 + jnp.log(jnp.maximum(
            1.0 - g1 * (pot - pot0) / cs20, 1e-20)) / g1,
        lnrho_ext - gamma * (pot - pot_ext) / cs2cool)
    out = {"lnrho": lnrho + 0.0 * ones}
    if cfg.module("entropy") is not None:
        ss_ext = _m.log(cs2cool / cs2_ext)
        ss = jnp.where(inside, 0.0,
                       ss_ext + g1 * (pot - pot_ext) / cs2cool)
        out["ss"] = ss + 0.0 * ones
    return out


def _ferriere_uniform_by(ampl, rho, grid, spec):
    """A_x = A·dx·dz·Σ_{z'≤z}Σ_x ρ(x,y,z') → B_y ∝ column density
    (reference initcond.f90:6772-6840 ferriere_uniform_y)."""
    dx = spec.Lx / spec.nx if spec.periodic[0] else spec.Lx / max(spec.nx - 1, 1)
    dz = spec.Lz / spec.nz if spec.periodic[2] else spec.Lz / max(spec.nz - 1, 1)
    colsum = jnp.cumsum(jnp.sum(rho, axis=0, keepdims=True), axis=2)
    ax = ampl * colsum * dx * dz
    zero = jnp.zeros(spec.shape, grid.x.dtype)
    return jnp.stack([ax + zero, zero, zero])


@register_ic("ferriere_ism")
def ic_ferriere_ism(grid, spec, eos, cfg, params):
    """K. Ferriere ApJ 497, 759 (1998) multi-component ISM profile
    (reference entropy.f90:2361-2455 ``ferriere``): ρ(z) from the cold/
    warm/ionized/hot gas components (eqs 6,7,9,13), entropy from the
    thermal pressure (eq 15) at fixed per-component temperatures."""
    ul = float(params.get("unit_length", 3.086e21))
    ud = float(params.get("unit_density", 1e-24))
    uv = float(params.get("unit_velocity", 1e5))
    ut = float(params.get("unit_temperature",
                          1.6726e-24 * uv * uv / 1.380649e-16))
    kpc = 3.086e21 / ul
    m_p, k_B = 1.67262192e-24, 1.380649e-16
    rhoscale = 1.36 * m_p / ud
    T_c, T_w, T_i, T_h = (500.0 / ut, 8.0e3 / ut, 8.0e3 / ut, 1.0e6 / ut)
    z = grid.zg
    absz = jnp.abs(z)
    n_c = 0.340 * (0.859 * jnp.exp(-(z / (0.127 * kpc)) ** 2)
                   + 0.047 * jnp.exp(-(z / (0.318 * kpc)) ** 2)
                   + 0.094 * jnp.exp(-absz / (0.403 * kpc)))
    n_w = 0.226 * (0.456 * jnp.exp(-(z / (0.127 * kpc)) ** 2)
                   + 0.403 * jnp.exp(-(z / (0.318 * kpc)) ** 2)
                   + 0.141 * jnp.exp(-absz / (0.403 * kpc)))
    n_i = 0.0237 * jnp.exp(-absz / kpc) \
        + 0.0013 * jnp.exp(-absz / (0.150 * kpc))
    n_h = 0.00048 * jnp.exp(-absz / (1.5 * kpc))
    rho = (n_c + n_w + n_i + n_h) * rhoscale
    lnrho = jnp.log(rho)
    ones = jnp.ones(spec.shape, grid.x.dtype)
    out = {"+lnrho": lnrho + 0.0 * ones}
    if cfg is not None and cfg.module("entropy") is not None:
        # k_B·unit_length³ in code units = k_B_cgs·T_unit/unit_pressure
        kB_code = k_B * ut / (ud * uv * uv)
        pp = kB_code * (1.09 * n_c * T_c + 1.09 * n_w * T_w
                        + 2.09 * n_i * T_i + 2.27 * n_h * T_h)
        if hasattr(eos, "ss_from_lnTT"):
            # eosperturb(pp) through the Saha EOS (eos_ionization.f90
            # :956-970 ilnrho_pp): T = p/((1+y+x_He)·s_ion·ρ) with the
            # explicit y(ρ,T) — converged by fixed point — then the
            # Sackur-Tetrode inversion gives s
            c = eos._c
            TT = pp / (rho * c["ss_ion"])
            for _ in range(40):
                lnTT = jnp.log(jnp.maximum(TT, 1e-30))
                lnK = (c["lnrho_e"] - lnrho
                       + 1.5 * (lnTT - c["lnTT_ion"])
                       - c["TT_ion"] / jnp.maximum(TT, 1e-30))
                K = jnp.exp(jnp.clip(lnK, -80.0, 80.0))
                _s = jnp.sqrt(K)
                y = jnp.clip(2.0 * _s / (_s + jnp.sqrt(4.0 + K)),
                             0.0, 1.0 - 1e-8)
                TT = pp / ((1.0 + y + eos.xHe) * rho * c["ss_ion"])
            ss = eos.ss_from_lnTT(lnrho, jnp.log(TT))
        else:
            # eosperturb(pp): ss from cs² = γp/ρ (ideal gas)
            gamma = eos.gamma
            cs2 = gamma * pp / rho
            ss = (eos.cp / gamma) * (jnp.log(cs2 / eos.cs0 ** 2)
                                     - (gamma - 1.0)
                                     * (lnrho - eos.lnrho0))
        out["+ss"] = ss + 0.0 * ones
    bampl = float(params.get("ferriere_uniform_by", 0.0))
    if bampl:
        out["+aa"] = _ferriere_uniform_by(bampl, rho + 0.0 * ones,
                                          grid, spec)
    return out


@register_ic("hs_equilibrium_ism")
def ic_hs_equilibrium_ism(grid, spec, eos, cfg, params):
    """Galactic hydrostatic+thermal equilibrium (reference
    initial_condition/hs_equilibrium_ism.f90): ρ(z) from the Ferriere
    stellar-disk + dark-halo gravity with constant initial temperature
    T_init, ss from eoscalc(lnρ, lnT(z)).  The column-normalized seed
    field (initial_condition_aa) is not ported."""
    import math as _m
    ul = float(params.get("unit_length", 3.086e21))
    uv = float(params.get("unit_velocity", 1e5))
    ud = float(params.get("unit_density", 1.6728e-24))
    ut = float(params.get("unit_temperature", 46.02))
    a_S, z_S = 4.4e-9, 6.172e20
    a_D, z_D = 1.7e-9, 3.086e21
    m_u, k_B = 1.66053907e-24, 1.380649e-16
    rho0ts = float(params.get("rho0ts", 3.5e-24 / ud))
    T_init_K = float(params.get("t_init", params.get("T_init",
                                                     7.088e2 / ut))) * ut
    mu = float(params.get("mu", 0.62))
    lthermal = bool(params.get("lthermal_hse", True))
    # dimensionless profile prof/(a_S·z_S) — cgs intermediates like z_S²
    # (~4e41) overflow float32, so fold the ratios into python floats
    zr = grid.zg * (ul / z_S)                      # z/z_S
    prof_n = (jnp.sqrt(1.0 + zr ** 2)
              + 0.5 * (a_D / a_S) * (ul * ul / (z_D * z_S)) * grid.zg ** 2)
    TT_K = T_init_K * prof_n
    if lthermal:
        coef = a_S * z_S * m_u * mu / (k_B * T_init_K)
        logrho = _m.log(rho0ts) + coef * (jnp.log(T_init_K)
                                          - jnp.log(TT_K))
    else:
        # interstellar(_old).f90 thermal_hs non-hse branch works in CODE
        # units: g_A = a_S_cgs·unit_length/unit_velocity², z in code units
        # — the cgs profile must be scaled by 1/uv² (erg/g → code energy)
        logrho = _m.log(rho0ts) \
            - 0.015 * (a_S * z_S / uv ** 2) * (prof_n - 1.0)
    logrho = jnp.maximum(logrho, -40.0)
    ones = jnp.ones(spec.shape, grid.x.dtype)
    out = {"+lnrho": logrho + 0.0 * ones}
    if cfg is not None and cfg.module("entropy") is not None:
        gamma = eos.gamma
        lnTT = jnp.log(TT_K / ut)
        ss = (eos.cp / gamma) * (lnTT - eos.lnTT0 - (gamma - 1.0)
                                 * (logrho - eos.lnrho0))
        out["+ss"] = ss + 0.0 * ones
    bampl = float(params.get("ferriere_uniform_by", 0.0))
    if bampl:
        out["+aa"] = _ferriere_uniform_by(
            bampl, jnp.exp(logrho) + 0.0 * ones, grid, spec)
    return out


@register_ic("coronae_init")
def ic_coronae_init(grid, spec, eos, cfg, params):
    """Solar-corona stratification (reference
    ``src/initial_condition/coronae_init.f90``): lnTT_init='tanh' — a
    chromosphere→corona temperature jump in PHYSICAL (SI) height
    (setup_tanh :740-767), and lnrho_init='hydrostatic' — trapezoid
    integration of dlnρ/dz = −lnT' − γ/(cp(γ−1))·g/T upward from
    ρ(z0)=rho_init (hydrostatic_lnTT :500-562)."""
    import numpy as np
    ng = spec.nghost
    z = np.asarray(grid.z, np.float64)             # ghosted coordinate
    ul = float(params.get("unit_length", 1.0))
    ut = float(params.get("unit_temperature", 1.0))
    T0 = float(params.get("t0", 6000.0))
    T1 = float(params.get("t1", 1e6))
    z0t = float(params.get("z0_tanh", 4e6))
    wt = float(params.get("width_tanh", 1e6))
    rho_init = float(params.get("rho_init", 1.0))
    gravz = float(params.get("gravz", 0.0))
    z_SI = z * ul
    TT = (T1 - T0) * (0.5 * np.tanh((z_SI - z0t) / wt) + 0.5) + T0
    lnTT = np.log(TT / ut)                        # code units, ghosted
    out = {}
    if str(params.get("lntt_init", "")) == "tanh":
        prof = jnp.asarray(lnTT[None, None, ng:-ng])
        out["lnTT"] = jnp.broadcast_to(
            prof, (spec.nx, spec.ny, spec.nz)) + 0.0
    if str(params.get("lnrho_init", "")) == "hydrostatic":
        # konst = γ·cp1/(γ−1); trapezoid ∫ g/T dz (:517-536)
        cp1 = 1.0 / eos.cp
        konst = eos.gamma * cp1 / (eos.gamma - 1.0)
        TTc = TT / ut
        lnrho = np.empty_like(z)
        lnrho[ng] = np.log(rho_init)
        for i in range(ng + 1, len(z)):
            intg = 0.5 * (z[i] - z[i - 1]) * gravz \
                * (1.0 / TTc[i - 1] + 1.0 / TTc[i])
            lnrho[i] = lnrho[i - 1] - lnTT[i] + lnTT[i - 1] + konst * intg
        for i in range(ng - 1, -1, -1):
            intg = 0.5 * (z[i] - z[i + 1]) * gravz \
                * (1.0 / TTc[i + 1] + 1.0 / TTc[i])
            lnrho[i] = lnrho[i + 1] - lnTT[i] + lnTT[i + 1] + konst * intg
        prof = jnp.asarray(lnrho[None, None, ng:-ng])
        out["lnrho"] = jnp.broadcast_to(
            prof, (spec.nx, spec.ny, spec.nz)) + 0.0
    return out
