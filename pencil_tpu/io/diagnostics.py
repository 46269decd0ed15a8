"""Named scalar diagnostics (reference ``src/diagnostics.f90``: modules save
via save_name/sum_mn_name into fname, MPI-reduced in ``diagnostic``
:643-817, printed by ``prints`` :205-318 according to ``print.in``).

Here each diagnostic is a named pure function over the Pencils container;
the whole requested set is evaluated in ONE jitted call (reductions over
sharded arrays become XLA collectives automatically under jit).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable

import jax
import jax.numpy as jnp

from ..parallel.halo import fill_ghosts
from ..physics.pencils import Pencils



def _staged_mean(x):
    """Per-axis staged mean: a single flat f32 reduction over ~32k
    elements carries O(1e-4) systematic rounding bias; reducing one axis
    at a time keeps partial sums small (the reference's per-pencil-row
    fname accumulation is similarly hierarchical)."""
    while x.ndim > 0:
        x = jnp.mean(x, axis=-1)
    return x


def _vmean(pen, x):
    """Volume mean — dV-weighted off-cartesian (sum_mn_name semantics)."""
    w = pen.vol_weight()
    return _staged_mean(x) if w is None else _staged_mean(x * w)


def _vrms(pen, x):
    return jnp.sqrt(_vmean(pen, x))


DIAG_REGISTRY: Dict[str, Callable] = {}


def diag(name):
    def deco(fn):
        DIAG_REGISTRY[name] = fn
        return fn
    return deco


# ---- hydro ----------------------------------------------------------------
@diag("urms")
def _urms(pen, st):
    return _vrms(pen, pen.u2())


@diag("umax")
def _umax(pen, st):
    return jnp.sqrt(jnp.max(pen.u2()))


@diag("u2m")
def _u2m(pen, st):
    return _vmean(pen, pen.u2())


@diag("ux2m")
def _ux2m(pen, st):
    return _vmean(pen, pen.uu()[0] ** 2)


@diag("uy2m")
def _uy2m(pen, st):
    return _vmean(pen, pen.uu()[1] ** 2)


@diag("uz2m")
def _uz2m(pen, st):
    return _vmean(pen, pen.uu()[2] ** 2)


@diag("uxm")
def _uxm(pen, st):
    return _vmean(pen, pen.uu()[0])


@diag("uym")
def _uym(pen, st):
    return _vmean(pen, pen.uu()[1])


@diag("uzm")
def _uzm(pen, st):
    return _vmean(pen, pen.uu()[2])


@diag("divum")
def _divum(pen, st):
    return _vmean(pen, pen.divu())


@diag("divu2m")
def _divu2m(pen, st):
    return _vmean(pen, pen.divu() ** 2)


@diag("orms")
def _orms(pen, st):
    oo = pen.oo()
    return _vrms(pen, oo[0] ** 2 + oo[1] ** 2 + oo[2] ** 2)


@diag("oum")
def _oum(pen, st):
    """Mean kinetic helicity <ω·u>."""
    oo, uu = pen.oo(), pen.uu()
    return _vmean(pen, oo[0] * uu[0] + oo[1] * uu[1] + oo[2] * uu[2])


for _i, _c in enumerate("xyz"):
    # per-component vorticity moments (hydro.f90 idiag_ox*m/o*2m)
    DIAG_REGISTRY[f"o{_c}m"] = (
        lambda pen, st, i=_i: _vmean(pen, pen.oo()[i]))
    DIAG_REGISTRY[f"o{_c}2m"] = (
        lambda pen, st, i=_i: _vmean(pen, pen.oo()[i] ** 2))


@diag("ekin")
def _ekin(pen, st):
    return 0.5 * _vmean(pen, pen.rho() * pen.u2())


def _boxvol(pen):
    """Box volume with degenerate axes weighing 1 (reference box_vol,
    grid.f90:1667: nxgrid==1 axes contribute no length factor)."""
    gs = pen.cfg.grid
    vol = 1.0
    for L, n in ((gs.Lx, gs.nx), (gs.Ly, gs.ny), (gs.Lz, gs.nz)):
        if n > 1:
            vol *= L
    return vol


@diag("ekintot")
def _ekintot(pen, st):
    """∫½ρu² dV (hydro.f90:516 idiag_ekintot, integral not mean)."""
    return 0.5 * _vmean(pen, pen.rho() * pen.u2()) * _boxvol(pen)


@diag("ethtot")
def _ethtot(pen, st):
    """∫ρe dV (entropy.f90 idiag_ethtot); for the Saha EOS
    e = 1.5(1+y+x_He)·s_ion·T + y·s_ion·T_ion (eos_ionization.f90:586)."""
    e = pen.eos
    if hasattr(e, "ion_pencils"):
        return _vmean(pen, pen.rho()
                      * e.ion_pencils(pen)["ee"]) * _boxvol(pen)
    if hasattr(e, "yH") and hasattr(e, "_c"):
        c = e._c
        y = e.yH(pen)
        ee = (1.5 * (1.0 + y + e.xHe) * c["ss_ion"] * pen.TT()
              + y * c["ss_ion"] * c["TT_ion"])
        return _vmean(pen, pen.rho() * ee) * _boxvol(pen)
    return _vmean(pen, pen.rho() * e.cv * pen.TT()) * _boxvol(pen)


@diag("EEK")
def _EEK(pen, st):
    """<½ρu²> (hydro.f90:4067 idiag_EEK)."""
    return 0.5 * _vmean(pen, pen.rho() * pen.u2())


@diag("EEM")
def _EEM(pen, st):
    """<B²/2> (magnetic.f90:5757)."""
    return 0.5 * _vmean(pen, pen.b2())


@diag("drho2m")
def _drho2m(pen, st):
    """<(ρ−ρ₀)²> (density.f90:3020)."""
    rho0 = pen.eos.rho0 if pen.eos is not None else 1.0
    return _vmean(pen, (pen.rho() - rho0) ** 2)


@diag("rhof2m")
def _rhof2m(pen, st):
    """<ρ'²> with ρ' = ρ − exp(<lnρ>_xy(z)) (density.f90:1709 rho_flucz)."""
    rho = pen.rho()
    ref = jnp.exp(jnp.mean(pen.lnrho(), axis=(0, 1), keepdims=True))
    return _vmean(pen, (rho - ref) ** 2)


def _has_density(pen):
    return "rho" in pen.reg.slots or "lnrho" in pen.reg.slots


# ---- density --------------------------------------------------------------
@diag("rhom")
def _rhom(pen, st):
    # DENSITY=nodensity/boussinesq: the reference never computes density
    # diagnostics (calc_diagnostics_density is a no-op) and prints 0
    if not _has_density(pen):
        return jnp.zeros(())
    return _vmean(pen, pen.rho())


@diag("rho2m")
def _rho2m(pen, st):
    return _vmean(pen, pen.rho() ** 2)


@diag("ppm")
def _ppm(pen, st):
    """<p> = <ρcs²/γ> (reference idiag_ppm)."""
    return _vmean(pen, pen.rho() * pen.cs2() / pen.eos.gamma)


def _c_drag(pen, comp):
    """Drag/lift coefficient on solid-cells object 1 (dsolid_dt,
    solid_cells.f90:687-871 + dsolid_dt_integrate :873-965): pressure +
    viscous stress sampled at the nearest outside grid point of each
    surface force point, normalized by 2/(ρ̄_fluid·init_uu²)·1/(2r_obj)."""
    sc = pen.cfg.module("solid_cells")
    if sc is None:
        return jnp.zeros(())
    geom = sc._geometry(pen.cfg)
    rho = pen.rho()
    nx, ny, nz = rho.shape
    pp = rho * pen.cs2() / pen.eos.gamma
    visc = pen.cfg.module("viscosity")
    nu = float(getattr(visc, "nu", 0.0)) if visc is not None else 0.0
    sij = pen.sij()                                  # (3, 3, nx, ny, nz)
    fp = geom["fp_idx"]                              # (nfp,) flat xy
    nvec = geom["fp_nvec"]                           # (nfp, 2)
    ppf = pp.reshape(nx * ny, nz)[fp]                # (nfp, nz)
    rhof = rho.reshape(nx * ny, nz)[fp]
    stress = sum((2.0 * nu) * rhof
                 * sij[comp, d].reshape(nx * ny, nz)[fp] * nvec[:, d:d + 1]
                 for d in range(2))
    nv_c = nvec[:, comp:comp + 1] if comp < 2 else 0.0
    force = (-ppf * nv_c + stress) * geom["surfel"]
    total = jnp.sum(force) * geom["drag_norm"]
    fluid = ~geom["solid"]
    refrho0 = (jnp.sum(jnp.mean(rho, axis=2)
                       * fluid) / jnp.sum(fluid))
    return total * 2.0 / (refrho0 * sc.init_uu ** 2)


@diag("c_dragx")
def _c_dragx(pen, st):
    return _c_drag(pen, 0)


@diag("c_dragy")
def _c_dragy(pen, st):
    return _c_drag(pen, 1)


@diag("c_dragz")
def _c_dragz(pen, st):
    return _c_drag(pen, 2)


@diag("uxuym")
def _uxuym(pen, st):
    return _vmean(pen, pen.uu()[0] * pen.uu()[1])


@diag("uxuzm")
def _uxuzm(pen, st):
    return _vmean(pen, pen.uu()[0] * pen.uu()[2])


@diag("uyuzm")
def _uyuzm(pen, st):
    return _vmean(pen, pen.uu()[1] * pen.uu()[2])


@diag("uxmax")
def _uxmax(pen, st):
    """Signed max of u_x (hydro.f90:3991 max_mn_name on the raw
    component — the DIAG_DOC says |u_x| but no abs is taken)."""
    return jnp.max(pen.uu()[0])


@diag("uymax")
def _uymax(pen, st):
    return jnp.max(pen.uu()[1])


@diag("uzmax")
def _uzmax(pen, st):
    return jnp.max(pen.uu()[2])


@diag("uzrmaxs")
def _uzrmaxs(pen, st):
    """max|u_z| (hydro.f90:3986 max_mn_name(uz², lsqrt))."""
    return jnp.max(jnp.abs(pen.uu()[2]))


@diag("duxdzma")
def _duxdzma(pen, st):
    """<|∂u_x/∂z|> (hydro.f90:4060 sum_mn_name(abs(uij(1,3))))."""
    return _vmean(pen, jnp.abs(pen.uij()[0, 2]))


@diag("duydzma")
def _duydzma(pen, st):
    """<|∂u_y/∂z|> (hydro.f90:4061)."""
    return _vmean(pen, jnp.abs(pen.uij()[1, 2]))


@diag("dbxmax")
def _dbxmax(pen, st):
    """max|B_x − B_ext,x| — the stored bfield slot is the deviation
    (bfield.f90:1096 max_mn_name(abs(p%bbb)))."""
    return jnp.max(jnp.abs(pen.field("bb")[0]))


@diag("dbymax")
def _dbymax(pen, st):
    return jnp.max(jnp.abs(pen.field("bb")[1]))


@diag("dbzmax")
def _dbzmax(pen, st):
    return jnp.max(jnp.abs(pen.field("bb")[2]))


@diag("divbmax")
def _divbmax(pen, st):
    """max|∇·B| of the evolved deviation field (bfield.f90 idiag_divbmax)."""
    divb = sum(pen.d("bb", a)[a] for a in range(3))
    return jnp.max(jnp.abs(divb))


@diag("uxmin")
def _uxmin(pen, st):
    return jnp.min(pen.uu()[0])


@diag("uymin")
def _uymin(pen, st):
    return jnp.min(pen.uu()[1])


@diag("uzmin")
def _uzmin(pen, st):
    return jnp.min(pen.uu()[2])


@diag("o2m")
def _o2m(pen, st):
    oo = pen.oo()
    return _vmean(pen, oo[0] ** 2 + oo[1] ** 2 + oo[2] ** 2)


@diag("oz2m")
def _oz2m(pen, st):
    return _vmean(pen, pen.oo()[2] ** 2)


@diag("rhomax")
def _rhomax(pen, st):
    return jnp.max(pen.rho())


@diag("rhomin")
def _rhomin(pen, st):
    return jnp.min(pen.rho())


@diag("lnrhom")
def _lnrhom(pen, st):
    return _vmean(pen, pen.lnrho())


# ---- entropy / thermo -----------------------------------------------------
@diag("ssm")
def _ssm(pen, st):
    # reference parse_name leaves unmatched diagnostics at 0 (e.g. 'ssm'
    # requested under thermal_energy prints 0.0000E+00)
    if "ss" not in pen.reg.slots:
        if "lnTT" in pen.reg.slots and hasattr(pen.eos, "ss"):
            # lnTT-evolving ionization runs derive s from (lnρ, lnT)
            # (temperature_ionization.f90 idiag_ssm via p%ss)
            return _vmean(pen, pen.eos.ss(pen))
        return jnp.zeros(())
    return _vmean(pen, pen.ss())


@diag("TTm")
def _ttm(pen, st):
    return _vmean(pen, pen.TT())


@diag("TTmax")
def _ttmax(pen, st):
    return jnp.max(pen.TT())


@diag("TTmin")
def _ttmin(pen, st):
    return jnp.min(pen.TT())


@diag("TT2m")
def _tt2m(pen, st):
    """<T²> (temperature_idealgas.f90:127 idiag_TT2m)."""
    return _vmean(pen, pen.TT() ** 2)


@diag("drurms")
def _drurms(pen, st):
    """rms ∇·(ρu) = ρ∇·u + u·∇ρ (hydro.f90:440 idiag_divrhourms) —
    with uniform ρ this is the residual compressibility of the
    incompressible projection."""
    if _has_density(pen):
        gr = pen.glnrho() * pen.rho()[None]
        ugrho = sum(pen.uu()[a] * gr[a] for a in range(3))
        return _vrms(pen, (pen.rho() * pen.divu() + ugrho) ** 2)
    return _vrms(pen, pen.divu() ** 2)


@diag("drumax")
def _drumax(pen, st):
    """max ∇·(ρu) (hydro.f90:441, max_mn_name of the signed value)."""
    if _has_density(pen):
        gr = pen.glnrho() * pen.rho()[None]
        ugrho = sum(pen.uu()[a] * gr[a] for a in range(3))
        return jnp.max(pen.rho() * pen.divu() + ugrho)
    return jnp.max(pen.divu())


@diag("ecrm")
def _ecrm(pen, st):
    """<e_cr> (cosmicray.f90 idiag_ecrm)."""
    return _vmean(pen, pen.field("ecr"))


@diag("ecrmax")
def _ecrmax(pen, st):
    return jnp.max(pen.field("ecr"))


@diag("XXm")
def _xxm(pen, st):
    """<X> chirality (special/chiral.f90 idiag_XX_chiralm)."""
    return _vmean(pen, pen.field("XX_chiral"))


@diag("YYm")
def _yym(pen, st):
    return _vmean(pen, pen.field("YY_chiral"))


@diag("rhonm")
def _rhonm(pen, st):
    """<ρ_n> neutral density (neutraldensity.f90)."""
    if "rhon" in pen.reg.slots:
        return _vmean(pen, pen.field("rhon"))
    return _vmean(pen, jnp.exp(pen.field("lnrhon")))


@diag("ss2m")
def _ss2m(pen, st):
    if "ss" not in pen.reg.slots:
        return jnp.zeros(())
    return _vmean(pen, pen.ss() ** 2)


@diag("polytrm")
def _polytrm(pen, st):
    """<tr C> polymer conformation trace (polymer.f90 idiag_polytrm):
    C stored as (cxx, cxy, cxz, cyy, cyz, czz)."""
    c = pen.field("poly")
    return _vmean(pen, c[0] + c[3] + c[5])


@diag("frmax")
def _frmax(pen, st):
    """max f(r) FENE-P extension factor (polymer.f90 idiag_frmax)."""
    pm = pen.cfg.module("polymer")
    if pm is None:
        return jnp.zeros(())
    c = pen.field("poly")
    fr = pm.fr(c)
    if fr is None:
        return jnp.ones(())
    return jnp.max(fr)


@diag("yHm")
def _yhm(pen, st):
    """<y_H> Saha ionization fraction (eos_ionization idiag_yHm)."""
    e = pen.eos
    if hasattr(e, "yH"):
        return _vmean(pen, e.yH(pen))
    return jnp.zeros(())


@diag("yHmax")
def _yhmax(pen, st):
    e = pen.eos
    if hasattr(e, "yH"):
        return jnp.max(e.yH(pen))
    return jnp.zeros(())


# ---- radiation (radiation_ray.f90 radiative_cooling/pressure diags) --------
def _rad(pen):
    return pen.cfg.module("radiation").transfer(pen)


@diag("Qradrms")
def _qradrms(pen, st):
    """√⟨Qrad²⟩ (radiation_ray.f90:1702 idiag_Qradrms)."""
    return _vrms(pen, _rad(pen)["Qrad"] ** 2)


@diag("Qradmax")
def _qradmax(pen, st):
    """max|Qrad| (:1705 idiag_Qradmax, sqrt of the max of Qrad²)."""
    return jnp.sqrt(jnp.max(_rad(pen)["Qrad"] ** 2))


@diag("Sradm")
def _sradm(pen, st):
    """⟨S⟩ (:1700 idiag_Sradm)."""
    return _vmean(pen, _rad(pen)["Srad"])


@diag("kapparhom")
def _kapparhom(pen, st):
    """⟨κρ⟩ (:1746 idiag_kapparhom)."""
    return _vmean(pen, _rad(pen)["kapparho"])


@diag("Fradzm")
def _fradzm(pen, st):
    """⟨Frad_z⟩ = ⟨KR_Fradz/κρ⟩ (:1744 — KR_Frad carries a κρ factor
    that the diagnostic divides back out)."""
    r = _rad(pen)
    if r["KR_Frad"] is None:
        return jnp.zeros(())
    return _vmean(pen, r["KR_Frad"][2]
                  / jnp.maximum(r["kapparho"], 1e-30))


# ---- alphadisk (special/alphadisk.f90 diagnostics) -------------------------
@diag("sigmam")
def _sigmam(pen, st):
    return _vmean(pen, pen.field("sigma"))


@diag("sigmamax")
def _sigmamax(pen, st):
    return jnp.max(pen.field("sigma"))


@diag("sigmamin")
def _sigmamin(pen, st):
    return jnp.min(pen.field("sigma"))


@diag("tmyr")
def _tmyr(pen, st):
    from ..physics.special.alphadisk import MYR
    return st["t"] / MYR


@diag("dtyear")
def _dtyear(pen, st):
    """<0.4·dx²/(3ν)> in years (alphadisk.f90:582-584)."""
    import numpy as _np
    sp = pen.cfg.module("alphadisk")
    r = pen.grid.xg + 0.0 * pen.field("sigma")
    nu = pen.field("mdot") / (3.0 * _np.pi) \
        / jnp.maximum(pen.field("sigma"), 1e-30)
    dx = pen.cfg.grid.dx
    del sp
    return _vmean(pen, 0.4 * dx * dx / (3.0 * nu))


@diag("dtdiffus")
def _dtdiffus(pen, st):
    """dt·max(maxdiffus·ΣΔ⁻²)/cdtv (equ.f90:1180 idiag_dtdiffus) — for
    the alphadisk runs maxdiffus = ν(r) = Ṁ/(3πΣ)."""
    import numpy as _np
    if "sigma" in pen.reg.slots:
        nu = pen.field("mdot") / (3.0 * _np.pi) \
            / jnp.maximum(pen.field("sigma"), 1e-30)
    else:
        return jnp.zeros(())
    d1 = pen.dline_1()
    dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
    return st["dt"] * jnp.max(nu * dxyz2) / pen.cfg.time.cdtv


@diag("mu5m")
def _mu5m(pen, st):
    """<µ₅> (special/chiral_mhd.f90 idiag_mu5m)."""
    return _vmean(pen, pen.field("mu5"))


@diag("mu5rms")
def _mu5rms(pen, st):
    return _vrms(pen, pen.field("mu5") ** 2)


# ---- dust fluid ------------------------------------------------------------
def _nd(pen):
    if "nd" in pen.reg.slots:
        return pen.field("nd")
    return jnp.exp(pen.field("lnnd"))


@diag("ndm")
def _ndm(pen, st):
    return _vmean(pen, _nd(pen))


@diag("ndmin")
def _ndmin(pen, st):
    return jnp.min(_nd(pen))


@diag("ndmax")
def _ndmax(pen, st):
    return jnp.max(_nd(pen))


@diag("nd2m")
def _nd2m(pen, st):
    return _vmean(pen, _nd(pen) ** 2)


@diag("rhodm")
def _rhodm(pen, st):
    """<ρ_d> = <m_d·n_d>, m_d = 1 (dustdensity.f90 idiag_rhodm)."""
    return _vmean(pen, _nd(pen))


@diag("rhodmin")
def _rhodmin(pen, st):
    return jnp.min(_nd(pen))


@diag("rhodmax")
def _rhodmax(pen, st):
    return jnp.max(_nd(pen))


@diag("epsdm")
def _epsdm(pen, st):
    """<ρ_d/ρ> dust-to-gas ratio (idiag_epsdm)."""
    return _vmean(pen, _nd(pen) * pen.rho1())


@diag("epsdmin")
def _epsdmin(pen, st):
    return jnp.min(_nd(pen) * pen.rho1())


@diag("epsdmax")
def _epsdmax(pen, st):
    return jnp.max(_nd(pen) * pen.rho1())


@diag("csm")
def _csm(pen, st):
    return _vrms(pen, pen.cs2())


@diag("eth")
def _eth(pen, st):
    """Mean thermal energy density ρ e = ρ cv T."""
    e = pen.eos
    return _vmean(pen, pen.rho() * e.cv * pen.TT())


@diag("cv")
def _cv_diag(pen, st):
    """<cv> (temperature_ionization.f90:758)."""
    e = pen.eos
    if hasattr(e, "ion_pencils"):
        return _vmean(pen, e.ion_pencils(pen)["cv"])
    return jnp.asarray(float(getattr(e, "cv", 0.0)))


@diag("ethm")
def _ethm(pen, st):
    if "eth" in pen.reg.slots:
        return _vmean(pen, pen.field("eth"))
    e = pen.eos
    if hasattr(e, "ion_pencils"):
        # <ρe> with the (lnρ,lnT)-ionization energy
        # (temperature_ionization.f90:756 p%ee/p%rho1)
        return _vmean(pen, pen.rho() * e.ion_pencils(pen)["ee"])
    if hasattr(e, "yH"):
        # ionization EOS: e = 1.5(1+y+x_He)·s_ion·T + y·e_ion per MASS
        # (eos_ionization.f90:586 getdensity) → ethm = <ρ·e>
        c = e._c
        y = e.yH(pen)
        ee = (1.5 * (1.0 + y + e.xHe) * c["ss_ion"] * pen.TT()
              + y * c["ss_ion"] * c["TT_ion"])
        return _vmean(pen, pen.rho() * ee)
    return _vmean(pen, pen.rho() * e.cv * pen.TT())


@diag("yHm")
def _yhm(pen, st):
    e = pen.eos
    if hasattr(e, "yH"):
        return _vmean(pen, e.yH(pen))
    return jnp.zeros(())


@diag("yHmax")
def _yhmax(pen, st):
    e = pen.eos
    if hasattr(e, "yH"):
        return jnp.max(e.yH(pen))
    return jnp.zeros(())


def _visc_heat(pen):
    """Per-point viscous heating (reference p%visc_heat) recomputed from the
    viscosity config — diagnostics run on a fresh pencil set outside rhs."""
    visc = pen.cfg.module("viscosity") if pen.cfg is not None else None
    heat = jnp.zeros_like(pen.divu())
    if visc is None:
        return heat
    if ({"nu-const", "simplified", "nu-simplified"} & set(visc.ivisc)) \
            and visc.nu > 0.0:
        heat = heat + 2.0 * visc.nu * pen.sij2()
    if "rho-nu-const-bulk" in visc.ivisc and visc.zeta > 0.0:
        heat = heat + (visc.zeta / pen.rho()) * pen.divu() ** 2
    if ({"nu-shock", "shock"} & set(visc.ivisc)) and visc.nu_shock > 0.0 \
            and "shock" in pen.reg.slots:
        heat = heat + visc.nu_shock * pen.field("shock") * pen.divu() ** 2
    return heat


@diag("epsK")
def _epsK(pen, st):
    """<2νρS²> + shock part = <ρ·visc_heat> (viscosity.f90:2690)."""
    return _vmean(pen, _visc_heat(pen) * pen.rho())


@diag("visc_heatm")
def _visc_heatm(pen, st):
    return _vmean(pen, _visc_heat(pen))


@diag("visc_heat")
def _visc_heat_alias(pen, st):
    """'visc_heat' in print.in does NOT match viscosity.f90's parse_name
    label 'visc_heatm', so the reference prints 0.0000E+00 for it
    (sod_1000s golden) — reproduce the unmatched-label behavior."""
    return jnp.zeros(())


@diag("eem")
def _eem(pen, st):
    """<e> mean specific internal energy (entropy.f90:266 idiag_eem,
    pencil ee = cv·T)."""
    if "eth" in pen.reg.slots:
        return _vmean(pen, pen.field("eth") / pen.rho())
    return _vmean(pen, pen.eos.cv * pen.TT())


@diag("pdivum")
def _pdivum(pen, st):
    """<p∇·u> (thermal_energy.f90:607); p = (γ−1)eth = ρcs²/γ."""
    return _vmean(pen, pen.rho() * pen.cs2() / pen.eos.gamma * pen.divu())


@diag("ruxm")
def _ruxm(pen, st):
    return _vmean(pen, pen.rho() * pen.uu()[0])


@diag("ruym")
def _ruym(pen, st):
    return _vmean(pen, pen.rho() * pen.uu()[1])


@diag("ruzm")
def _ruzm(pen, st):
    return _vmean(pen, pen.rho() * pen.uu()[2])


def _curlo(pen):
    """q = ∇×ω = ∇(∇·u) − ∇²u (hydro.f90 p%curlo via del2v_etc)."""
    return pen.graddivu() - pen.del2u()


def _fvisc_vec(pen):
    """Recompute the viscous-force pencil for diagnostics (p%fvisc)."""
    visc = pen.cfg.module("viscosity") if pen.cfg is not None else None
    f = jnp.zeros_like(pen.uu())
    if visc is None:
        return f
    if "nu-const" in visc.ivisc and visc.nu > 0.0:
        sij = pen.sij()
        glnrho = pen.glnrho()
        sglnrho = jnp.stack([sum(sij[a, b] * glnrho[b] for b in range(3))
                             for a in range(3)])
        f = f + visc.nu * (pen.del2u() + pen.graddivu() / 3.0 + 2.0 * sglnrho)
    if "rho-nu-const-bulk" in visc.ivisc and visc.zeta > 0.0:
        f = f + (visc.zeta / pen.rho())[None] * pen.graddivu()
    return f


def _fcont(pen):
    forc = pen.cfg.module("forcing") if pen.cfg is not None else None
    if forc is None or not forc.lforcing_cont:
        return jnp.zeros_like(pen.uu())
    return forc.fcont(pen.grid)


@diag("qrms")
def _qrms(pen, st):
    """√<|∇×ω|²> (hydro.f90:4219 idiag_qrms)."""
    return _vrms(pen, jnp.sum(_curlo(pen) ** 2, axis=0))


@diag("quxom")
def _quxom(pen, st):
    """<q·(u×ω)> (hydro.f90:4235)."""
    uxo = jnp.cross(pen.uu(), pen.oo(), axis=0)
    return _vmean(pen, jnp.sum(_curlo(pen) * uxo, axis=0))


@diag("qfviscm")
def _qfviscm(pen, st):
    """<q·f_visc> (viscosity.f90:2307-2309)."""
    return _vmean(pen, jnp.sum(_curlo(pen) * _fvisc_vec(pen), axis=0))


@diag("gdivu2m")
def _gdivu2m(pen, st):
    """<|∇(∇·u)|²> (hydro.f90:377)."""
    return _vmean(pen, jnp.sum(pen.graddivu() ** 2, axis=0))


@diag("rdivum")
def _rdivum(pen, st):
    return _vmean(pen, pen.rho() * pen.divu())


@diag("ourms")
def _ourms(pen, st):
    """√<(ω·u)²> (hydro.f90:457)."""
    return _vrms(pen, jnp.sum(pen.oo() * pen.uu(), axis=0) ** 2)


@diag("ufm")
def _ufm(pen, st):
    """<u·f_cont> (forcing.f90:6075 — the continuous-forcing pencil)."""
    return _vmean(pen, jnp.sum(pen.uu() * _fcont(pen), axis=0))


@diag("rufm")
def _rufm(pen, st):
    """<ρ u·f_cont> (forcing.f90:6065)."""
    return _vmean(pen, pen.rho() * jnp.sum(pen.uu() * _fcont(pen), axis=0))


@diag("ruy2m")
def _ruy2m(pen, st):
    return _vmean(pen, pen.rho() * pen.uu()[1] ** 2)


@diag("rux2m")
def _rux2m(pen, st):
    return _vmean(pen, pen.rho() * pen.uu()[0] ** 2)


# ---- magnetic -------------------------------------------------------------
@diag("brms")
def _brms(pen, st):
    return _vrms(pen, pen.b2())


def _pt(arr, gs):
    """Probe-point sample (reference cdata.f90:518: lpoint=(mx+1)/2 —
    0-based interior index (n+7)//2 − 4 per axis)."""
    ix = (gs.nx + 7) // 2 - 4
    iy = (gs.ny + 7) // 2 - 4
    iz = (gs.nz + 7) // 2 - 4
    return arr[..., ix, iy, iz]


@diag("b2m")
def _b2m(pen, st):
    return _vmean(pen, pen.b2())


@diag("bxpt")
def _bxpt(pen, st):
    return _pt(pen.bb()[0], pen.cfg.grid)


@diag("bypt")
def _bypt(pen, st):
    return _pt(pen.bb()[1], pen.cfg.grid)


@diag("bzpt")
def _bzpt(pen, st):
    return _pt(pen.bb()[2], pen.cfg.grid)


@diag("uxpt")
def _uxpt(pen, st):
    return _pt(pen.uu()[0], pen.cfg.grid)


@diag("uypt")
def _uypt(pen, st):
    return _pt(pen.uu()[1], pen.cfg.grid)


@diag("uzpt")
def _uzpt(pen, st):
    return _pt(pen.uu()[2], pen.cfg.grid)


@diag("alpmm")
def _alpmm(pen, st):
    """<α_m> (special/meanfield_alpm.f90 idiag_alpmm)."""
    return _vmean(pen, pen.field("alpm"))


@diag("ammax")
def _ammax(pen, st):
    return jnp.max(jnp.abs(pen.field("alpm")))


@diag("alpmrms")
def _alpmrms(pen, st):
    return _vrms(pen, pen.field("alpm") ** 2)


@diag("bmax")
def _bmax(pen, st):
    return jnp.sqrt(jnp.max(pen.b2()))


def _bbb(pen):
    """B without B_ext (reference p%bbb, magnetic.f90:5784 bbxmax)."""
    bb = pen.bb()
    mag = pen.cfg.module("magnetic")
    if mag is not None and any(b != 0.0 for b in mag.B_ext):
        bb = bb - jnp.asarray(mag.B_ext,
                              dtype=bb.dtype)[:, None, None, None]
    return bb


for _i, _c in enumerate("xyz"):
    DIAG_REGISTRY[f"bb{_c}max"] = (
        lambda i: lambda pen, st: jnp.max(jnp.abs(_bbb(pen)[i])))(_i)


@diag("bx2m")
def _bx2m(pen, st):
    return _vmean(pen, pen.bb()[0] ** 2)


@diag("by2m")
def _by2m(pen, st):
    return _vmean(pen, pen.bb()[1] ** 2)


@diag("bz2m")
def _bz2m(pen, st):
    return _vmean(pen, pen.bb()[2] ** 2)


@diag("arms")
def _arms(pen, st):
    aa = pen.aa()
    return _vrms(pen, aa[0] ** 2 + aa[1] ** 2 + aa[2] ** 2)


@diag("a2m")
def _a2m(pen, st):
    """<A²> (magnetic.f90 idiag_a2m)."""
    aa = pen.aa()
    return _vmean(pen, aa[0] ** 2 + aa[1] ** 2 + aa[2] ** 2)


@diag("axm")
def _axm(pen, st):
    return _vmean(pen, pen.aa()[0])


@diag("aym")
def _aym(pen, st):
    return _vmean(pen, pen.aa()[1])


@diag("azm")
def _azm(pen, st):
    return _vmean(pen, pen.aa()[2])


@diag("abm")
def _abm(pen, st):
    """Mean magnetic helicity <A·B>."""
    aa, bb = pen.aa(), pen.bb()
    return _vmean(pen, aa[0] * bb[0] + aa[1] * bb[1] + aa[2] * bb[2])


@diag("jrms")
def _jrms(pen, st):
    return _vrms(pen, pen.j2())


@diag("jbm")
def _jbm(pen, st):
    jj, bb = pen.jj(), pen.bb()
    return _vmean(pen, jj[0] * bb[0] + jj[1] * bb[1] + jj[2] * bb[2])


def _mk_uirms(i):
    def fn(pen, st):
        return _vrms(pen, pen.uu()[i] ** 2)
    return fn


def _mk_bibjm(i, j):
    def fn(pen, st):
        bb = pen.bb()
        return _vmean(pen, bb[i] * bb[j])
    return fn


for _i, _c in enumerate("xyz"):
    DIAG_REGISTRY[f"u{_c}rms"] = _mk_uirms(_i)
for (_i, _j, _n) in ((0, 1, "bxbym"), (0, 2, "bxbzm"), (1, 2, "bybzm")):
    DIAG_REGISTRY[_n] = _mk_bibjm(_i, _j)


@diag("Marms")
def _marms(pen, st):
    """rms Mach number √<u²/cs²> (hydro.f90 idiag_Marms)."""
    return _vrms(pen, pen.u2() / jnp.maximum(pen.cs2(), 1e-30))


@diag("Mamax")
def _mamax(pen, st):
    return jnp.sqrt(jnp.max(pen.u2() / jnp.maximum(pen.cs2(), 1e-30)))


@diag("um2")
def _um2(pen, st):
    """max(u²) (hydro.f90 idiag_um2 via max_mn_name)."""
    return jnp.max(pen.u2())


@diag("epot")
def _epot(pen, st):
    """<ρΦ_grav> (gravity_simple.f90 idiag_epot)."""
    grav = pen.cfg.module("gravity") if pen.cfg is not None else None
    if grav is None:
        return jnp.zeros(())
    pot = grav.potential_field(pen.grid, pen.cfg.grid)
    return _vmean(pen, pen.rho() * (pot + 0.0 * pen.rho()))


@diag("unzm")
def _unzm(pen, st):
    """<u_nz> of the neutral fluid (neutrals.f90 idiag_unzm)."""
    return _vmean(pen, pen.field("uun")[2])


@diag("XXmax")
def _xxmax(pen, st):
    return jnp.max(pen.field("XX_chiral"))


@diag("YYmax")
def _yymax(pen, st):
    return jnp.max(pen.field("YY_chiral"))


# ---- magnetic tail (magnetic.f90 DIAG_DOC blocks) --------------------------
@diag("epsM")
def _epsM(pen, st):
    """<η μ0 j²> (idiag_epsM, magnetic.f90:496; μ0=1 code units)."""
    mag = pen.cfg.module("magnetic") if pen.cfg is not None else None
    eta = getattr(mag, "eta", 0.0) if mag else 0.0
    return eta * _vmean(pen, pen.j2())


@diag("vA2m")
def _vA2m(pen, st):
    return _vmean(pen, pen.b2() * pen.rho1())


@diag("j2m")
def _j2m(pen, st):
    return _vmean(pen, pen.j2())


def _vint(pen, x):
    """∫x dV with the true curvilinear volume element (r dr dφ dz /
    r²sinθ dr dθ dφ)."""
    gs = pen.cfg.grid
    g = pen.grid
    # degenerate-axis weights follow reference grid.f90:1050-1230:
    # cartesian → 1; spherical θ → 2, φ → 2π, r → 1/3; cylindrical
    # φ → 2π, z → 1, r → 1/2
    if gs.coords == "cylindrical":
        wx = gs.dx if gs.nx > 1 else 0.5
        wy = gs.dy if gs.ny > 1 else 2.0 * jnp.pi
        wz = gs.dz if gs.nz > 1 else 1.0
        if gs.nx > 1:
            x = x * g.xg
        return jnp.sum(x + 0.0 * x) * wx * wy * wz
    if gs.coords == "spherical":
        wx = gs.dx if gs.nx > 1 else 1.0 / 3.0
        wy = gs.dy if gs.ny > 1 else 2.0
        wz = gs.dz if gs.nz > 1 else 2.0 * jnp.pi
        if gs.nx > 1:
            x = x * g.xg ** 2
        if gs.ny > 1:
            x = x * jnp.sin(g.yg)
        return jnp.sum(x + 0.0 * x) * wx * wy * wz
    dv = ((gs.dx if gs.nx > 1 else 1.0)
          * (gs.dy if gs.ny > 1 else 1.0)
          * (gs.dz if gs.nz > 1 else 1.0))
    return jnp.sum(x + 0.0 * x) * dv


@diag("ab_int")
def _ab_int(pen, st):
    aa, bb = pen.field("aa"), pen.bb()
    return _vint(pen, aa[0] * bb[0] + aa[1] * bb[1] + aa[2] * bb[2])


@diag("jb_int")
def _jb_int(pen, st):
    jj, bb = pen.jj(), pen.bb()
    return _vint(pen, jj[0] * bb[0] + jj[1] * bb[1] + jj[2] * bb[2])


@diag("uxbm")
def _uxbm(pen, st):
    """<u×B>·B_ext/B_ext² (idiag_uxbm, magnetic.f90:664)."""
    mag = pen.cfg.module("magnetic") if pen.cfg is not None else None
    B0 = jnp.asarray(getattr(mag, "B_ext", (0.0, 0.0, 0.0)))
    B02 = jnp.maximum(jnp.sum(B0 ** 2), 1e-30)
    uu, bb = pen.uu(), pen.bb()
    uxb = jnp.stack([uu[1] * bb[2] - uu[2] * bb[1],
                     uu[2] * bb[0] - uu[0] * bb[2],
                     uu[0] * bb[1] - uu[1] * bb[0]])
    return _vmean(pen, sum(uxb[a] * B0[a] for a in range(3))) / B02


def _mk_compm(fieldname, i, builder=None):
    def fn(pen, st):
        arr = builder(pen) if builder else pen.field(fieldname)
        return _vmean(pen, arr[i])
    return fn


def _mk_compmax(builder, i, absval=True):
    def fn(pen, st):
        arr = builder(pen)
        return jnp.max(jnp.abs(arr[i]) if absval else arr[i])
    return fn


for _i, _c in enumerate("xyz"):
    DIAG_REGISTRY[f"b{_c}m"] = _mk_compm(None, _i, lambda pen: pen.bb())
    DIAG_REGISTRY[f"a{_c}m"] = _mk_compm("aa", _i)
    DIAG_REGISTRY[f"j{_c}max"] = _mk_compmax(lambda pen: pen.jj(), _i)
    DIAG_REGISTRY[f"b{_c}max"] = _mk_compmax(lambda pen: pen.bb(), _i)


@diag("rumax")
def _rumax(pen, st):
    """max|ρu| (hydro.f90 idiag_rumax)."""
    return jnp.sqrt(jnp.max(pen.rho() ** 2 * pen.u2()))


@diag("tot_ang_mom")
def _tot_ang_mom(pen, st):
    """∫ρ·r·sinθ·u_φ dV — z-axis angular momentum in a spherical wedge
    (hydro.f90:4138-4139 idiag_tot_ang_mom)."""
    g = pen.grid
    return _vint(pen, pen.rho() * g.xg * jnp.sin(g.yg) * pen.uu()[2])


@diag("amax")
def _amax(pen, st):
    """max|A| (magnetic.f90:6044 idiag_amax, lsqrt)."""
    aa = pen.field("aa")
    return jnp.sqrt(jnp.max(aa[0]**2 + aa[1]**2 + aa[2]**2))


@diag("ozm")
def _ozm(pen, st):
    return _vmean(pen, pen.oo()[2])


@diag("ruxuym")
def _ruxuym(pen, st):
    uu = pen.uu()
    return _vmean(pen, pen.rho() * uu[0] * uu[1])


@diag("totmass")
def _totmass(pen, st):
    """∫ρ dV with the true curvilinear volume element (idiag_totmass,
    density.f90:221 sum_mn_name(lint) + the r/r²sinθ coordinate weights
    of diagnostics.f90 sum_mn_name)."""
    return _vint(pen, pen.rho())


@diag("shockmax")
def _shockmax(pen, st):
    return jnp.max(pen.field("shock"))


@diag("bm2")
def _bm2(pen, st):
    """max(B²) (magnetic.f90:435 idiag_bm2)."""
    return jnp.max(pen.b2())


def _beta1(pen):
    """inverse plasma beta B²/(2µ₀p), p = ρcs²/γ (magnetic.f90:582-586
    idiag_beta1m/beta1max/betam via the p%beta1 pencil)."""
    mag = pen.cfg.module("magnetic")
    mu0 = getattr(mag, "mu0", 1.0) if mag is not None else 1.0
    gam = pen.eos.gamma if pen.eos is not None else 1.0
    pp = pen.rho() * pen.cs2() / gam
    return 0.5 * pen.b2() / (mu0 * jnp.maximum(pp, 1e-300))


@diag("beta1m")
def _beta1m(pen, st):
    return _vmean(pen, _beta1(pen))


@diag("beta1max")
def _beta1max(pen, st):
    return jnp.max(_beta1(pen))


@diag("betam")
def _betam(pen, st):
    return _vmean(pen, 1.0 / jnp.maximum(_beta1(pen), 1e-300))


@diag("dtgh")
def _dtgh(pen, st):
    """dt·max√advec_cg2/cdt: shallow-water gravity-wave timestep fraction
    (special/shallow_water.f90:315-316 with advec_cg2 = (gη+gh₀)²·Σ Δ⁻²
    at :472)."""
    sw = pen.cfg.module("shallow_water")
    if sw is None:
        return jnp.zeros(())
    rho = pen.field("rho")
    x, y = pen.grid.xg, pen.grid.yg
    h0 = sw._h0(x, y)
    d1 = pen.dline_1()
    dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
    cg2 = (rho + h0) ** 2 * dxyz2
    return st["dt"] * jnp.sqrt(jnp.max(cg2)) / pen.cfg.time.cdt


def _frad_surf(pen, zidx):
    """Σ_plane −K(T)·T·∂_z lnT·dx·dy at a z boundary plane
    (temperature_idealgas.f90:1673-1691 idiag_fradtop/fradbot via
    surf_mn_name)."""
    tm = pen.cfg.module("temperature")
    if tm is None:
        return jnp.zeros(())
    TT = pen.TT()
    gz = pen.glnTT()[2]
    if getattr(tm, "lADI", False) or tm.Kmax != 0.0:
        K, _ = tm.hcond(TT)
    else:
        K = tm.hcond0
    gs = pen.cfg.grid
    # dsurfxy with degenerate dims → 1 (diagnostics.f90:136-140)
    dxe = gs.dx if gs.nx > 1 else 1.0
    dye = gs.dy if gs.ny > 1 else 1.0
    val = -(K * TT * gz)[:, :, zidx]
    return jnp.sum(val) * dxe * dye


def _asc_mod(pen):
    m = pen.cfg.module("ascalar")
    return m if (m is not None and hasattr(m, "ssat_field")) else None


def _asc_cond(pen, st):
    """(ssat, condRate, qw, buoyancy) recomputed from state; zero at it=0
    like the reference's still-empty aux slots (ascalar.f90 issat/
    icondensationRate/iwaterMixingRatio filled only during rhs)."""
    m = _asc_mod(pen)
    if m is None:
        return None
    ssat = m.ssat_field(pen)
    p = st.get("particles")
    z = jnp.zeros_like(ssat)
    if p is not None and "ap" in p:
        itau, qw = m.particle_deposits(pen, p)
        crate = ssat * m.G_condensation * itau
    else:
        crate, qw = z, z
    live = (st["it"] > 0).astype(ssat.dtype)
    if m.lbuoyancy and "ttc" in pen.reg.slots:
        # buoyancy is evaluated inline (not an aux) so it is live at
        # it=0 — but reads the still-zero waterMixingRatio aux there
        acc = pen.field("acc")
        ttc = pen.field("ttc")
        buoy = m.gravity_acceleration * (
            (ttc - m.T_env) / jnp.maximum(ttc, 1e-30)
            + m.Rv_over_Rd_minus_one * (acc - m.qv_env)
            / jnp.maximum(acc, 1e-30) - qw * live)
    else:
        buoy = z
    return {"ssat": ssat * live, "condensationRate": crate * live,
            "waterMixingRatio": qw * live, "buoyancy": buoy}


def _mk_asc(name, stat):
    def g(pen, st):
        d = _asc_cond(pen, st)
        if d is None:
            return jnp.zeros(())
        x = d[name]
        return jnp.sqrt(_vmean(pen, x * x)) if stat == "rms" \
            else _vmean(pen, x)
    return g


for _nm in ("ssat", "condensationRate", "waterMixingRatio", "buoyancy"):
    DIAG_REGISTRY[f"{_nm}rms"] = _mk_asc(_nm, "rms")
    DIAG_REGISTRY[f"{_nm}m"] = _mk_asc(_nm, "m")


def _mk_field_stat(fname, stat):
    def g(pen, st):
        if fname not in pen.reg.slots:
            return jnp.zeros(())
        x = pen.field(fname)
        if stat == "rms":
            return jnp.sqrt(_vmean(pen, x * x))
        if stat == "m":
            return _vmean(pen, x)
        if stat == "max":
            return jnp.max(x)
        return jnp.min(x)
    return g


for _f in ("acc", "ttc"):
    for _s in ("rms", "m", "max", "min"):
        DIAG_REGISTRY[f"{_f}{_s}"] = _mk_field_stat(_f, _s)


@diag("gpotenp")
def _gpotenp(pen, st):
    """<φ_self·ρ_p> particle gravitational potential energy
    (particles_selfgravity.f90:217)."""
    p = _pp(st)
    if p is None or "gpotself" not in pen.reg.slots:
        return jnp.zeros(())
    pmod = pen.cfg.module("particles")
    rhop = pmod.rhop(p, pen, pen.cfg.grid)
    return _vmean(pen, pen.field("gpotself") * rhop)


@diag("alpm_int")
def _alpm_int(pen, st):
    """∫α_m dV (special/meanfield_alpm.f90:416 integrate_mn_name)."""
    if "alpm" not in pen.reg.slots:
        return jnp.zeros(())
    return _vint(pen, pen.field("alpm"))


@diag("fradbot")
def _fradbot(pen, st):
    return _frad_surf(pen, 0)


@diag("fradtop")
def _fradtop(pen, st):
    return _frad_surf(pen, -1)


@diag("gTmax")
def _gtmax(pen, st):
    """max|∇T| = max(T·|∇lnT|)."""
    g = pen.glnTT()
    TT = pen.TT()
    return jnp.sqrt(jnp.max((g[0] ** 2 + g[1] ** 2 + g[2] ** 2) * TT ** 2))


@diag("udrms")
def _udrms(pen, st):
    ud = pen.field("uud")
    return _vrms(pen, ud[0] ** 2 + ud[1] ** 2 + ud[2] ** 2)


@diag("udmax")
def _udmax(pen, st):
    ud = pen.field("uud")
    return jnp.sqrt(jnp.max(ud[0] ** 2 + ud[1] ** 2 + ud[2] ** 2))


# ---- testfield_z transport coefficients (testfield_z.f90:1050-1077) -------
def _tf_emf(pen):
    """E^q = (u × b^q)/B0 for the four z-quartet test fields; b^q = ∇×a^q
    is the fluctuating response (testfield_z.f90:915 Eipq = uxb·bamp1)."""
    if "tf_emf" in pen._cache:
        return pen._cache["tf_emf"]
    tf = pen.cfg.module("testfield")
    uu = pen.uu()
    aij = jnp.stack([pen.d("aatest", j) for j in range(3)], axis=1)
    emfs = []
    for q in range(4):
        aq = aij[3 * q:3 * q + 3]
        b = (aq[2, 1] - aq[1, 2], aq[0, 2] - aq[2, 0], aq[1, 0] - aq[0, 1])
        emfs.append(jnp.stack([
            uu[1] * b[2] - uu[2] * b[1],
            uu[2] * b[0] - uu[0] * b[2],
            uu[0] * b[1] - uu[1] * b[0],
        ]) / tf.B0)
    pen._cache["tf_emf"] = emfs
    return emfs


def _tf_proj(pen, comp, pair, eta=False, neg=False):
    """alpXY = <cz·E_comp^(q1) + sz·E_comp^(q2)>; the eta rows use
    (−sz,cz)/k with quartet/sign set by leta_rank2
    (testfield_z.f90:1065-1073 and :1166-1177)."""
    tf = pen.cfg.module("testfield")
    if tf is None:
        return jnp.zeros(())
    e = _tf_emf(pen)
    k = tf.ktestfield
    z = pen.grid.zg
    cz, sz = jnp.cos(k * z), jnp.sin(k * z)
    q1, q2 = pair
    if eta:
        val = (-sz * e[q1][comp] + cz * e[q2][comp]) / k
        if neg:
            val = -val
    else:
        val = cz * e[q1][comp] + sz * e[q2][comp]
    return _vmean(pen, val)


def _tf_eta(pen, st, comp, col):
    """eta_{comp,col}: leta_rank2=T (the default) contracts against J̄ —
    eta_i1 comes from the y-quartet (3,4) with + sign, eta_i2 from the
    x-quartet (1,2) with − sign (testfield_z.f90:1069-1071, 1166-1173);
    leta_rank2=F keeps the ∂_z B̄ (rank-3) pairing."""
    tf = pen.cfg.module("testfield")
    if tf is None:
        return jnp.zeros(())
    if getattr(tf, "leta_rank2", True):
        pair = (2, 3) if col == 0 else (0, 1)
        return _tf_proj(pen, comp, pair, eta=True, neg=(col == 1))
    pair = (0, 1) if col == 0 else (2, 3)
    return _tf_proj(pen, comp, pair, eta=True)


def _txz_coeff(pen, i, j, row):
    """Volume-mean transport coefficient from the xz test-field EMFs:
    row 0 → α_ij, row 1 → η_ij1, row 2 → η_ij3 (calc_coefficients,
    testfield_general.f90:90-140: Minv[row,:]·E_i^{(3(j-1)+q)})."""
    tf = pen.cfg.module("testfield_xz")
    if tf is None:
        return None
    E = tf.emf_ymean(pen)           # (9, 3, nx, 1, nz)
    m = tf.minv_row(pen, row)       # 3 × (nx,1,nz)
    val = sum(m[q] * E[3 * j + q, i] for q in range(3))
    return jnp.mean(val)


for _nm, _c, _p in (
        ("alp11", 0, (0, 1)), ("alp21", 1, (0, 1)), ("alp31", 2, (0, 1)),
        ("alp12", 0, (2, 3)), ("alp22", 1, (2, 3)), ("alp32", 2, (2, 3))):
    def _alp_disp(pen, st, c=_c, p=_p):
        v = _txz_coeff(pen, c, p[0] // 2 if p == (0, 1) else 1, 0)
        if v is not None:
            return v
        return _tf_proj(pen, c, p)
    DIAG_REGISTRY[_nm] = _alp_disp

# full 3×3 alpha + rank-3 eta of the xz method (alp13/23/33 and eta_ijk
# have no z-quartet counterpart)
for _i in range(3):
    for _j in range(3):
        def _alp_xz(pen, st, i=_i, j=_j):
            v = _txz_coeff(pen, i, j, 0)
            return v if v is not None else jnp.zeros(())
        DIAG_REGISTRY.setdefault(f"alp{_i+1}{_j+1}", _alp_xz)
        for _k, _row in ((1, 1), (3, 2)):
            def _eta_xz(pen, st, i=_i, j=_j, row=_row):
                v = _txz_coeff(pen, i, j, row)
                return v if v is not None else jnp.zeros(())
            DIAG_REGISTRY[f"eta{_i+1}{_j+1}{_k}"] = _eta_xz

for _nm, _c, _col in (
        ("eta11", 0, 0), ("eta21", 1, 0), ("eta31", 2, 0),
        ("eta12", 0, 1), ("eta22", 1, 1), ("eta32", 2, 1)):
    DIAG_REGISTRY[_nm] = (lambda c, col: lambda pen, st:
                          _tf_eta(pen, st, c, col))(_c, _col)


def _tf_brms(pen, st, q):
    """bQPrms = <|b^q|²>^½, b^q = ∇×a^q (testfield_z.f90:1247-1265)."""
    if pen.cfg.module("testfield") is None:
        return jnp.zeros(())
    aij = jnp.stack([pen.d("aatest", j) for j in range(3)], axis=1)
    aq = aij[3 * q:3 * q + 3]
    b2 = ((aq[2, 1] - aq[1, 2]) ** 2 + (aq[0, 2] - aq[2, 0]) ** 2
          + (aq[1, 0] - aq[0, 1]) ** 2)
    return _vrms(pen, b2)


for _nm, _q in (("b11rms", 0), ("b21rms", 1), ("b12rms", 2),
                ("b22rms", 3)):
    DIAG_REGISTRY[_nm] = (lambda q: lambda pen, st:
                          _tf_brms(pen, st, q))(_q)


# ---- multisp_drag_eq deviation moments (special/multisp_drag_eq.f90) -------
def _mde(pen):
    return pen.cfg.module("multisp_drag_eq")


def _mk_rdu(fn):
    def g(pen, st):
        sp = _mde(pen)
        if sp is None:
            return jnp.zeros(())
        uu, rho = pen.uu(), pen.rho()
        dux = uu[0] - sp.ux0
        duy = uu[1] - sp.uy0
        return _vmean(pen, fn(rho, dux, duy, uu))
    return g


DIAG_REGISTRY["rduxm"] = _mk_rdu(lambda r, dx, dy, u: r * dx)
DIAG_REGISTRY["rduym"] = _mk_rdu(lambda r, dx, dy, u: r * dy)
DIAG_REGISTRY["rdux2m"] = _mk_rdu(lambda r, dx, dy, u: r * dx * dx)
DIAG_REGISTRY["rduy2m"] = _mk_rdu(lambda r, dx, dy, u: r * dy * dy)
DIAG_REGISTRY["rduxduym"] = _mk_rdu(lambda r, dx, dy, u: r * dx * dy)
DIAG_REGISTRY["ruz2m"] = _mk_rdu(lambda r, dx, dy, u: r * u[2] ** 2)
DIAG_REGISTRY["ruzduxm"] = _mk_rdu(lambda r, dx, dy, u: r * u[2] * dx)
DIAG_REGISTRY["ruzduym"] = _mk_rdu(lambda r, dx, dy, u: r * u[2] * dy)


def _mk_rhopdvp(fn):
    """Σ_par ρp_swarm·f(vp − vp_eq) / npar (sum_par_name semantics,
    special_calc_particles multisp_drag_eq.f90:193-237)."""
    def g(pen, st):
        p = st.get("particles")
        if p is None or "rhopswarm" not in p or "vp_eq" not in p:
            return jnp.zeros(())
        vp = p["vp"]
        dvx = vp[:, 0] - p["vp_eq"][:, 0]
        dvy = vp[:, 1] - p["vp_eq"][:, 1]
        return jnp.mean(p["rhopswarm"] * fn(dvx, dvy, vp))
    return g


DIAG_REGISTRY["rhopdvpxm"] = _mk_rhopdvp(lambda dx, dy, vp: dx)
DIAG_REGISTRY["rhopdvpym"] = _mk_rhopdvp(lambda dx, dy, vp: dy)
DIAG_REGISTRY["rhopdvpx2m"] = _mk_rhopdvp(lambda dx, dy, vp: dx * dx)
DIAG_REGISTRY["rhopdvpy2m"] = _mk_rhopdvp(lambda dx, dy, vp: dy * dy)
DIAG_REGISTRY["rhopvpz2m"] = _mk_rhopdvp(lambda dx, dy, vp: vp[:, 2] ** 2)


def _rhop_dev(pen, st):
    sp = _mde(pen)
    p = st.get("particles")
    if sp is None or p is None:
        return None
    pmod = pen.cfg.module("particles")
    rho0 = pen.eos.rho0 if pen.eos is not None else 1.0
    rhop = pmod.rhop(p, pen, pen.cfg.grid)
    return rhop - sp.eps_dtog * rho0


@diag("drhopm")
def _drhopm(pen, st):
    d = _rhop_dev(pen, st)
    return jnp.zeros(()) if d is None else _vmean(pen, d)


@diag("drhop2m")
def _drhop2m(pen, st):
    d = _rhop_dev(pen, st)
    return jnp.zeros(()) if d is None else _vmean(pen, d * d)


# ---- particle-swarm statistics (particles_dust.f90:301-330) ----------------
def _pp(st):
    return st.get("particles")


def _mk_pstat(fn):
    def g(pen, st):
        p = _pp(st)
        if p is None:
            return jnp.zeros(())
        return fn(pen, p)
    return g


for _i, _c in enumerate("xyz"):
    DIAG_REGISTRY[f"{_c}pm"] = _mk_pstat(
        lambda pen, p, i=_i: jnp.mean(p["xp"][:, i]))
    DIAG_REGISTRY[f"vp{_c}2m"] = _mk_pstat(
        lambda pen, p, i=_i: jnp.mean(p["vp"][:, i] ** 2))
DIAG_REGISTRY["vpym"] = _mk_pstat(lambda pen, p: jnp.mean(p["vp"][:, 1]))
DIAG_REGISTRY["vpzm"] = _mk_pstat(lambda pen, p: jnp.mean(p["vp"][:, 2]))
DIAG_REGISTRY["vpmax"] = _mk_pstat(
    lambda pen, p: jnp.sqrt(jnp.max(jnp.sum(p["vp"] ** 2, axis=1))))


@diag("ekinp")
def _ekinp(pen, st):
    """particle kinetic energy Σ ½ m_p v_p² (idiag_ekinp)."""
    p = _pp(st)
    if p is None:
        return jnp.zeros(())
    pmod = pen.cfg.module("particles")
    gs = pen.cfg.grid
    eps = pmod.eps_dtog if pmod.eps_dtog > 0 else 1.0
    mp = eps * gs.Lx * gs.Ly * gs.Lz / pmod.npar
    return 0.5 * mp * jnp.sum(p["vp"] ** 2)


@diag("nmigmax")
def _nmigmax(pen, st):
    """Max over (virtual) ranks of migrating particles
    (particles_mpicomm.f90:523-524)."""
    p = _pp(st)
    if p is None or "nmig" not in p:
        return jnp.zeros(())
    return p["nmig"]


# blocks-decomposition variant (particles_mpicomm_blocks.f90 nmig_max
# over bricks) — same virtual-rank count here
DIAG_REGISTRY["nmigmmax"] = _nmigmax


@diag("dedragp")
def _dedragp(pen, st):
    """Volume-mean gas heating by particle drag (particles_dust.f90:
    4824-4835): drag_heat = Σ_k m_p/V_cell·τ_s,k⁻¹·|v_p−u|², averaged by
    sum_mn_name → Σ_k ρp_swarm,k·τ⁻¹·up2_k / nwgrid."""
    p = _pp(st)
    if p is None:
        return jnp.zeros(())
    pmod = pen.cfg.module("particles")
    gs = pen.cfg.grid
    xp, vp = p["xp"], p["vp"]
    if "uu" in pen.reg.slots:
        from ..particles.interp import interpolate
        ug = interpolate(pen.fg[pen.reg.slice("uu")], xp, gs,
                         pmod.scheme).T
    else:
        ug = jnp.zeros_like(vp)
    if "taus" in p:
        t1 = 1.0 / p["taus"]
    else:
        t1 = 1.0 / pmod.tausp if pmod.tausp > 0.0 else 0.0
    if "rhopswarm" in p:
        mpv = p["rhopswarm"]
    else:
        eps = pmod.eps_dtog if pmod.eps_dtog > 0 else 1.0
        dV = gs.dx * gs.dy * gs.dz
        mpv = eps * gs.Lx * gs.Ly * gs.Lz / pmod.npar / dV
    if getattr(pmod, "ldragforce_gas_par", False):
        up2 = jnp.sum((vp - ug) ** 2, axis=1)
    else:
        up2 = jnp.sum(vp * (vp - ug), axis=1)
    nw = 1
    for n_ in gs.shape:
        if n_ > 1:
            nw *= n_
    return jnp.sum(mpv * t1 * up2) / nw


def _np_cells(pen, p):
    """NGP particle count per cell (the reference's np aux)."""
    from ..particles.interp import deposit
    gs = pen.cfg.grid
    ones = jnp.ones((p["xp"].shape[0],), p["xp"].dtype)
    return deposit(ones, p["xp"], gs, gs.shape, "ngp",
                   dtype=p["xp"].dtype)


DIAG_REGISTRY["npmax"] = _mk_pstat(
    lambda pen, p: jnp.max(_np_cells(pen, p)))
DIAG_REGISTRY["npmin"] = _mk_pstat(
    lambda pen, p: jnp.min(_np_cells(pen, p)))
DIAG_REGISTRY["npm"] = _mk_pstat(
    lambda pen, p: jnp.mean(_np_cells(pen, p)))
DIAG_REGISTRY["np2m"] = _mk_pstat(
    lambda pen, p: jnp.mean(_np_cells(pen, p) ** 2))
# nparmax/min report the per-RANK npar_loc (diagnostics over the
# reference's compile-time proc grid; uniform loading assumed)
DIAG_REGISTRY["nparmax"] = _mk_pstat(
    lambda pen, p: jnp.asarray(float(
        p["xp"].shape[0]
        / max(getattr(pen.cfg.module("particles"), "ncpus_ref", 1), 1))))
DIAG_REGISTRY["nparmin"] = _mk_pstat(
    lambda pen, p: jnp.asarray(float(
        p["xp"].shape[0]
        / max(getattr(pen.cfg.module("particles"), "ncpus_ref", 1), 1))))


def _mk_apstat(fn):
    """particles_radius diagnostics (particles_radius.f90 idiag_ap*):
    zeros when the run carries no per-particle radii."""
    def g(pen, st):
        p = _pp(st)
        if p is None or "ap" not in p:
            return jnp.zeros(())
        return fn(pen, p)
    return g


DIAG_REGISTRY["apm"] = _mk_apstat(lambda pen, p: jnp.mean(p["ap"]))
DIAG_REGISTRY["ap2m"] = _mk_apstat(lambda pen, p: jnp.mean(p["ap"] ** 2))
DIAG_REGISTRY["apmin"] = _mk_apstat(lambda pen, p: jnp.min(p["ap"]))
DIAG_REGISTRY["apmax"] = _mk_apstat(lambda pen, p: jnp.max(p["ap"]))
DIAG_REGISTRY["npswarmm"] = _mk_apstat(
    lambda pen, p: jnp.mean(p.get("npswarm", jnp.zeros(()))))
# mean coagulation events per particle in the last MC sweep (reference
# sum_par_name(ncoll_par), particles_coagulation.f90:764-765)
DIAG_REGISTRY["ncoagpm"] = _mk_apstat(
    lambda pen, p: jnp.mean(p.get("ncoagp", jnp.zeros(()))))


@diag("decollp")
def _decollp(pen, st):
    """Collisional heating of the gas (particles_dust.f90:6089
    sum_mn_name(coll_heat)); zero unless collisional cooling is
    configured — our dust module does not dissipate collision energy
    into the gas, matching lcollision_cooling=F runs."""
    if st.get("particles") is None:
        return jnp.zeros(())
    return jnp.zeros(())


def _mpt(pen, p):
    """Total particle mass Σ (4π/3)ρ_mat·a³·n_swarm·dV
    (particles_dust.f90:3490-3496 integrate_par_name)."""
    pmod = pen.cfg.module("particles")
    gs = pen.cfg.grid
    dV = 1.0
    for L, n in ((gs.Lx, gs.nx), (gs.Ly, gs.ny), (gs.Lz, gs.nz)):
        if n > 1:
            dV *= L / n
    if "rhopswarm" in p:
        return jnp.sum(p["rhopswarm"]) * dV
    nsw = p.get("npswarm", jnp.ones_like(p["ap"]))
    return jnp.sum(4.1887902047863905 * pmod.rhopmat
                   * p["ap"] ** 3 * nsw) * dV


DIAG_REGISTRY["mpt"] = _mk_apstat(_mpt)


@diag("mcct")
def _mcct(pen, st):
    """∫ρ·cc dV (pscalar_nolog.f90:726 idiag_mcct)."""
    if "cc" not in pen.reg.slots:
        return jnp.zeros(())
    gs = pen.cfg.grid
    vol = 1.0
    for L, n in ((gs.Lx, gs.nx), (gs.Ly, gs.ny), (gs.Lz, gs.nz)):
        if n > 1:
            vol *= L
    return _vmean(pen, pen.rho() * pen.field("cc")) * vol
# radius-distribution moments Σ n_swarm·a^k / nwgrid
# (particles_number.f90:398-408; log10 for k ≥ 12)
def _mk_admom(k):
    def g(pen, p):
        gs = pen.cfg.grid
        nw = float(gs.nx * gs.ny * gs.nz)
        nsw = p.get("npswarm", jnp.ones_like(p["ap"]))
        val = jnp.sum(nsw * p["ap"] ** float(k)) / nw
        return jnp.log10(jnp.maximum(val, 1e-300)) if k >= 12 else val
    return _mk_apstat(g)


for _k in (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 24):
    DIAG_REGISTRY[f"admom{_k}"] = _mk_admom(_k)


@diag("emag")
def _emag(pen, st):
    """∫B²/(2µ₀) dV (magnetic.f90:533, integrate_mn_name at :5766)."""
    mag = pen.cfg.module("magnetic")
    mu0 = getattr(mag, "mu0", 1.0) if mag is not None else 1.0
    return _vint(pen, 0.5 * pen.b2() / mu0)


@diag("vArms")
def _varms(pen, st):
    return _vrms(pen, pen.va2())


@diag("jmax")
def _jmax(pen, st):
    return jnp.sqrt(jnp.max(pen.j2()))


@diag("omax")
def _omax(pen, st):
    oo = pen.oo()
    return jnp.sqrt(jnp.max(oo[0] ** 2 + oo[1] ** 2 + oo[2] ** 2))


@diag("vAmax")
def _vamax(pen, st):
    return jnp.sqrt(jnp.max(pen.va2()))


@diag("mass")
def _mass(pen, st):
    """Total mass: <ρ>·V_box (reference 'mass' diagnostic); degenerate
    axes contribute dVol=1 (cparam nxgrid==1 → dx=1 in dVol)."""
    if not _has_density(pen):
        return jnp.zeros(())
    gs = pen.cfg.grid
    vol = 1.0
    for L, n in ((gs.Lx, gs.nx), (gs.Ly, gs.ny), (gs.Lz, gs.nz)):
        if n > 1:
            vol *= L
    return jnp.mean(pen.rho()) * vol


@diag("ccmax")
def _ccmax(pen, st):
    return jnp.max(pen.field("cc"))


@diag("ccm")
def _ccm(pen, st):
    return _vmean(pen, pen.field("cc"))


@diag("abmn")
def _abmn(pen, st):
    """<A·B> over the northern half (z > mid; reference lequatorz)."""
    aa, bb = pen.aa(), pen.bb()
    ab = sum(aa[a] * bb[a] for a in range(3))
    nz = ab.shape[2]
    return jnp.mean(ab[:, :, nz // 2:])


@diag("abms")
def _abms(pen, st):
    aa, bb = pen.aa(), pen.bb()
    ab = sum(aa[a] * bb[a] for a in range(3))
    nz = ab.shape[2]
    return jnp.mean(ab[:, :, : nz // 2])


@diag("bmx")
def _bmx(pen, st):
    """Energy of the yz-averaged mean field:
    √<B̄_y(x)²+B̄_z(x)²>_x (magnetic.f90 calc_bmx — the components
    TRANSVERSE to the average direction carry the dynamo mean field)."""
    bb = pen.bb()
    by = jnp.mean(bb[1], axis=(1, 2))
    bz = jnp.mean(bb[2], axis=(1, 2))
    return jnp.sqrt(jnp.mean(by ** 2 + bz ** 2))


@diag("bmy")
def _bmy(pen, st):
    bb = pen.bb()
    bx = jnp.mean(bb[0], axis=(0, 2))
    bz = jnp.mean(bb[2], axis=(0, 2))
    return jnp.sqrt(jnp.mean(bx ** 2 + bz ** 2))


@diag("bmz")
def _bmz(pen, st):
    """√<B̄_x(z)²+B̄_y(z)²>_z (magnetic.f90 calc_bmz via fnamez)."""
    bb = pen.bb()
    bx = jnp.mean(bb[0], axis=(0, 1))
    by = jnp.mean(bb[1], axis=(0, 1))
    return jnp.sqrt(jnp.mean(bx ** 2 + by ** 2))


@diag("xp2m")
def _xp2m(pen, st):
    return jnp.mean(st["particles"]["xp"][:, 0] ** 2)


@diag("yp2m")
def _yp2m(pen, st):
    return jnp.mean(st["particles"]["xp"][:, 1] ** 2)


@diag("zp2m")
def _zp2m(pen, st):
    return jnp.mean(st["particles"]["xp"][:, 2] ** 2)


@diag("vpxm")
def _vpxm(pen, st):
    return jnp.mean(st["particles"]["vp"][:, 0])


@diag("vprms")
def _vprms(pen, st):
    vp = st["particles"]["vp"]
    return jnp.sqrt(jnp.mean(jnp.sum(vp * vp, axis=1)))


# particles_lyapunov passive-vector diagnostics (particles_lyapunov.f90
# :152-162 sum_par_name(bp_i²)); zero when the sub-physics is off
for _i, _c in enumerate("xyz"):
    def _bp2pm(pen, st, i=_i):
        p = st.get("particles") or {}
        if "bp" not in p:
            return jnp.zeros(())
        return jnp.mean(p["bp"][:, i] ** 2)
    DIAG_REGISTRY[f"b{_c}2pm"] = _bp2pm


# ---- interstellar heat/cool + heating-rate dt diagnostics -----------------
def _ism_hc(pen):
    ism = pen.cfg.module("interstellar")
    if ism is None or "ss" not in pen.reg.slots:
        return None
    return ism.heat_cool(pen)


def _ee_pen(pen):
    e = pen.eos
    g = getattr(e, "gamma", 5.0 / 3.0)
    return pen.cs2() / (g * (g - 1.0)) if g != 1.0 else pen.cs2()


def _hmax_rate(pen):
    """Hmax/ee: net heating rate per thermal energy (entropy.f90:3484;
    Hmax accumulates interstellar heat−cool :1855 and the full viscous
    heating incl. shock viscosity, viscosity.f90:2567)."""
    hc = _ism_hc(pen)
    hm = 0.0
    if hc is not None:
        hm = hm + (hc[0] - hc[1])
    visc = pen.cfg.module("viscosity")
    if visc is not None and "uu" in pen.reg.slots:
        vh = pen._cache.get("visc_heat")
        if vh is None:
            from ..physics.base import TimestepAccum
            try:
                visc.rhs(pen, {}, TimestepAccum())
            except Exception:
                pass
            vh = pen._cache.get("visc_heat")
        if vh is not None:
            hm = hm + vh
    if isinstance(hm, float):
        return None
    return hm / _ee_pen(pen)


def _ss0_rate(pen):
    """|df(ss)|·cv1 from the full assembled RHS (lthdiff_Hmax,
    entropy.f90:3440-3443)."""
    from ..physics.base import TimestepAccum
    df_, ts_ = {}, TimestepAccum()
    for m_ in pen.cfg.modules:
        try:
            m_.rhs(pen, df_, ts_)
        except Exception:
            pass
    if "ss" not in df_:
        return None
    dss = df_["ss"]
    if getattr(dss, "ndim", 3) == 4:
        dss = dss[0]
    e = pen.eos
    return jnp.abs(dss) * (e.gamma / e.cp)


def _lthdiff(pen):
    ent = pen.cfg.module("entropy")
    return ent is not None and getattr(ent, "lthdiff_Hmax", False)


@diag("Hmax")
def _hmax_diag(pen, st):
    # NOT branched on lthdiff_Hmax (entropy.f90:3484)
    r = _hmax_rate(pen)
    return jnp.max(r) if r is not None else jnp.zeros(())


@diag("dtH")
def _dth_diag(pen, st):
    r = _ss0_rate(pen) if _lthdiff(pen) else _hmax_rate(pen)
    if r is None:
        return jnp.zeros(())
    cdts = pen.cfg.time.cdts if pen.cfg is not None else 1.0
    return st["dt"] * jnp.max(r) / cdts


@diag("tauhmin")
def _tauhmin_diag(pen, st):
    r = _ss0_rate(pen) if _lthdiff(pen) else _hmax_rate(pen)
    return 1.0 / jnp.max(r) if r is not None else jnp.zeros(())


@diag("Hmax_ism")
def _hmax_ism(pen, st):
    """max of the positive net entropy source ×cv1
    (interstellar.f90:1831-1834)."""
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    heatcool = jnp.exp(-pen.lnTT()) * (hc[0] - hc[1])
    e = pen.eos
    cv1 = e.gamma / e.cp
    return jnp.max(jnp.maximum(heatcool, 0.0) * cv1)


@diag("taucmin")
def _taucmin(pen, st):
    """reciprocal max of the net cooling rate ×cv1 (:1836-1839)."""
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    heatcool = jnp.exp(-pen.lnTT()) * (hc[0] - hc[1])
    netcool = jnp.where(heatcool < 0.0, -heatcool, 1.0e-6)
    e = pen.eos
    cv1 = e.gamma / e.cp
    return 1.0 / jnp.max(netcool * cv1)


@diag("Lamm")
def _lamm(pen, st):
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    return _vmean(pen, hc[1] / (pen.rho() * pen.TT()))


@diag("nrhom")
def _nrhom(pen, st):
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    return _vmean(pen, hc[1] / _ee_pen(pen))


@diag("rhoLm")
def _rholm(pen, st):
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    return _vmean(pen, hc[1] / pen.TT())


@diag("Gamm")
def _gamm(pen, st):
    hc = _ism_hc(pen)
    if hc is None:
        return jnp.zeros(())
    return _vmean(pen, hc[0] / pen.TT())


def _fmax_hydro(pen):
    """Fmax = max|du/dt|/ulev with df sampled at the END of duu_dt like
    the reference (hydro.f90:3910-3916) — advection + Coriolis + viscous
    force only: the pressure gradient lands later (entropy.f90:3299) and
    gravity later still (equ.f90:990)."""
    from ..physics.base import TimestepAccum
    hyd = pen.cfg.module("hydro")
    df_, ts_ = {}, TimestepAccum()
    for nm in ("hydro", "viscosity"):
        m_ = pen.cfg.module(nm)
        if m_ is None:
            continue
        try:
            m_.rhs(pen, df_, ts_)
        except Exception:  # needs unavailable state
            pass
    if "uu" not in df_:
        return None
    duu = df_["uu"] - pen.fpres()
    return jnp.max(jnp.abs(duu)) / getattr(hyd, "ulev", 1.0)


@diag("dtF")
def _dtf(pen, st):
    """force-limited dt fraction (hydro.f90:3910-3916, :3955): Fmax =
    max|du/dt|/ulev over the assembled momentum RHS."""
    hyd = pen.cfg.module("hydro")
    if hyd is None or not getattr(hyd, "lcdt_tauf", False):
        return jnp.zeros(())
    fmax = _fmax_hydro(pen)
    if fmax is None:
        return jnp.zeros(())
    return st["dt"] * fmax / getattr(hyd, "cdt_tauf", 1.0)


@diag("taufmin")
def _taufmin(pen, st):
    hyd = pen.cfg.module("hydro")
    if hyd is None or not getattr(hyd, "lcdt_tauf", False):
        return jnp.zeros(())
    fmax = _fmax_hydro(pen)
    if fmax is None:
        return jnp.zeros(())
    return 1.0 / fmax


def _fvisc(pen):
    """Viscous force from the viscosity module alone (p%fvisc)."""
    if "fvisc" in pen._cache:
        return pen._cache["fvisc"]
    visc = pen.cfg.module("viscosity")
    if visc is None or "uu" not in pen.reg.slots:
        return None
    from ..physics.base import TimestepAccum
    df_ = {}
    try:
        visc.rhs(pen, df_, TimestepAccum())
    except Exception:
        return None
    fv = df_.get("uu")
    pen._cache["fvisc"] = fv
    return fv


@diag("fviscm")
def _fviscm(pen, st):
    fv = _fvisc(pen)
    if fv is None:
        return jnp.zeros(())
    return _vrms(pen, jnp.sum(fv * fv, axis=0))


@diag("fviscmax")
def _fviscmax(pen, st):
    fv = _fvisc(pen)
    if fv is None:
        return jnp.zeros(())
    return jnp.sqrt(jnp.max(jnp.sum(fv * fv, axis=0)))


@diag("fviscmin")
def _fviscmin(pen, st):
    fv = _fvisc(pen)
    if fv is None:
        return jnp.zeros(())
    return jnp.min(jnp.sqrt(jnp.sum(fv * fv, axis=0)))


def _plasma_beta(pen):
    """β = 2µ0·p/B² (bfield.f90 beta pencil / magnetic beta1 inverse)."""
    mag = pen.cfg.module("magnetic") or pen.cfg.module("bfield")
    mu0 = getattr(mag, "mu0", 1.0) if mag is not None else 1.0
    pp = pen.rho() * pen.cs2() / getattr(pen.eos, "gamma", 5.0 / 3.0)
    return 2.0 * mu0 * pp / jnp.maximum(pen.b2(), 1e-30)


@diag("betamax")
def _betamax(pen, st):
    return jnp.max(_plasma_beta(pen))


@diag("betamin")
def _betamin(pen, st):
    return jnp.min(_plasma_beta(pen))


@diag("dtrad")
def _dtrad(pen, st):
    """dt·max(dt1_rad) (radiation_ray.f90:1699, l_dt)."""
    rad = pen.cfg.module("radiation")
    if rad is None:
        return jnp.zeros(())
    if "dt1_rad" not in pen._cache:
        from ..physics.base import TimestepAccum
        try:
            rad.rhs(pen, {}, TimestepAccum())
        except Exception:
            return jnp.zeros(())
    r = pen._cache.get("dt1_rad")
    return st["dt"] * jnp.max(r) if r is not None else jnp.zeros(())


@diag("ugrhom")
def _ugrhom(pen, st):
    """<u·∇ρ> (density.f90 idiag_ugrhom, ugrho pencil)."""
    if "uu" not in pen.reg.slots or not _has_density(pen):
        return jnp.zeros(())
    uu = pen.uu()
    if "rho" in pen.reg.slots:
        gr = pen.grad("rho")
    else:
        gr = pen.grad("lnrho") * pen.rho()[None]
    return _vmean(pen, sum(uu[a] * gr[a] for a in range(3)))


@diag("divrhoum")
def _divrhoum(pen, st):
    """<ρ∇·u + u·∇ρ> = <∇·(ρu)> (hydro.f90:4020 divrhou)."""
    if "uu" not in pen.reg.slots or not _has_density(pen):
        return jnp.zeros(())
    uu = pen.uu()
    if "rho" in pen.reg.slots:
        gr = pen.grad("rho")
    else:
        gr = pen.grad("lnrho") * pen.rho()[None]
    ug = sum(uu[a] * gr[a] for a in range(3))
    return _vmean(pen, pen.rho() * pen.divu() + ug)


@diag("divrhourms")
def _divrhourms(pen, st):
    if "uu" not in pen.reg.slots or not _has_density(pen):
        return jnp.zeros(())
    uu = pen.uu()
    if "rho" in pen.reg.slots:
        gr = pen.grad("rho")
    else:
        gr = pen.grad("lnrho") * pen.rho()[None]
    ug = sum(uu[a] * gr[a] for a in range(3))
    return _vrms(pen, (pen.rho() * pen.divu() + ug) ** 2)


@diag("divrhoumax")
def _divrhoumax(pen, st):
    if "uu" not in pen.reg.slots or not _has_density(pen):
        return jnp.zeros(())
    uu = pen.uu()
    if "rho" in pen.reg.slots:
        gr = pen.grad("rho")
    else:
        gr = pen.grad("lnrho") * pen.rho()[None]
    ug = sum(uu[a] * gr[a] for a in range(3))
    return jnp.max(pen.rho() * pen.divu() + ug)


# ---- selfgravity diagnostics (selfgravity.f90:466-505) --------------------
def _potself(pen):
    return pen.field("gpotself") if "gpotself" in pen.reg.slots else None


@diag("potselfm")
def _potselfm(pen, st):
    p = _potself(pen)
    return _vmean(pen, p) if p is not None else jnp.zeros(())


@diag("potself2m")
def _potself2m(pen, st):
    p = _potself(pen)
    return _vmean(pen, p * p) if p is not None else jnp.zeros(())


for _i, _c in enumerate("xyz"):
    def _gpm(pen, st, i=_i):
        if "gpotself" not in pen.reg.slots:
            return jnp.zeros(())
        return _vmean(pen, pen.grad("gpotself")[i])
    DIAG_REGISTRY[f"gpotself{_c}m"] = _gpm

    def _gp2m(pen, st, i=_i):
        if "gpotself" not in pen.reg.slots:
            return jnp.zeros(())
        return _vmean(pen, pen.grad("gpotself")[i] ** 2)
    DIAG_REGISTRY[f"gpotself{_c}2m"] = _gp2m

for _nm, _a, _b in (("gxgym", 0, 1), ("gxgzm", 0, 2), ("gygzm", 1, 2)):
    def _gxy(pen, st, a=_a, b=_b):
        if "gpotself" not in pen.reg.slots:
            return jnp.zeros(())
        g = pen.grad("gpotself")
        return _vmean(pen, g[a] * g[b])
    DIAG_REGISTRY[_nm] = _gxy


def _qtoomre_field(pen):
    sg = pen.cfg.module("selfgravity")
    if sg is None:
        return None
    kap = sg.kappa
    if kap == 0.0:
        hyd = pen.cfg.module("hydro")
        kap = float(getattr(hyd, "Omega", 0.0)) if hyd is not None else 0.0
    G = sg.gravitational_const
    return kap * jnp.sqrt(pen.cs2()) / (G * jnp.pi * pen.rho())


@diag("qtoomre")
def _qtoomre(pen, st):
    q = _qtoomre_field(pen)
    return _vmean(pen, q) if q is not None else jnp.zeros(())


@diag("qtoomremin")
def _qtoomremin(pen, st):
    q = _qtoomre_field(pen)
    return jnp.min(q) if q is not None else jnp.zeros(())


@diag("qtoomremax")
def _qtoomremax(pen, st):
    q = _qtoomre_field(pen)
    return jnp.max(q) if q is not None else jnp.zeros(())


@diag("trsigmapm")
def _trsigmapm(pen, st):
    """<Tr σ> over particles (particles_caustics.f90:181 TrSigmapm)."""
    p = st.get("particles") or {}
    if "sigmap" not in p:
        return jnp.zeros(())
    s = p["sigmap"]
    return jnp.mean(s[:, 0] + s[:, 4] + s[:, 8])


@diag("blowupm")
def _blowupm(pen, st):
    p = st.get("particles") or {}
    if "blowup" not in p:
        return jnp.zeros(())
    return jnp.mean(p["blowup"])


@diag("lnVpm")
def _lnvpm(pen, st):
    p = st.get("particles") or {}
    if "lnVp" not in p:
        return jnp.zeros(())
    return jnp.mean(p["lnVp"])


def _vp_cell_var(pen, st):
    """Per-cell particle-velocity variance summed over components
    (particles_dust.f90:6158-6208: dvpm = sqrt(<(vp − <vp>_cell)²>),
    nearest-grid-point binning)."""
    gs = pen.cfg.grid
    xp = st["particles"]["xp"]
    vp = st["particles"]["vp"]
    idx = []
    for a, (q0, L, n) in enumerate(((gs.x0, gs.Lx, gs.nx),
                                    (gs.y0, gs.Ly, gs.ny),
                                    (gs.z0, gs.Lz, gs.nz))):
        i = jnp.clip(jnp.floor((xp[:, a] - q0) / (L / n)).astype(int),
                     0, n - 1)
        idx.append(i)
    flat = (idx[0] * gs.ny + idx[1]) * gs.nz + idx[2]
    ncell = gs.nx * gs.ny * gs.nz
    cnt = jnp.zeros(ncell).at[flat].add(1.0)
    var = 0.0
    for a in range(3):
        s1 = jnp.zeros(ncell).at[flat].add(vp[:, a])
        s2 = jnp.zeros(ncell).at[flat].add(vp[:, a] ** 2)
        c = jnp.maximum(cnt, 1.0)
        var = var + s2 / c - (s1 / c) ** 2
    return jnp.where(cnt > 0, var, 0.0)


@diag("dvpm")
def _dvpm(pen, st):
    return jnp.sqrt(jnp.mean(_vp_cell_var(pen, st)))


@diag("dvpmax")
def _dvpmax(pen, st):
    return jnp.sqrt(jnp.max(_vp_cell_var(pen, st)))


@diag("vpxmin")
def _vpxmin(pen, st):
    return jnp.min(st["particles"]["vp"][:, 0])


@diag("vpymin")
def _vpymin(pen, st):
    return jnp.min(st["particles"]["vp"][:, 1])


@diag("vpzmin")
def _vpzmin(pen, st):
    return jnp.min(st["particles"]["vp"][:, 2])


def _vp_masked(st, comp):
    """Signed max over ACTIVE particles (removed particles are masked;
    the reference compacts npar_loc instead)."""
    vp = st["particles"]["vp"][:, comp]
    act = st["particles"].get("active")
    if act is not None:
        vp = jnp.where(act > 0.5, vp, -jnp.inf)
    return jnp.max(vp)


@diag("vpxmax")
def _vpxmax(pen, st):
    return _vp_masked(st, 0)


@diag("vpymax")
def _vpymax(pen, st):
    return _vp_masked(st, 1)


@diag("vpzmax")
def _vpzmax(pen, st):
    return _vp_masked(st, 2)


def _rhop(pen, st):
    dust = pen.cfg.module("particles")
    shear = pen.cfg.module("shear")
    sdy = (shear.deltay(st["t"], pen.cfg.grid.Lx, pen.cfg.grid.Ly)
           if shear is not None else None)
    return dust.rhop(st["particles"], pen, pen.cfg.grid, shear_dy=sdy)


@diag("rhopm")
def _rhopm(pen, st):
    """Mean particle mass density (particles_dust idiag_rhopm via the
    TSC deposit, src/particles_map.f90)."""
    return _vmean(pen, _rhop(pen, st))


@diag("rhopmin")
def _rhopmin(pen, st):
    return jnp.min(_rhop(pen, st))


@diag("rhopmax")
def _rhopmax(pen, st):
    return jnp.max(_rhop(pen, st))


def make_diagnostics(model, names: Iterable[str], allow_unknown=False):
    """Build a jitted evaluator: state → {name: scalar} for the requested
    diagnostic columns (plus it/t/dt pulled straight from state)."""
    cfg = model.cfg
    reg = model.reg
    grid = model.grid
    eos = model.eos
    special = {"it", "t", "dt"}
    # timestep-fraction columns (reference dtc/dtu/dtnu/dtchi) need the CFL
    # accumulators; recompute cheap proxies from pencils
    names = list(names)
    import re as _re
    has_chem = "chem" in reg.slots

    def _chem_diag(n):
        # Y<k>m: mean mass fraction of chemistry species k (chemistry.f90
        # idiag_Ym); e_intm prints 0 in the reference H2-ignition golden
        # (the diagnostic is requested but unclaimed → stays 0)
        return has_chem and (_re.fullmatch(r"Y\d+m", n) or n == "e_intm"
                             or n == "ppm")

    dustbins = cfg.module("dustbins")

    def _dust_diag(n):
        # ndm<k-1>/ndmt/rhodmt — per-bin and total dust densities
        # (dustdensity.f90:2102,2145-2153; sdust = itoa(k-1))
        return dustbins is not None and (
            _re.fullmatch(r"ndm\d+", n) or n in ("ndmt", "rhodmt"))

    has_pm = model.pointmasses is not None
    gwmod = cfg.module("gravitational_waves")

    def _gw_diag(n):
        # EEGW/gg2m/hrms: sums over Fourier modes stored in the 'gw' aux
        # slot (gravitational_waves_hTXk.f90:1004-1027; sum_mn of
        # per-mode squares × nwgrid == plain mode sum)
        return gwmod is not None and n in ("EEGW", "gg2m", "hrms")

    def _pm_diag(n):
        # xq<k>/yq<k>/zq<k>, vxq<k>/... — per-point-mass positions and
        # velocities (pointmasses.f90 idiag_xxq/idiag_vvq)
        return has_pm and _re.fullmatch(r"v?[xyz]q\d+", n)

    def _sumlim_diag(n):
        # annulus-integrated diagnostics (sum_lim_mn_name,
        # diagnostics.f90: r_int ≤ r ≤ r_ext): planet-disk torques and
        # totals (pointmasses.f90:890-935, :1605-1690; hydro.f90:4070
        # totangmom; entropy.f90:3591 TTp)
        if _re.fullmatch(r"torq(int|ext)_\d+", n):
            return has_pm
        if n in ("totenergy",):
            return has_pm
        return n in ("totangmom", "TTp")
    unknown = [n for n in names
               if n not in DIAG_REGISTRY and n not in special
               and n not in ("dtc", "dtu", "dtnu", "dtchi", "dtv",
                             "dtdiffus", "dtdragp", "dtb", "dteta",
                             "dtd", "nshift")
               and not _chem_diag(n) and not _pm_diag(n)
               and not _sumlim_diag(n)
               and not _gw_diag(n) and not _dust_diag(n)]
    if unknown:
        if not allow_unknown:
            raise KeyError(f"unknown diagnostics: {unknown}")
        # reference parse_name semantics: labels no module claims stay 0
        # in fname and print as zeros (diagnostics.f90 prints)
        unknown_set = frozenset(unknown)
        names = [n for n in names]
    else:
        unknown_set = frozenset()

    @jax.jit
    def evaluate(state):
        if reg.nf == 0:
            # mvar=0 runs: only state scalars and particle/point-mass
            # diagnostics are meaningful
            g = cfg.grid.nghost
            fa = jnp.zeros((0, cfg.grid.nx + 2 * g, cfg.grid.ny + 2 * g,
                            cfg.grid.nz + 2 * g))
            fg = fa
        else:
            fa = reg.stack(state["fields"])
            fg = fill_ghosts(fa[: reg.ncom], cfg.grid,
                             (cfg.bcx, cfg.bcy, cfg.bcz), reg, grid, cfg,
                             eos)
        pen = Pencils(fg, grid, reg, cfg, eos)
        if model._aux_modules:
            # reference samples diagnostics in the NEXT iteration's first
            # substep — its shock profile is rebuilt from the current f
            fg = model.apply_aux(fg, pen, grid)
            pen = Pencils(fg, grid, reg, cfg, eos)
        out = {}
        dt = state["dt"]
        for n in names:
            if n in unknown_set:
                out[n] = jnp.zeros(())
            elif n == "it":
                out[n] = state["it"]
            elif n == "t":
                out[n] = state["t"]
            elif n == "dt":
                out[n] = dt
            elif n == "dtc":
                # sound-speed fraction: dt·max(sqrt(cs²·Σ Δ⁻²))/cdt —
                # line elements are metric-aware (1/(r dφ) off-cartesian)
                d1 = pen.dline_1()
                dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
                out[n] = dt * jnp.sqrt(jnp.max(pen.cs2() * dxyz2)) / cfg.time.cdt
            elif n == "dtu":
                d1 = pen.dline_1()
                uu = pen.uu()
                adv = sum(jnp.abs(uu[a]) * d1[a] for a in range(3))
                out[n] = dt * jnp.max(adv) / cfg.time.cdt
            elif n == "dtv":
                # dt·max(maxadvec)/cdt (equ.f90:1177): velocity advection
                # plus the wave-speed root (sound + Alfvén when present)
                d1 = pen.dline_1()
                if "uu" in reg.slots:
                    uu = pen.uu()
                    adv = sum(jnp.abs(uu[a]) * d1[a] for a in range(3))
                else:
                    adv = jnp.zeros(())
                adv2 = 0.0
                if eos is not None and ("lnrho" in reg.slots
                                        or "rho" in reg.slots):
                    adv2 = adv2 + pen.cs2() * (d1[0] ** 2 + d1[1] ** 2
                                               + d1[2] ** 2)
                bfm = cfg.module("bfield")
                if bfm is not None:
                    bt = pen.field("bb") + jnp.asarray(
                        bfm.B_ext, fa.dtype)[:, None, None, None]
                    adv2 = adv2 + sum((bt[a] * d1[a]) ** 2
                                      for a in range(3)) * pen.rho1()
                sw = cfg.module("shallow_water")
                if sw is not None:
                    # shallow-water gravity-wave class joins advec2
                    # (special/shallow_water.f90:472-475)
                    h0_ = sw._h0(pen.grid.xg, pen.grid.yg)
                    dxyz2_ = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
                    adv2 = adv2 + (pen.field("rho") + h0_) ** 2 * dxyz2_
                if not isinstance(adv2, float):
                    adv = adv + jnp.sqrt(adv2)
                out[n] = dt * jnp.max(adv) / cfg.time.cdt
            elif n == "dtdiffus":
                # dt·(maxdiffus·dxyz₂/cdtv + maxdiffus3·dxyz₆/cdtv3) from a
                # fresh accumulator pass over the module rhs hooks (the
                # same classes cfl_dt1 assembles, equ.f90:1100-1151)
                from ..physics.base import TimestepAccum
                ts_ = TimestepAccum()
                df_ = {}
                for m_ in model.modules:
                    try:
                        m_.rhs(pen, df_, ts_)
                    except Exception:
                        pass
                dxyz2 = grid.dx1 ** 2 + grid.dy1 ** 2 + grid.dz1 ** 2
                dxyz6 = grid.dx1 ** 6 + grid.dy1 ** 6 + grid.dz1 ** 6
                val = jnp.zeros(())
                if not (isinstance(ts_.maxdiffus, float)
                        and ts_.maxdiffus == 0.0):
                    val = val + jnp.max(ts_.maxdiffus * dxyz2
                                        + jnp.zeros((1,))) / cfg.time.cdtv
                if not (isinstance(ts_.maxdiffus3, float)
                        and ts_.maxdiffus3 == 0.0):
                    val = val + jnp.max(ts_.maxdiffus3 * dxyz6
                                        + jnp.zeros((1,))) / cfg.time.cdtv3
                out[n] = dt * val
            elif n == "dtd":
                # dt·max(diffus_diffrho)/cdtv — density diffusion class:
                # Fickian + shock (density.f90:3025; hyper3 → dtd3)
                den_ = cfg.module("density")
                d1 = pen.dline_1()
                dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
                val = jnp.zeros(())
                if den_ is not None:
                    if den_.diffrho > 0.0:
                        val = val + jnp.max(den_.diffrho * dxyz2
                                            + jnp.zeros((1,)))
                    if den_.diffrho_shock > 0.0 \
                            and "shock" in reg.slots:
                        val = val + jnp.max(den_.diffrho_shock
                                            * pen.field("shock") * dxyz2)
                out[n] = dt * val / cfg.time.cdtv
            elif n == "dtdragp":
                # dt·max(dt1_drag), dt1_drag = (max_cell τ⁻¹ +
                # [ldragforce_gas_par] ρ⁻¹·Σ_cell ρp_swarm·τ⁻¹)/cdtp_drag
                # (particles_dust.f90:4840-4908, NGP cell accumulation)
                pmod = cfg.module("particles")
                p = state.get("particles")
                if pmod is None or p is None:
                    out[n] = jnp.zeros(())
                else:
                    gs = cfg.grid
                    xp = p["xp"]
                    if "taus" in p:
                        t1 = 1.0 / p["taus"]
                    elif pmod.tausp > 0:
                        t1 = jnp.full((xp.shape[0],), 1.0 / pmod.tausp,
                                      xp.dtype)
                    else:
                        t1 = jnp.zeros((xp.shape[0],), xp.dtype)
                    idx = []
                    for a, (q0, L, nn) in enumerate(
                            ((gs.x0, gs.Lx, gs.nx), (gs.y0, gs.Ly, gs.ny),
                             (gs.z0, gs.Lz, gs.nz))):
                        i = jnp.clip(jnp.floor(
                            (xp[:, a] - q0) / (L / nn)).astype(int),
                            0, nn - 1)
                        idx.append(i)
                    flat = (idx[0] * gs.ny + idx[1]) * gs.nz + idx[2]
                    ncell = gs.nx * gs.ny * gs.nz
                    val = jnp.zeros((ncell,), xp.dtype).at[flat].max(t1)
                    if getattr(pmod, "ldragforce_gas_par", False):
                        if "rhopswarm" in p:
                            mpv = p["rhopswarm"]
                        else:
                            eps_ = pmod.eps_dtog if pmod.eps_dtog > 0 \
                                else 1.0
                            dV = gs.dx * gs.dy * gs.dz
                            mpv = jnp.full(
                                (xp.shape[0],),
                                eps_ * gs.Lx * gs.Ly * gs.Lz
                                / pmod.npar / dV, xp.dtype)
                        gast = jnp.zeros((ncell,), xp.dtype) \
                            .at[flat].add(mpv * t1)
                        val = val + gast * pen.rho1().reshape(-1)
                    out[n] = dt * jnp.max(val) / 0.2
            elif n == "dtb":
                # Alfvén advective fraction dt·max(√(vA²·Σ Δ⁻²))/cdt
                # (idiag_dtb, magnetic.f90:557)
                d1 = pen.dline_1()
                va2 = pen.b2() * pen.rho1()
                dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
                out[n] = dt * jnp.sqrt(jnp.max(va2 * dxyz2)) / cfg.time.cdt
            elif n == "nshift":
                # FARGO cells-shifted-per-step: max(<u_φ>/r·dt·dy⁻¹)
                # (hydro.f90:4301-4311)
                hydm = cfg.module("hydro")
                if hydm is not None and getattr(hydm, "lfargo_advection",
                                                False) \
                        and "uu" in reg.slots:
                    uum = jnp.mean(pen.uu()[1], axis=1)    # (nx, nz)
                    xr = jnp.asarray(grid.interior(grid.x))
                    dy1m = jnp.max(grid.dy_1)
                    out[n] = jnp.max(uum / xr[:, None] * dy1m) * dt
                else:
                    out[n] = jnp.zeros(())
            elif n == "dteta":
                mag = cfg.module("magnetic")
                eta = getattr(mag, "eta", 0.0) if mag else 0.0
                if mag is not None and getattr(mag, "lresi_shell", False):
                    # shell profile: η max is eta_int/eta_ext where larger
                    # (magnetic.f90 eta_shell)
                    eta = max(eta, getattr(mag, "eta_int", 0.0),
                              getattr(mag, "eta_ext", 0.0))
                dxyz2 = jnp.max(grid.dx1 ** 2 + 0.0 * grid.dx1) \
                    + jnp.max(grid.dy1 ** 2) + jnp.max(grid.dz1 ** 2)
                out[n] = dt * eta * dxyz2 / cfg.time.cdtv
            elif n in ("qmax", "qrms", "dtq", "dtq2", "dtspitzer",
                       "qsatmin", "qsatrms", "tauqmax") \
                    and cfg.module("heatflux") is not None:
                # non-Fourier heat-flux diagnostics (heatflux.f90
                # idiag_qmax/qrms :313-314, dtq/dtq2/dtspitzer/tauqmax
                # :646-700, qsatmin/qsatrms :544-548)
                hfm = cfg.module("heatflux")
                sv, tau_inv, diffspitz, qsr, c_sp, c_sp0 = \
                    hfm._spitzer(pen)
                d1h = pen.dline_1()
                if n == "qmax":
                    q2 = sum(pen.field("qq")[a] ** 2 for a in range(3))
                    out[n] = jnp.sqrt(jnp.max(q2))
                elif n == "qrms":
                    q2 = sum(pen.field("qq")[a] ** 2 for a in range(3))
                    out[n] = jnp.sqrt(jnp.mean(q2))
                elif n == "tauqmax":
                    out[n] = jnp.max(tau_inv + 0.0 * pen.lnTT())
                elif n == "dtq2":
                    out[n] = dt * jnp.max(tau_inv + 0.0 * pen.lnTT()) \
                        / hfm.cdts
                elif n == "dtq" and c_sp is not None:
                    dxm1 = jnp.maximum(jnp.maximum(
                        jnp.max(d1h[0]), jnp.max(d1h[1])),
                        jnp.max(d1h[2]))
                    out[n] = dt * jnp.max(c_sp) * dxm1 / cfg.time.cdt
                elif n == "dtspitzer" and diffspitz is not None:
                    dxyz2h = d1h[0] ** 2 + d1h[1] ** 2 + d1h[2] ** 2
                    out[n] = dt * jnp.max(diffspitz * dxyz2h) \
                        / cfg.time.cdtv
                elif n == "qsatmin":
                    out[n] = jnp.min(jnp.minimum(qsr, 1e50)
                                     + 0.0 * pen.lnTT())
                elif n == "qsatrms":
                    out[n] = jnp.sqrt(jnp.mean(
                        jnp.minimum(qsr, 1e50) ** 2 + 0.0 * pen.lnTT()))
                else:
                    out[n] = jnp.zeros(())
            elif n == "dtchi2" and cfg.module("coronae") is not None:
                # dt·max(χ_grad·Σ Δ⁻²)/cdtv from the gradient-dependent
                # conduction (coronae.f90 calc_heatcond_glnTT_iso :1785)
                sp = cfg.module("coronae")
                glnTTd = pen.glnTT()
                K_grad = sp.hcond_grad_iso * sum(g ** 2 for g in glnTTd)
                d1h = pen.dline_1()
                dxyz2h = d1h[0] ** 2 + d1h[1] ** 2 + d1h[2] ** 2
                out[n] = dt * jnp.max(K_grad * eos.gamma / eos.cp
                                      * dxyz2h) / cfg.time.cdtv
            elif n == "dtrad" and cfg.module("coronae") is not None:
                from ..physics.special.coronae import _INTLNT, _INTLNQ
                sp = cfg.module("coronae")
                ul, uv, ud, ut = (sp.unit_length, sp.unit_velocity,
                                  sp.unit_density, sp.unit_temperature)
                unit_lnQ = (3.0 * jnp.log(uv) + 5.0 * jnp.log(ul)
                            + jnp.log(ud))
                lnQ = jnp.interp(pen.lnTT() + jnp.log(ut),
                                 jnp.asarray(_INTLNT),
                                 jnp.asarray(_INTLNQ),
                                 left=-200.0, right=-200.0)
                lnneni = 2.0 * (pen.lnrho() + 61.4412
                                + jnp.log(ud * ul ** 3))
                rtv = jnp.exp(lnQ - unit_lnQ + lnneni) * sp.cool_RTV
                rate = rtv * eos.gamma / eos.cp * jnp.exp(
                    -pen.lnrho() - pen.lnTT())
                out[n] = dt * jnp.max(rate) / sp.cdts
            elif n in ("dtF", "taufmin") \
                    and getattr(cfg.module("hydro"), "lcdt_tauf", False):
                # force-limited dt diagnostics (hydro.f90:3955-3957):
                # Fmax is sampled at the END of duu_dt — advection +
                # Coriolis + viscous, WITHOUT the pressure gradient
                # (entropy.f90:3299) or gravity (equ.f90:990)
                hydm = cfg.module("hydro")
                Fmax = _fmax_hydro(pen)
                if Fmax is None:
                    out[n] = jnp.zeros(())
                elif n == "dtF":
                    out[n] = dt * Fmax / hydm.cdt_tauf
                else:
                    out[n] = 1.0 / jnp.maximum(Fmax, 1e-30)
            elif n == "dtnu":
                # dt·max(diffus_nu·Σ Δ⁻²)/cdtv with the same ν accumulation
                # the rhs registers: T-scaled ν for 'nu-cspeed'
                # (viscosity.f90:1396) plus the shock viscosity
                visc = cfg.module("viscosity")
                nu = visc.nu if visc else 0.0
                d1 = pen.dline_1()
                dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
                nu_eff = nu + 0.0 * pen.lnrho()
                if visc is not None and ({"nu-cspeed", "nu-therm"} & set(visc.ivisc)):
                    nu_eff = nu * jnp.exp(visc.nu_cspeed * pen.lnTT())
                if visc is not None and visc.nu_shock > 0.0 \
                        and "shock" in pen.reg.slots \
                        and ({"nu-shock", "shock"} & set(visc.ivisc)):
                    nu_eff = nu_eff + visc.nu_shock * pen.field("shock")
                out[n] = dt * jnp.max(nu_eff * dxyz2) / cfg.time.cdtv
            elif n == "dtchi":
                ent = cfg.module("entropy")
                e = eos
                chi = 0.0
                if ent is not None and ent.hcond0 > 0:
                    if "K-profile" in ent.iheatcond:
                        from ..physics.stratification import hcond_profile
                        K = hcond_profile(grid.zg, ent.z1, ent.z2,
                                          ent.mpoly0, ent.mpoly1, ent.mpoly2,
                                          ent.hcond0, ent.width)
                    else:
                        K = ent.hcond0
                    chi = K * pen.rho1() / e.cp
                elif ent is not None and "kramers" in ent.iheatcond \
                        and ent.hcond0_kramers > 0.0:
                    # Kramers χ = K0·ρ^(−2n−1)·T^{6.5n}/cp (entropy.f90
                    # calc_heatcond_kramers diffus_chi accumulation)
                    n_ = ent.nkramers
                    chi = ent.hcond0_kramers * jnp.exp(
                        -(2.0 * n_ + 1.0) * pen.lnrho()
                        + (6.5 * n_) * pen.lnTT()) / e.cp
                    if ent.chimax_kramers > 0.0:
                        chi = jnp.clip(chi, ent.chimin_kramers,
                                       ent.chimax_kramers)
                elif ent is not None:
                    chi = ent.chi
                    if {"chi-cspeed", "chi-therm"} & set(ent.iheatcond):
                        # T-scaled conduction (entropy.f90:4429 diffus_chi
                        # accumulation of gamma·thchi)
                        chi = chi * jnp.exp(ent.chi_cspeed * pen.lnTT())
                if ent is not None and "chit" in ent.iheatcond \
                        and ent.chi_t1 != 0.0:
                    # χ_t joins diffus_chi linearly (entropy.f90:5762)
                    chi = chi + ent.chi_t1 / e.gamma
                if ent is not None and ent.chi_shock > 0.0 \
                        and "shock" in pen.reg.slots \
                        and "shock" in ent.iheatcond:
                    chi = chi + ent.chi_shock * pen.field("shock") / e.gamma
                dxyz2 = grid.dx1 ** 2 + grid.dy1 ** 2 + grid.dz1 ** 2
                out[n] = dt * e.gamma * jnp.max(chi * dxyz2) / cfg.time.cdtv
            elif _gw_diag(n):
                # aux slot: read straight from the state (not the ghosted
                # communicated stack, which holds evolved fields only)
                gw = state["fields"]["gw"]
                if n == "EEGW":
                    out[n] = jnp.sum(gw[4:8] ** 2) * gwmod.EGWpref
                elif n == "gg2m":
                    out[n] = jnp.sum(gw[4:8] ** 2)
                else:
                    out[n] = jnp.sqrt(jnp.sum(gw[0:4] ** 2))
            elif _pm_diag(n):
                comp = "xyz".index(n.lstrip("v")[0])
                k = int(_re.search(r"\d+$", n).group()) - 1
                arr = state["pointmasses"]["vq" if n[0] == "v" else "xq"]
                out[n] = arr[k, comp]
            elif _sumlim_diag(n):
                gs = cfg.grid
                bordm = cfg.module("border")
                fzm = cfg.module("freeze_zones")
                ri = getattr(bordm, "r_int", None) if bordm else None
                re_ = getattr(bordm, "r_ext", None) if bordm else None
                if ri is None and fzm is not None:
                    ri = max(fzm.rfreeze_int, 0.0)
                    re_ = fzm.rfreeze_ext
                if ri is None:
                    ri, re_ = 0.0, 9e99
                zeroc = jnp.zeros((gs.nx, gs.ny, gs.nz), grid.z.dtype)
                if gs.coords == "cartesian":
                    rcyl = jnp.sqrt(grid.xg ** 2 + grid.yg ** 2) + zeroc
                else:
                    rcyl = grid.xg + zeroc
                sel = (rcyl >= ri) & (rcyl <= re_)
                dv = 1.0
                for nn_, dd_ in ((gs.nx, gs.Lx / gs.nx),
                                 (gs.ny, gs.Ly / gs.ny),
                                 (gs.nz, gs.Lz / gs.nz)):
                    if nn_ > 1:
                        dv *= dd_
                pmmod = cfg.module("pointmasses")
                if n == "totangmom":
                    uu = pen.uu()
                    val = pen.rho() * (uu[1] * grid.xg - uu[0] * grid.yg)
                    out[n] = jnp.sum(jnp.where(sel, val, 0.0)) * dv
                elif n == "TTp":
                    gam = pen.eos.gamma if pen.eos is not None else 1.0
                    val = pen.rho() * pen.cs2() / gam
                    out[n] = jnp.sum(jnp.where(sel, val, 0.0)) * dv
                elif n == "totenergy":
                    # bug-compatible: only the LAST point mass's potential
                    # survives the reference's per-ks reset
                    # (pointmasses.f90:905-911)
                    xq = state["pointmasses"]["xq"]
                    ks = pmmod.nqpar - 1
                    rs = pmmod._r_smooth()[ks]
                    mlast = jnp.asarray(pmmod.masses())[ks]
                    rp2 = ((grid.xg - xq[ks, 0]) ** 2
                           + (grid.yg - xq[ks, 1]) ** 2) + zeroc
                    pot = -pmmod.GNewton * mlast \
                        * (rp2 + rs ** 2) ** -0.5
                    val = 0.5 * pen.rho() * pen.u2() + pot
                    out[n] = jnp.sum(jnp.where(sel, val, 0.0)) * dv
                else:
                    # torqint_k / torqext_k (calc_torque_split_int_ext,
                    # pointmasses.f90:1572-1690)
                    k = int(n.split("_")[1]) - 1
                    xq = state["pointmasses"]["xq"]
                    rs = pmmod._r_smooth()[k]
                    mk = jnp.asarray(pmmod.masses())[k]
                    if gs.coords == "cartesian":
                        rrp = jnp.sqrt(xq[k, 0] ** 2 + xq[k, 1] ** 2
                                       + xq[k, 2] ** 2)
                        rpre = (xq[k, 0] * grid.yg
                                - xq[k, 1] * grid.xg) + zeroc
                        dist2 = ((grid.xg - xq[k, 0]) ** 2
                                 + (grid.yg - xq[k, 1]) ** 2) + zeroc
                    else:
                        rrp = xq[k, 0]
                        rpre = rcyl * xq[k, 0] * jnp.sin(
                            grid.yg - xq[k, 1]) + zeroc
                        dist2 = (rcyl ** 2 + xq[k, 0] ** 2
                                 - 2.0 * rcyl * xq[k, 0]
                                 * jnp.cos(grid.yg - xq[k, 1]))
                    tq = pmmod.GNewton * mk * pen.rho() * rpre \
                        * (dist2 + rs ** 2) ** -1.5
                    tq = jnp.where(sel, tq, 0.0) \
                        if gs.coords == "cartesian" else tq
                    if n.startswith("torqext"):
                        tq = jnp.where(rcyl >= rrp, tq, 0.0)
                    else:
                        tq = jnp.where(rcyl <= rrp, tq, 0.0)
                    out[n] = jnp.sum(tq) * dv
            elif _chem_diag(n):
                if n == "e_intm":
                    out[n] = jnp.zeros(())
                elif n == "ppm":
                    # p = R·μ⁻¹·ρ·T (eos_chemistry mixture pressure)
                    from ..physics.chemistry_chemkin import RGAS
                    chem = cfg.module("chemistry")
                    Y = pen.field("chem")
                    W1 = (1.0 / chem.mech.mass)[:, None, None, None]
                    mu1 = jnp.sum(Y * W1, axis=0)
                    out[n] = _vmean(pen, RGAS * mu1 * pen.rho() * pen.TT())
                else:
                    k = int(n[1:-1]) - 1
                    out[n] = _vmean(pen, pen.field("chem")[k])
            elif _dust_diag(n):
                nd = pen.field("nd")
                if n == "ndmt":
                    out[n] = _vmean(pen, jnp.sum(nd, axis=0))
                elif n == "rhodmt":
                    if dustbins.lmdvar:
                        md = pen.field("md")
                    else:
                        md = jnp.asarray(dustbins._grid()[2],
                                         nd.dtype)[:, None, None, None]
                    out[n] = _vmean(pen, jnp.sum(md * nd, axis=0))
                else:
                    out[n] = _vmean(pen, nd[int(n[3:])])
            else:
                out[n] = DIAG_REGISTRY[n](pen, state)
        return out

    # expose the unclaimed labels so drivers can report MISSING_DIAG
    # instead of letting zeros masquerade as physics (diagnostics.f90
    # parse_name: unclaimed labels stay 0 in fname)
    evaluate.unknown = unknown_set
    return evaluate
