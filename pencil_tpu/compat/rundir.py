"""Load a reference-format run directory (start.in / run.in /
src/cparam.local) into a pencil_tpu Config — the switch-over path for
existing Pencil Code users (reference contract: src/param_io.f90 namelists,
src/cparam.local compile-time grid).

Coverage: the module set exercised by the acceptance samples (eos, density,
hydro, entropy, gravity, viscosity, magnetic, forcing, shear, shock,
pscalar).  Unknown namelist groups are reported, unknown parameters within
known groups are ignored with a warning list returned alongside."""
from __future__ import annotations

import math
import os
import re
from typing import Dict, Tuple

from ..core.config import Config, GridSpec, TimeSpec
from ..ops.boundary import BC
from ..physics import (Density, Entropy, EosIdealGas, Forcing, Gravity,
                       Hydro, Magnetic, PassiveScalar, Shear, Shock,
                       Viscosity)
from .namelist import read_namelist_file


def parse_makefile_local(path) -> Dict[str, str]:
    """Module-slot assignments from a Makefile.local
    (e.g. INITIAL_CONDITION = initial_condition/kelvin_helmholtz)."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.split("#")[0]
            if "=" in line:
                k, v = line.split("=", 1)
                out[k.strip().upper()] = v.strip()
    return out


def parse_cparam_local(path) -> Dict[str, int]:
    """Extract name=value integer constants from a cparam.local.

    Values may be simple integer expressions over previously defined names
    (the reference uses e.g. ``nzgrid=1024/4``, ``nprocy=ncpus/nprocz``),
    evaluated left to right like the Fortran parameter statements."""
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            # magic header comments (mkcparam contract): dust bin count
            m_nd = re.match(r"\s*!\s*NDUSTSPEC CONTRIBUTION\s+(\d+)", line)
            if m_nd:
                out["ndustspec"] = int(m_nd.group(1))
            line = line.split("!")[0]
            if "::" in line:
                line = line.split("::", 1)[1]
            for part in line.split(","):
                m = re.match(r"\s*(\w+)\s*=\s*([\w+\-*/() ]+?)\s*$", part)
                if not m:
                    continue
                name, expr = m.group(1).lower(), m.group(2).lower()
                if not re.fullmatch(r"[0-9a-z_+\-*/() ]+", expr):
                    continue
                try:
                    out[name] = int(eval(expr, {"__builtins__": {}}, out))
                except Exception:
                    pass
    return out


def _complex_floats(v):
    """Fortran complex namelist values '(re,im), (re,im)…' arrive from the
    parser as string halves '(re' / 'im)' — rejoin into a flat float tuple
    (re1, im1, re2, im2, ...)."""
    if not isinstance(v, list):
        v = [v]
    out = []
    for tok in v:
        s = str(tok).strip().lstrip("(").rstrip(")")
        try:
            out.append(float(s))
        except ValueError:
            pass
    return tuple(out)


def _read_hcond_glhc(path):
    """Radial conductivity table hcond_glhc.dat (entropy.f90 read_hcond:
    nxgrid rows of K(x), dK/dx — used verbatim, no hcond0 scaling)."""
    fn = os.path.join(path, "hcond_glhc.dat")
    if not os.path.exists(fn):
        return ()
    rows = []
    with open(fn) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                rows.append((float(parts[0]), float(parts[1])))
    return tuple(rows)


def _list_pars(p, init_names, amap):
    """Per-entry ((field, value), ...) tuples pairing the j-th init name
    with the j-th entry of each namelist array (the reference's ninit
    parameter arrays, e.g. amplaa(j)/kz_aa(j))."""
    if not isinstance(init_names, tuple):
        return ()
    out = []
    for i in range(len(init_names)):
        d = []
        for fld, k in amap.items():
            v = p.get(k)
            if isinstance(v, list) and i < len(v):
                d.append((fld, float(v[i])))
        out.append(tuple(d))
    return tuple(out)


def _init_name(v, default="zero"):
    """initxx namelists can be ARRAYS (the reference ninit cascade) —
    keep lists as tuples so module init_fields can sum the entries."""
    if v is None:
        return default
    if isinstance(v, (list, tuple)):
        names = [str(x) for x in v]
        while names and names[-1] in ("", "nothing"):
            names.pop()
        if not names:
            return default
        if len(names) == 1:
            return names[0]
        return tuple(names)
    return str(v)


def _as_tuple(v):
    return tuple(v) if isinstance(v, list) else (v,)


def _first(v):
    """Namelist arrays like kx_lnrho(ninit): take the first entry."""
    return v[0] if isinstance(v, list) else v



def _aniso3(v):
    """Per-axis coefficient triple from a namelist value (scalar or list)."""
    if isinstance(v, (list, tuple)):
        out = [float(x) for x in v][:3]
        while len(out) < 3:
            out.append(0.0)
        return tuple(out)
    return (float(v), float(v), float(v))

def _read_stratification(path):
    """Rows of stratification.dat (z, lnrho, [ss|lnTT[, acc]]) as a
    hashable tuple-of-tuples (reference initcond.f90:2660 reads the file
    verbatim; the ghost-row question is resolved by interpolation)."""
    import os as _os
    fn = _os.path.join(str(path), "stratification.dat")
    if not _os.path.exists(fn):
        return ()
    rows = []
    with open(fn) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            try:
                rows.append(tuple(float(p.replace("D", "E").replace(
                    "d", "e")) for p in parts))
            except ValueError:
                continue
    return tuple(rows)


def _g(groups, name) -> Dict:
    return dict(groups.get(name, {}))


def _parity_replay(path, modules, grid, nt, init_pars, run_pars, cpar):
    """``random_gen='nr_f90'``: reproduce the reference's machine-independent
    RNG stream (src/general.f90 mars_ran) through start.x's exact draw order
    (src/start.f90:383,416-423,451 — seed put, init_uu, init_lnrho,
    init_energy, init_aa, ..., particles) and precompute the run.x helical
    forcing draws, so sample goldens can be matched at format precision.

    Returns (overrides, modules): interior-field init overrides (numpy) and
    the module tuple with Forcing swapped to replay mode.  Single-rank
    streams only (every committed golden runs ncpus=1 for nr_f90 samples).
    """
    from .pencil_rng import (Ran0, forcing_hel_sequence, gaunoise_vect,
                             read_k_dat, start_seed)

    gen = run_pars.get("random_gen", init_pars.get("random_gen", "min_std"))
    if gen not in ("nr_f90", "min_std"):
        return None, modules
    seed0 = int(init_pars.get("seed0", 1812))
    npx = int(cpar.get("nprocx", 1))
    npy = int(cpar.get("nprocy", 1))
    npz = int(cpar.get("nprocz", 1))
    nproc = npx * npy * npz

    def _make_rng(iproc):
        if gen == "nr_f90":
            return start_seed(seed0, iproc)
        # min_std: random_seed_wrapper(PUT) installs the seed verbatim
        # (no draw consumed) — src/general.f90 ran0 path
        return Ran0(-((seed0 - 1812 + 1) * 10 + iproc))

    # every MPI rank runs the init cascade on its OWN stream seeded by
    # iproc (start.f90:383 random_seed_wrapper per rank); replay each
    # rank's draws over its local ghosted block and mosaic the interiors
    rngs = [_make_rng(i) for i in range(nproc)]
    rng = rngs[0]
    mx, my, mz = grid.nx + 6, grid.ny + 6, grid.nz + 6
    nxl, nyl, nzl = grid.nx // npx, grid.ny // npy, grid.nz // npz
    overrides = {}

    def noise_for(mod, field, ncomp):
        if mod is None:
            return
        init = getattr(mod, "init", "nothing")
        ampl = float(getattr(mod, "ampl", 0.0))
        if init in ("gaussian-noise", "gaussian_noise") and ampl != 0.0:
            import numpy as np
            full = np.zeros((ncomp, grid.nx, grid.ny, grid.nz), np.float32)
            for ip in range(nproc):
                ipx = ip % npx
                ipy = (ip // npx) % npy
                ipz = ip // (npx * npy)
                loc = gaunoise_vect(rngs[ip], ampl, nxl + 6, nyl + 6,
                                    nzl + 6, ncomp)
                full[:, ipx * nxl:(ipx + 1) * nxl,
                     ipy * nyl:(ipy + 1) * nyl,
                     ipz * nzl:(ipz + 1) * nzl] = loc[:, 3:-3, 3:-3, 3:-3]
            if field == "rho":
                # ldensity_nolog: the init cascade works in LOG and exps
                # at the end (density.f90:1650) — replayed noise is a
                # log-density perturbation
                import numpy as _np
                full = _np.exp(full)
            overrides[field] = full if ncomp > 1 else full[0]

    by_name = {m.name: m for m in modules}

    # shallow-water storms are drawn during initialize_modules, BEFORE the
    # field init cascade (reference start.f90:349 → update_storms)
    sw = by_name.get("shallow_water")
    if sw is not None and sw.lcalc_storm:
        import dataclasses
        from ..physics.special.shallow_water import make_storm_table
        nstorm = int(cpar.get("nstorm", 0))
        strength = float(sw.storm_strength)
        r_ext = float(run_pars.get("r_ext", init_pars.get("r_ext", 0.0)))
        wborder = float(run_pars.get("wborder_ext", 0.0))
        if nstorm > 0 and strength > 0.0 and r_ext > 0.0:
            table = make_storm_table(
                rng, nstorm, sw.tduration, sw.rsize_storm, strength,
                float(init_pars.get("r_int", 0.0)), r_ext, wborder)
            modules = tuple(
                dataclasses.replace(m, storm_table=table, r_ext=r_ext)
                if m.name == "shallow_water" else m for m in modules)
            by_name = {m.name: m for m in modules}

    # reference init cascade order (src/start.f90:416-423)
    noise_for(by_name.get("hydro"), "uu", 3)
    hyd = by_name.get("hydro")
    if hyd is not None and float(getattr(hyd, "urand", 0.0)) > 0.0:
        # additive uniform fluctuations u += urand*(r-0.5), drawn per
        # full-mx row with n outer, m inner, component outermost
        # (hydro.f90:2518-2526)
        import numpy as np
        arr = np.empty((3, mx, my, mz), np.float32)
        for i3 in range(3):
            for n3 in range(mz):
                for m3 in range(my):
                    arr[i3, :, m3, n3] = rng.draw(mx)
        pert = float(hyd.urand) * (arr[:, 3:-3, 3:-3, 3:-3] - 0.5)
        overrides["uu"] = overrides.get("uu", 0.0) + pert
    noise_for(by_name.get("density"),
              "rho" if getattr(by_name.get("density"), "lnolog", False)
              else "lnrho", 1)
    noise_for(by_name.get("entropy"), "ss", 1)
    noise_for(by_name.get("magnetic"), "aa", 3)

    # solid_cells gaunoise consumes the stream before particle draws
    # (start.f90 init cascade: init_solid_cells precedes particles_init);
    # the module replays its own identical draw from seed0 for the field
    sc_mod = by_name.get("solid_cells")
    if (sc_mod is not None
            and getattr(sc_mod, "initsolid_cells", "nothing") != "nothing"
            and float(getattr(sc_mod, "ampl_noise", 0.0)) != 0.0):
        gaunoise_vect(rng, 1.0, mx, my, mz, 3)

    part = by_name.get("particles")
    if part is not None and getattr(part, "init", "") in ("random",
                                                          "gaussian-z"):
        # Per-rank particle init: each proc draws npar/ncpus particles on
        # ITS stream inside ITS local box (particles_dust.f90:1010-1040
        # xyz0_par=xyz0_loc default, particles_mpicomm.f90:110 npar_loc).
        # 'random': per-particle uniform draws, inactive dims skipped
        # (f90:1117-1135).  'gaussian-z': x,y uniform + z Box-Muller with
        # a rejection loop that redraws EVERYTHING while z is outside the
        # GLOBAL box (f90:1635-1660; r0gaussz=1,qgaussz=0 defaults drop
        # the x-dependence).
        import numpy as np
        init = part.init
        npar = part.npar
        zp0 = float(getattr(part, "zp0", 1.0))
        ax, ay, az = grid.nx > 1, grid.ny > 1, grid.nz > 1
        z0g, z1g = grid.z0, grid.z0 + grid.Lz
        nploc = int(round(npar / nproc))
        pos = np.zeros((npar, 3), np.float32)
        k0 = 0
        for ip in range(nproc):
            ipx = ip % npx
            ipy = (ip // npx) % npy
            ipz = ip // (npx * npy)
            rl = rngs[ip]
            lo = np.asarray([grid.x0 + ipx * grid.Lx / npx,
                             grid.y0 + ipy * grid.Ly / npy,
                             grid.z0 + ipz * grid.Lz / npz], np.float32)
            L = np.asarray([grid.Lx / npx, grid.Ly / npy, grid.Lz / npz],
                           np.float32)
            n_ip = nploc if ip < nproc - 1 else npar - k0
            if init == "random":
                for k in range(k0, k0 + n_ip):
                    for a, act in enumerate((ax, ay, az)):
                        if act:
                            pos[k, a] = lo[a] + rl.next() * L[a]
                        elif a == 2:
                            pos[k, a] = grid.z0 + 0.5 * grid.Lz
            else:  # gaussian-z
                for k in range(k0, k0 + n_ip):
                    while True:
                        xk = (lo[0] + rl.next() * L[0]) if ax \
                            else np.float32(grid.x0 + 0.5 * grid.Lx)
                        yk = (lo[1] + rl.next() * L[1]) if ay \
                            else np.float32(grid.y0 + 0.5 * grid.Ly)
                        r = rl.next()
                        p = rl.next()
                        zk = (zp0 * np.sqrt(-2.0 * np.log(np.float32(r)))
                              * np.cos(2.0 * np.pi * np.float32(p)))
                        if z0g <= zk <= z1g:
                            break
                    pos[k] = (xk, yk, zk)
            k0 += n_ip
        overrides["particles_xp"] = pos
        # particles_radius initap='constant' with several ap0 entries:
        # one uniform draw per particle picks the radius bin
        # (particles_radius.f90 set_particle_radius: ind =
        # ceiling(npart_radii*u))
        apl = tuple(getattr(part, "ap0_list", ()) or ())
        if getattr(part, "initap", "") == "constant" and len(apl) > 1:
            ap = np.empty((npar,), np.float32)
            k0 = 0
            for ip in range(nproc):
                n_ip = nploc if ip < nproc - 1 else npar - k0
                rl = rngs[ip]
                for k in range(k0, k0 + n_ip):
                    ind = min(int(np.ceil(len(apl) * rl.next())),
                              len(apl)) or 1
                    ap[k] = apl[ind - 1]
                k0 += n_ip
            overrides["particles_ap"] = ap
        if getattr(part, "llyapunov", False) \
                and not getattr(part, "linit_largeb", False):
            # init_particles_lyapunov: 3 uniform draws per particle.
            # NOTE: the committed ParticlesLyapunov golden predates the
            # bamp=1e-2 default (bx2pm≈1/3 at it0 ⇒ bp = raw U[0,1)), so
            # the replay keeps the raw draws
            bp = np.empty((npar, 3), np.float32)
            k0 = 0
            for ip in range(nproc):
                n_ip = nploc if ip < nproc - 1 else npar - k0
                rl = rngs[ip]
                for k in range(k0, k0 + n_ip):
                    for a in range(3):
                        bp[k, a] = rl.next()
                k0 += n_ip
            overrides["particles_bp"] = bp
    elif part is not None and getattr(part, "init", "") == "random-box":
        # per-particle draws for the ACTIVE dims only, in k-loop order
        # (particles_dust.f90:1328-1352)
        import numpy as np
        npar = part.npar
        active = [grid.nx > 1, grid.ny > 1, grid.nz > 1]
        b0 = [part.xp0, part.yp0, part.zp0_box]
        bL = [part.Lx0, part.Ly0, part.Lz0]
        pos = np.zeros((npar, 3), np.float32)
        for k in range(npar):
            for a in range(3):
                if active[a]:
                    pos[k, a] = b0[a] + rng.next() * bL[a]
                else:
                    pos[k, a] = (grid.z0 + 0.5 * grid.Lz if a == 2
                                 else b0[a])
        overrides["particles_xp"] = pos

    ic = by_name.get("initial_condition")
    if ic is not None and ic.plugin == "baroclinic_init":
        # one phase per mode, drawn on root during initial_condition_lnrho
        # (baroclinic_init.f90:66); this is the stream's first consumer
        import dataclasses
        pd = dict(ic.params)
        xm = int(pd.get("xmodes", 10))
        ym = int(pd.get("ymodes", 10))
        zm = int(pd.get("zmodes", 0))
        nmodes = (2 * xm + 1) * (ym + 1) * (2 * zm + 1)
        pd["phases"] = tuple(float(v) for v in rng.draw(nmodes))
        modules = tuple(
            dataclasses.replace(m, params=tuple(sorted(pd.items())))
            if m.name == "initial_condition" else m for m in modules)
        by_name = {m.name: m for m in modules}

    forc = by_name.get("forcing")
    kdat = os.path.join(path, "k.dat")
    if forc is not None and os.path.exists(kdat):
        nk, kav, kkx, kky, kkz = read_k_dat(kdat)
        kk, phase, phi = forcing_hel_sequence(rng, nt, kkx, kky, kkz)
        seq = tuple(
            (float(kk[i, 0]), float(kk[i, 1]), float(kk[i, 2]),
             float(phase[i]), float(phi[i]))
            for i in range(nt))
        _eosm = by_name.get("eos")
        _cs0eff = float(getattr(_eosm, "cs0", 1.0)) if _eosm is not None \
            else 1.0
        modules = tuple(
            Forcing(force=m.force, kf=m.kf, relhel=m.relhel,
                    sequence=seq, kav=kav,
                    # normalization uses cs0 unless overridden
                    # (forcing.f90:906-913)
                    cs0eff=(m.cs0eff if m.cs0eff != 1.0 else _cs0eff),
                    lscale_kvector_tobox=m.lscale_kvector_tobox)
            if m.name == "forcing" else m
            for m in modules)
    return (overrides or None), modules


def load_rundir(path, nxyz=None) -> Tuple[Config, Dict]:
    """→ (Config, info) where info carries run_pars (nt, it1, ...) and any
    unmapped parameters for the caller to inspect."""
    path = str(path)
    start = read_namelist_file(os.path.join(path, "start.in"))
    runf = os.path.join(path, "run.in")
    run = read_namelist_file(runf) if os.path.exists(runf) else {}
    cpar = parse_cparam_local(os.path.join(path, "src", "cparam.local"))
    mkf = parse_makefile_local(os.path.join(path, "src", "Makefile.local"))

    init_pars = _g(start, "init_pars")
    run_pars = _g(run, "run_pars")

    nx = (nxyz or (cpar.get("nxgrid", 32),))[0] if nxyz else cpar.get("nxgrid", 32)
    ny = nxyz[1] if nxyz else cpar.get("nygrid", nx)
    nz = nxyz[2] if nxyz else cpar.get("nzgrid", nx)

    import math as _math

    def _vec3(v, fill=None):
        # namelist scalar broadcast: xyz0=0. means (0,0,0); a short list
        # (xyz0=0.7, 0.0) leaves trailing components at their defaults
        # (cdata.f90:130 xyz0=-pi), passed via ``fill``
        if not isinstance(v, (list, tuple)):
            return [v, v, v]
        v = list(v)
        while len(v) < 3:
            v.append(fill[len(v)] if fill is not None else v[-1])
        return v

    xyz0 = _vec3(init_pars.get("xyz0", [-3.1416, -3.1416, -3.1416]),
                 fill=[-_math.pi] * 3)
    if "xyz1" in init_pars:
        xyz1 = _vec3(init_pars["xyz1"],
                     fill=[a + 2.0 * _math.pi for a in xyz0])
        Lxyz = [b - a for a, b in zip(xyz0, xyz1)]
    elif "wav1" in init_pars:
        # cubic box of size 2π/wav1 centred on the origin (start.f90:204)
        L1 = 2.0 * _math.pi / float(init_pars["wav1"])
        Lxyz = [L1, L1, L1]
        xyz0 = [-L1 / 2.0] * 3
    else:
        Lxyz = _vec3(init_pars.get("lxyz", [6.2832, 6.2832, 6.2832]))
    lperi = init_pars.get("lperi", [True, True, True])
    lpole = init_pars.get("lpole", [False, False, False])
    if not isinstance(lpole, list):
        lpole = [lpole] * 3
    lshift = init_pars.get("lshift_origin", [False, False, False])
    if not isinstance(lshift, list):
        lshift = [lshift] * 3
    coords = {"cylindric": "cylindrical", "cylindrical": "cylindrical",
              "spherical": "spherical", "spherical_coords": "spherical",
              }.get(str(init_pars.get("coord_system", "cartesian")),
                    "cartesian")
    # grid_func: Fortran namelist `array=scalar` fills element 1 only
    # (src/grid.f90 grid_func defaults to 'linear' per axis)
    gf = init_pars.get("grid_func", "linear")
    if not isinstance(gf, list):
        gf = [gf]
    gf = (list(gf) + ["linear", "linear", "linear"])[:3]
    gf = tuple("uniform" if str(f) in ("linear", "") else str(f)
               for f in gf)
    gc = init_pars.get("coeff_grid", 0.0)
    if not isinstance(gc, list):
        gc = [gc]
    gc = tuple((list(gc) + [0.0, 0.0, 0.0])[:3])
    # step-linear parameters: namelist arrays are (3,2) column-major —
    # first 3 entries are step 1 per axis, next 3 step 2 (grid.f90:262)
    gstep = [(), (), ()]
    if "step-linear" in gf:
        def _arr6(nm):
            v = init_pars.get(nm, [0.0] * 6)
            if not isinstance(v, list):
                v = [v]
            return [float(u) for u in (list(v) + [0.0] * 6)[:6]]
        xs, fr, wd = (_arr6("xyz_step"), _arr6("xi_step_frac"),
                      _arr6("xi_step_width"))
        for a in range(3):
            if gf[a] == "step-linear":
                gstep[a] = (xs[a], xs[a + 3], fr[a], fr[a + 3],
                            wd[a], wd[a + 3])
    grid = GridSpec(nx=nx, ny=ny, nz=nz,
                    x0=xyz0[0], y0=xyz0[1], z0=xyz0[2],
                    Lx=Lxyz[0], Ly=Lxyz[1], Lz=Lxyz[2],
                    periodic=tuple(bool(p) for p in lperi),
                    lshift_origin=tuple(bool(v) for v in lshift),
                    lpole=tuple(bool(v) for v in lpole),
                    grid_func=gf,
                    grid_coeff=tuple(float(c) for c in gc),
                    xyz_star=tuple(float(v) for v in _vec3(
                        init_pars.get("xyz_star", [0.0, 0.0, 0.0]),
                        [0.0, 0.0, 0.0])),
                    grid_step=tuple(gstep),
                    coords=coords)

    time = TimeSpec(
        itorder=int(run_pars.get("itorder", 3)),
        cdt=float(run_pars.get("cdt", 0.9)),
        cdtv=float(run_pars.get("cdtv", 0.25)),
        cdtv3=float(run_pars.get("cdtv3", 0.01)),
        cdts=float(run_pars.get("cdts", 1.0)),
        dt=float(run_pars.get("dt", 0.0)),
        dtmin=float(run_pars.get("dtmin", 1e-10)),
        dtmax=float(run_pars.get("dtmax", 1e37)),
        eps_rkf=float(run_pars.get("eps_rkf", 1e-8)),
        tstart=float(init_pars.get("tstart", 0.0)),
    )

    modules = []
    known = {"init_pars", "run_pars"}

    def grp(stem):
        known.update({f"{stem}_init_pars", f"{stem}_run_pars"})
        d = _g(start, f"{stem}_init_pars")
        r = dict(_g(run, f"{stem}_run_pars"))
        # init*='...' in a run-pars group only takes effect when the
        # module's lreinitialize_* flag is set (reference e.g.
        # hydro.f90:1004 `if (lreinitialize_uu)`); samples commonly carry
        # `lreinitialize_uu=F, inituu='rescale'` which must be ignored.
        if not any(bool(v) for k, v in r.items()
                   if k.startswith("lreinitialize")):
            for k in [k for k in r if k.startswith("init")]:
                del r[k]
        d.update(r)
        return d

    eos_p = grp("eos")
    # cgs unit system of the run (cdata unit_length/...); with
    # lfix_unit_std the temperature unit is derived so that lnTT0=0
    # (eos_idealgas.f90:172-183: Rgas=µ/γ, cp=1/(γ−1), unit_T=uv²Rgas/R*)
    _units = {k: float(init_pars[k]) for k in
              ("unit_length", "unit_velocity", "unit_density",
               "unit_temperature", "unit_magnetic") if k in init_pars}
    _unit_system = str(init_pars.get("unit_system", "cgs"))
    if all(k in init_pars for k in ("c_light", "g_newton", "hbar")):
        # natural/Planck unit derivation (register.f90:460-492): when
        # c_light, G_Newton, hbar are ALL set, velocity/density/length
        # units follow from the cgs constants
        _cl = 2.99792458e10 / float(init_pars["c_light"])
        _Gf = 6.6742e-8 / float(init_pars["g_newton"])
        _hf = 1.054571596e-27 / float(init_pars["hbar"])
        _units["unit_velocity"] = _cl
        _units["unit_density"] = _cl ** 5 / (_Gf ** 2 * _hf)
        _units["unit_length"] = math.sqrt(_Gf * _hf / _cl ** 3)
    # unit_magnetic default √4π, or the µ0=1-consistent value under
    # lfix_unit_std (register.f90:496-516); µ0 in code units follows as
    # µ0_sys·ρ_u·(u_u/B_u)² (:275,:295) — ≠ 1 when B_u is inconsistent
    _mu0_sys = 4.0 * math.pi * (1e-7 if _unit_system == "SI" else 1.0)
    if "unit_magnetic" not in _units:
        if init_pars.get("lfix_unit_std"):
            _units["unit_magnetic"] = (
                3.5449077018110318
                * math.sqrt((1e-7 if _unit_system == "SI" else 1.0)
                            * _units.get("unit_density", 1.0))
                * _units.get("unit_velocity", 1.0))
        else:
            _units["unit_magnetic"] = 3.5449077018110318
    _mu0_code = (_mu0_sys * _units.get("unit_density", 1.0)
                 * (_units.get("unit_velocity", 1.0)
                    / _units["unit_magnetic"]) ** 2) \
        if ("unit_density" in _units or "unit_velocity" in _units
            or "unit_magnetic" in init_pars) else 1.0
    _gamma_eos = float(eos_p.get("gamma", 5.0 / 3.0))
    _cp_eos = float(eos_p.get("cp", 1.0))
    _mu_from_xHe = None
    if ("ionization" in mkf.get("EOS", "") and "mu" not in eos_p):
        # eos_ionization: neutral-gas mean molecular weight from the He
        # fraction, µ = (1+4x_He)/(1+x_He) (eos_ionization.f90 getmu)
        _xHe = float(eos_p.get("xhe", 0.1))
        _mu_from_xHe = (1.0 + 4.0 * _xHe) / (1.0 + _xHe)
    if "unit_temperature" in _units and "cp" not in eos_p \
            and not init_pars.get("lfix_unit_std"):
        # explicit unit_temperature: cp FOLLOWS from the unit system in
        # EVERY unit system (eos_idealgas.f90:192-198: Rgas =
        # R_sys·uT/uv², cp = Rgas·γ/(µ(γ−1)); R_sys = k_B/m_u, ×1e-4
        # for SI :160-163).  µ is the raw eos_idealgas namelist value
        # (default 1.0, eos_idealgas.f90:42 — getmu's xHe adjustment
        # does NOT feed this derivation); ionization EOSes use getmu's µ
        _Rsys = 1.3806505e-16 / 1.66053886e-24
        if str(init_pars.get("unit_system", "cgs")) == "SI":
            _Rsys *= 1e-4
        _Rgas_code = (_Rsys * _units["unit_temperature"]
                      / _units.get("unit_velocity", 1.0) ** 2)
        _mu_eos0 = (float(eos_p["mu"]) if "mu" in eos_p
                    else (_mu_from_xHe if _mu_from_xHe is not None
                          else 1.0))
        _cp_eos = (_Rgas_code / _mu_eos0 if _gamma_eos == 1.0 else
                   _Rgas_code * _gamma_eos
                   / (_mu_eos0 * (_gamma_eos - 1.0)))
    if init_pars.get("lfix_unit_std") and _gamma_eos != 1.0:
        _mu_eos = float(eos_p.get("mu", 0.62))
        _cp_eos = 1.0 / (_gamma_eos - 1.0)
        if "unit_temperature" not in _units:
            _Rgas_cgs = 1.380649e-16 / 1.66053907e-24
            _units["unit_temperature"] = (
                _units.get("unit_velocity", 1.0) ** 2
                * (_mu_eos / _gamma_eos) / _Rgas_cgs)
    if "noeos" in mkf.get("EOS", ""):
        pass   # EOS=noeos: no thermodynamics, no sound-speed CFL
    elif "eos_fixed_ionization" in mkf.get("EOS", ""):
        # fixed-fraction plasma ≡ ideal gas with the Sackur-Tetrode zero
        # point (eos_fixed_ionization.f90) — cp/cs0 derived, γ = 5/3
        from ..physics.eos import fixed_ionization_pars
        _cpf, _cs0f = fixed_ionization_pars(
            float(eos_p.get("yh0", 0.0)), float(eos_p.get("xhe", 0.1)),
            _units.get("unit_length", 1.0),
            _units.get("unit_velocity", 1.0),
            _units.get("unit_density", 1.0),
            _units.get("unit_temperature", 1.0),
            float(eos_p.get("xh2", 0.0)))
        modules.append(EosIdealGas(
            gamma=5.0 / 3.0, cs0=_cs0f, cp=_cpf,
            rho0=float(eos_p.get("rho0", 1.0)),
        ))
    elif "eos_temperature_ionization" in mkf.get("EOS", ""):
        # (lnρ, lnT)-basis ionization EOS: explicit Saha at the evolved T
        from ..physics.eos import EosTemperatureIonization
        modules.append(EosTemperatureIonization(
            gamma=_gamma_eos,
            cs0=float(eos_p.get("cs0", 1.0)),
            rho0=float(eos_p.get("rho0", 1.0)),
            xHe=float(eos_p.get("xhe", 0.1)),
            unit_length=_units.get("unit_length", 1.0),
            unit_velocity=_units.get("unit_velocity", 1.0),
            unit_density=_units.get("unit_density", 1.0),
            unit_temperature=_units.get("unit_temperature", 1.0),
        ))
    elif ("eos_ionization" in mkf.get("EOS", "")
          and "temperature" not in mkf.get("EOS", "")):
        # EOS=eos_ionization: exact Saha + Sackur-Tetrode (lnρ, s) → T
        from ..physics.eos import EosIonizationFull
        modules.append(EosIonizationFull(
            gamma=_gamma_eos,
            cs0=float(eos_p.get("cs0", 1.0)),
            rho0=float(eos_p.get("rho0", 1.0)),
            xHe=float(eos_p.get("xhe", 0.1)),
            unit_length=_units.get("unit_length", 1.0),
            unit_velocity=_units.get("unit_velocity", 1.0),
            unit_density=_units.get("unit_density", 1.0),
            unit_temperature=_units.get("unit_temperature", 1.0),
        ))
    elif eos_p or "eos_init_pars" in start or "density_init_pars" in start:
        modules.append(EosIdealGas(
            gamma=_gamma_eos,
            cs0=float(eos_p.get("cs0", 1.0)),
            rho0=float(eos_p.get("rho0", 1.0)),
            cp=_cp_eos,
        ))

    # lweno_transport lives in the GENERAL run_pars (reference
    # src/param_io.f90: lweno_transport in &run_pars) and switches the
    # continuity + thermal-energy advection to WENO5 flux form.
    lweno = bool(run_pars.get("lweno_transport", False))

    den_p = grp("density")
    ent_p0 = _g(start, "entropy_init_pars")
    # DENSITY=experimental/boussinesq: no density evolution — the slot is
    # the incompressible projection module instead (appended after the
    # hydro/entropy groups are read; it needs Ra/Pr/beta_bouss from them)
    lbouss = "boussinesq" in mkf.get("DENSITY", "")
    # DENSITY=density_anelastic / experimental/anelastic: no continuity
    # equation — solenoidal projection + static lnrho auxiliary
    lanel = "anelastic" in mkf.get("DENSITY", "")
    if lanel:
        lbouss = True
    if ("density_init_pars" in start or den_p) and not lbouss:
        modules.append(Density(
            lweno_transport=lweno,
            # 'globaldisc' is provided by the centrifugal_balance IC
            # path; the ISM profiles by joint IC plug-ins (see below)
            init={"globaldisc": "zero", "Ferriere": "zero",
                  "thermal-hs": "zero", "Galactic-hs": "zero",
                  "Ferriere-hs": "zero", "isentropic-star": "zero"}.get(
                _init_name(den_p.get("initlnrho")),
                _init_name(den_p.get("initlnrho"))),
            ampl=float(_first(den_p.get("ampllnrho", 0.0))),
            rho_const=float(den_p.get("rho_const", 1.0)),
            width=float(den_p.get("widthlnrho", 0.05)),
            lupw_lnrho=bool(den_p.get("lupw_lnrho", False)),
            lnolog=bool(den_p.get("ldensity_nolog", False)),
            lrelativistic_eos=bool(den_p.get("lrelativistic_eos", False)),
            diffrho=float(den_p.get("diffrho", den_p.get("cdiffrho", 0.0))),
            diffrho_shock=float(den_p.get("diffrho_shock", 0.0)),
            # idiff selects the operators (reference src/density.f90
            # multi-select); samples only set a diffrho_* coefficient when
            # the matching idiff label is chosen, so presence == selection
            diffrho_hyper3=float(den_p.get("diffrho_hyper3", 0.0)),
            lhyper3_polar=any("sph" in str(v) or "cyl" in str(v)
                              for v in _as_tuple(den_p.get("idiff", ""))),
            diffrho_hyper3_mesh=float(den_p.get("diffrho_hyper3_mesh", 0.0)),
            diffrho_hyper3_aniso=_aniso3(den_p.get("diffrho_hyper3_aniso", 0.0)),
            rho_left=float(den_p.get("rho_left", 1.0)),
            rho_right=float(den_p.get("rho_right", 1.0)),
            kx=float(_first(den_p.get("kx_lnrho", 1.0))),
            ky=float(_first(den_p.get("ky_lnrho", 1.0))),
            kz=float(_first(den_p.get("kz_lnrho", 1.0))),
            phase=float(_first(den_p.get("phase_lnrho", 0.0))),
            mpoly=float(den_p.get(
                "mpoly", den_p.get("mpoly0", ent_p0.get("mpoly0", 1.5)))),
            eps_planet=float(den_p.get("eps_planet", 0.5)),
            radius_lnrho=float(_first(den_p.get("radius_lnrho", 1.0))),
            rbound=float(den_p.get("rbound", 1.0)),
            hh0=float(den_p.get("hh0", 0.0)),
            r_int=float(init_pars.get("r_int", 0.0)),
            r_ext=float(init_pars.get("r_ext", 0.0)),
            strati_type=str(den_p.get("strati_type", "lnrho_ss")),
            strati_data=(_read_stratification(path)
                         if "stratification"
                         in str(den_p.get("initlnrho", "")) else ()),
        ))

    dd_p = grp("dustdensity")
    dv_p = grp("dustvelocity")
    if cpar.get("ndustspec", 1) > 1 and (dd_p or dv_p):
        # multi-bin mass-binned dust with Smoluchowski coagulation
        from ..physics.dustbins import DustBins
        initnd = str(_first(dd_p.get("initnd", "kernel_cst")))
        modules.append(DustBins(
            ndustspec=int(cpar["ndustspec"]),
            md0=float(dv_p.get("md0", 1.0)),
            deltamd=float(dv_p.get("deltamd", 1.2)),
            dkern_cst=float(dd_p.get("dkern_cst", 1.0)),
            coag_kernel="lin" if initnd == "kernel_lin" else "cst",
            nd0=float(dd_p.get("nd0", 1.0)),
            mdave0=float(dd_p.get("mdave0", 1.0)),
            lmdvar=bool(dd_p.get("lmdvar", False)),
            ldustcoagulation=bool(dv_p.get("ldustcoagulation", True)),
        ))
    elif "dustdensity" in mkf.get("DUSTDENSITY", "") or dd_p or dv_p:
        from ..physics.dustfluid import DustFluid
        modules.append(DustFluid(
            tausd=float(_first(dv_p.get("tausd", 1.0))),
            nud=float(_first(dv_p.get("nud", 0.0))),
            nud_hyper3=float(_first(dv_p.get("nud_hyper3", 0.0))),
            diffnd=float(_first(dd_p.get("diffnd", 0.0))),
            diffnd_hyper3=float(_first(dd_p.get("diffnd_hyper3", 0.0))),
            diffnd_anisotropic=_aniso3(
                dd_p.get("diffnd_anisotropic", 0.0)),
            eps_dtog=float(dd_p.get("eps_dtog", 0.0)),
            ldragforce_gas=bool(dv_p.get("ldragforce_gas", False)),
            init=str(_first(dd_p.get("initnd", "zero"))),
            nd_const=float(_first(dd_p.get("nd_const", 1.0))),
            inituud=str(_first(dv_p.get("inituud", "zero"))),
            ampluud=float(_first(dv_p.get("ampluud", 0.0))),
            lshorttausd=bool(dv_p.get("ldustvelocity_shorttausd", False)),
            lnolog_nd=not bool(dd_p.get("ldustdensity_log", True)),
        ))

    pol_p = grp("polymer")
    if "nopolymer" not in mkf.get("POLYMER", "nopolymer") or pol_p:
        from ..physics.smallslots import Polymer
        modules.append(Polymer(
            tau_poly=float(pol_p.get("tau_poly", 1.0)),
            mu_poly=float(pol_p.get("mu_poly", 0.0)),
            diff_poly=float(pol_p.get("eta_poly", 1e-4)),
            poly_model=str(pol_p.get("poly_model", "oldroyd-B")),
            fenep_L=float(pol_p.get("fenep_l", 0.0)),
        ))

    cr_p = grp("cosmicray")
    if cr_p:
        from ..physics.cosmicray import CosmicRay
        modules.append(CosmicRay(
            gammacr=float(cr_p.get("gammacr", 4.0 / 3.0)),
            Kperp=float(cr_p.get("cosmicray_diff",
                                 cr_p.get("k_perp", 0.0))),
            Kpara=float(cr_p.get("k_para", 0.0)),
            init={"const_ecr": "const"}.get(str(cr_p.get("initecr", "const")),
                 str(cr_p.get("initecr", "const"))),
            ampl=float(cr_p.get("ecr_const", cr_p.get("amplecr", 0.0))),
        ))

    ch_p = grp("chiral")
    if ch_p:
        from ..physics.smallslots import Chiral
        modules.append(Chiral(
            chiral_diff=float(ch_p.get("chiral_diff", 0.0)),
            chiral_diffXX=float(ch_p.get("chiral_diffxx", -1.0)),
            crossinhibition=float(ch_p.get("chiral_crossinhibition", 1.0)),
            fidelity=float(ch_p.get("chiral_fidelity", 1.0)),
            initX=str(ch_p.get("initxx_chiral", "zero")),
            initY=str(ch_p.get("inityy_chiral", "zero")),
            amplX=float(ch_p.get("amplxx_chiral", 0.0)),
            amplY=float(ch_p.get("amplyy_chiral", 0.0)),
            radiusX=float(ch_p.get("radiusxx_chiral", 1.0)),
            radiusY=float(ch_p.get("radiusyy_chiral", 1.0)),
            xposX=float(ch_p.get("xposxx_chiral", 0.0)),
            xposY=float(ch_p.get("xposyy_chiral", 0.0)),
        ))

    nv_p = grp("neutralvelocity")
    nd_p = grp("neutraldensity")
    if nv_p or nd_p:
        from ..physics.neutrals import Neutrals
        modules.append(Neutrals(
            csn0=float(nv_p.get("csn0", 1.0)),
            colldrag=float(nv_p.get("colldrag", 0.0)),
            nun=float(nv_p.get("nun", 0.0)),
            electron_pressure=float(nv_p.get("electron_pressure", 1.0))
            if nv_p.get("lelectron_pressure") else 0.0,
            zeta=float(nd_p.get("zeta", 0.0)),
            alpha=float(nd_p.get("alpha", 0.0)),
            lnolog=bool(nd_p.get("lneutraldensity_nolog", False)),
            rhon0=float(nd_p.get("rhon_const", 1.0)),
            init=str(nv_p.get("inituun", "zero")),
        ))

    sg_p = grp("selfgrav")
    known.update({"poisson_init_pars", "poisson_run_pars"})
    if sg_p:
        import math as _math
        from ..physics.selfgravity import SelfGravity
        # reference: rhs_poisson_const = 4πG (src/selfgravity.f90:33,112)
        if float(sg_p.get("gravitational_const", 0.0)) > 0.0:
            G = float(sg_p.get("gravitational_const"))
        else:
            G = float(sg_p.get("rhs_poisson_const", 1.0)) / (4.0 * _math.pi)
        modules.append(SelfGravity(
            gravitational_const=G,
            lselfgravity_gas=bool(sg_p.get("lselfgravity_gas", True)),
            lselfgravity_dust=bool(sg_p.get("lselfgravity_dust", False)),
            lparticles_selfgravity=(
                "particles_selfgravity"
                in mkf.get("PARTICLES_SELFGRAVITY", "")),
            kappa=float(sg_p.get("kappa", 0.0)),
        ))

    hyd_p = grp("hydro")
    if "hydro_kinematic" in mkf.get("HYDRO", ""):
        from ..physics.hydro_kinematic import HydroKinematic
        kflow = str(hyd_p.get("kinematic_flow", "ABC"))
        modules.append(HydroKinematic(
            profile={"roberts": "roberts"}.get(kflow.lower(), kflow),
            ampl=float(hyd_p.get("ampl_kinflow", 1.0)),
            kx=float(hyd_p.get("kx_uukin", 1.0)),
            ky=float(hyd_p.get("ky_uukin", 1.0)),
            kz=float(hyd_p.get("kz_uukin", 1.0)),
            chi=float(hyd_p.get("chi_uukin", 45.0)),
            delta=float(hyd_p.get("del_uukin", 0.0)),
        ))
    elif ("hydro_init_pars" in start or hyd_p) \
            and "nohydro" not in mkf.get("HYDRO", "hydro"):
        modules.append(Hydro(
            lweno_transport=lweno,
            lisotropic_advection=bool(
                run_pars.get("lisotropic_advection", False)),
            lfargo_advection=bool(
                init_pars.get("lfargo_advection",
                              run_pars.get("lfargo_advection", False))),
            lfargoadvection_as_shift=bool(
                hyd_p.get("lfargoadvection_as_shift", True)),
            lcdt_tauf=bool(hyd_p.get("lcdt_tauf", False)),
            cdt_tauf=float(hyd_p.get("cdt_tauf", 1.0)),
            ulev=float(hyd_p.get("ulev", 1.0)),
            # pressure gradient only when density is computed
            # (hydro.f90:915: .not.ldensity → lpressuregradient_gas=F)
            lpressuregradient_gas=bool(
                hyd_p.get("lpressuregradient_gas", not lbouss)),
            lremove_mean_momenta=bool(
                hyd_p.get("lremove_mean_momenta", False)),
            init=_init_name(hyd_p.get("inituu")),
            init_list_pars=_list_pars(
                hyd_p, _init_name(hyd_p.get("inituu")),
                {"ampl": "ampluu", "kx": "kx_uu", "ky": "ky_uu",
                 "kz": "kz_uu", "width": "widthuu"}),
            ampl=float(_first(hyd_p.get(
                "ampluu", hyd_p.get("max_uu",
                                    hyd_p.get("ampl_uy", 0.0)
                                    if "anelastic" in str(
                                        hyd_p.get("inituu", ""))
                                    else 0.0)))),
            comp_pars=tuple(
                (float(_first(hyd_p.get(f"ampl_u{c}", 0.0))),
                 float(_first(hyd_p.get(f"kx_u{c}", 0.0))),
                 float(_first(hyd_p.get(f"ky_u{c}", 0.0))),
                 float(_first(hyd_p.get(f"kz_u{c}", 0.0))),
                 float(_first(hyd_p.get(f"phase_u{c}", 0.0))))
                for c in "xyz"),
            kx=float(hyd_p.get("kx_uu", 1.0)),
            ky=float(hyd_p.get("ky_uu", 1.0)),
            kz=float(hyd_p.get("kz_uu", 1.0)),
            width=float(hyd_p.get("widthuu", 0.1)),
            # cdata z1 is global; grav_init_pars is where samples set it
            z1=float(grp("grav").get("z1", grp("entropy").get("z1", 0.0))),
            uu_const=tuple(float(v) for v in _vec3(
                hyd_p.get("uu_const", [0.0, 0.0, 0.0]), [0.0, 0.0, 0.0])),
            # rnoise_int/ext default to the r_int/r_ext shell radii
            # (initcond.f90:4507-4508)
            rnoise_int=float(hyd_p.get(
                "rnoise_int", init_pars.get("r_int", 0.0))),
            rnoise_ext=float(hyd_p.get(
                "rnoise_ext", init_pars.get("r_ext", 0.0))),
            # with PARTICLES_DRAG active the Coriolis force is handed
            # over to the drag cell solve (hydro.f90:1122 lparticles_drag
            # → Omega terms skipped in duu_dt)
            Omega=(0.0 if "particles_drag" in mkf.get("PARTICLES_DRAG", "")
                   else float(hyd_p.get("omega", 0.0))),
            # run-time global pressure-gradient force (noentropy.f90:379):
            # merged beta (run.in wins) with the PHYSICAL Omega
            beta_glnrho_global=tuple(float(v) for v in _vec3(
                den_p.get("beta_glnrho_global", [0.0, 0.0, 0.0]),
                [0.0, 0.0, 0.0])),
            # IC-only value: the reference also reads beta_glnrho_global
            # from entropy_init_pars (entropy.f90:199 via use Density) —
            # start.in-only settings must reach the sub-Keplerian IC
            # without switching on the runtime pressure-gradient force
            beta_glnrho_init=(tuple(float(v) for v in _vec3(
                ent_p0["beta_glnrho_global"], [0.0, 0.0, 0.0]))
                if "beta_glnrho_global" in ent_p0 else None),
            Omega_pressure=float(hyd_p.get("omega", 0.0)),
            theta=float(hyd_p.get("theta", 0.0)),
            lupw_uu=bool(hyd_p.get("lupw_uu", False)),
            urand=float(hyd_p.get("urand", 0.0)),
            # cylinder/sphere-in-a-box damping (Taylor-Couette driving)
            dampuext=float(hyd_p.get("dampuext", 0.0)),
            dampuint=float(hyd_p.get("dampuint", 0.0)),
            wdamp=float(hyd_p.get("wdamp", 0.0)),
            lOmega_int=bool(hyd_p.get("lomega_int", False)),
            Omega_int=float(hyd_p.get("omega_int", 0.0)),
            rdampint=float(init_pars.get("r_int", 0.0)),
            rdampext=float(run_pars.get(
                "r_ext", init_pars.get("r_ext", 0.0))),
            lcylinder_in_a_box=bool(
                init_pars.get("lcylinder_in_a_box", False)),
        ))

    grav_p = grp("grav")
    if grav_p and "nogravity" not in mkf.get("GRAVITY", "nogravity"):
        # a grav_*_pars namelist with GRAVITY=nogravity is dead config the
        # reference ignores (e.g. samples/2d-tests/globaldisc, where the
        # central potential comes from POINTMASSES instead)
        gprof = str(grav_p.get("gravz_profile", "const"))
        gz = float(grav_p.get("gravz", 0.0))
        if gprof == "linear":
            # g_z = −ν_epi²·z (gravity_simple.f90 'linear')
            gz = -float(grav_p.get("nu_epicycle", 1.0)) ** 2
        modules.append(Gravity(
            gravz_profile=gprof,
            gravx_profile=str(grav_p.get("gravx_profile", "const")),
            gravx=float(grav_p.get("gravx", 0.0)),
            gravz=gz,
            zinfty=float(grav_p.get("zinfty", 0.0)),
            zref=float(grav_p.get("zref", 9e99)),
            unit_length=_units.get("unit_length", 1.0),
            unit_velocity=_units.get("unit_velocity", 1.0),
            # GRAVITY=gravity_r central potentials (gravity_r.f90)
            ipotential=str(_first(grav_p.get("ipotential", ""))),
            g0=float(grav_p.get("g0", 0.0)),
            qgshear=float(grav_p.get("qgshear", 1.5)),
            r0_pot=float(grav_p.get("r0_pot", 0.1)),
            n_pot=int(grav_p.get("n_pot", 10)),
            lcylindrical_gravity=bool(
                grav_p.get("lcylindrical_gravity",
                           init_pars.get("lcylindrical_gravity", False))),
        ))

    # BORDER_PROFILES: quenching (border_frac_*) + per-variable driving
    # (borderuu/borderlnrho/borderss/borderaa; border_profiles.f90)
    if "border_profiles" in mkf.get("BORDER_PROFILES", "") \
            and "noborder" not in mkf.get("BORDER_PROFILES", ""):
        from ..physics.border import BorderProfiles

        def _frac2(v):
            if isinstance(v, (list, tuple)):
                v = (list(v) + [0.0, 0.0])[:2]
                return (float(v[0]), float(v[1]))
            return (float(v), float(v))

        drv = []
        for stem, fields in (("hydro", ("borderuu", "uu")),
                             ("density", ("borderlnrho", None)),
                             ("entropy", ("borderss", "ss")),
                             ("magnetic", ("borderaa", "aa")),
                             ("pscalar", ("borderlncc", "lncc"))):
            pg = grp(stem)
            key2, fname = fields
            mode = pg.get(key2, "nothing")
            if isinstance(mode, (list, tuple)):
                mode = mode[0] if mode else "nothing"
            mode = str(mode)
            if mode in ("nothing", ""):
                continue
            if stem == "density":
                fname = "rho" if bool(
                    grp("density").get("ldensity_nolog", False)) else "lnrho"
            drv.append((fname, mode))
        curvi = grid.coords in ("cylindrical", "spherical")
        r_int_d = float(init_pars.get(
            "r_int", run_pars.get("r_int", grid.x0 if curvi else 0.0)))
        r_ext_d = float(init_pars.get(
            "r_ext", run_pars.get("r_ext",
                                  grid.x0 + grid.Lx if curvi else 9e99)))
        fac = 1.0 / (2.0 * _math.pi)
        if "gravity_r" in mkf.get("GRAVITY", ""):
            fac = _math.sqrt(max(float(grav_p.get("g0", 0.0)), 0.0)) \
                / (2.0 * _math.pi)
        modules.append(BorderProfiles(
            border_frac_x=_frac2(run_pars.get("border_frac_x", 0.0)),
            border_frac_y=_frac2(run_pars.get("border_frac_y", 0.0)),
            border_frac_z=_frac2(run_pars.get("border_frac_z", 0.0)),
            lborder_hyper_diff=bool(run_pars.get("lborder_hyper_diff",
                                                 True)),
            driving=tuple(drv),
            r_int_border=float(run_pars.get("r_int_border", 9e99)),
            r_ext_border=float(run_pars.get("r_ext_border", 9e99)),
            r_int=r_int_d, r_ext=r_ext_d,
            wborder_int=float(run_pars.get(
                "wborder_int", run_pars.get("wborder", 0.0))),
            wborder_ext=float(run_pars.get(
                "wborder_ext", run_pars.get("wborder", 0.0))),
            tborder=float(run_pars.get("tborder", 0.0)),
            fraction_tborder=float(run_pars.get("fraction_tborder", 1.0)),
            fac_sqrt_gsum1=fac,
            lcylinder_in_a_box=bool(init_pars.get("lcylinder_in_a_box",
                                                  False)),
            lsphere_in_a_box=bool(init_pars.get("lsphere_in_a_box",
                                                False)),
            lmeridional_border_drive=bool(run_pars.get(
                "lmeridional_border_drive", False)),
            theta_lower_border=float(run_pars.get(
                "theta_lower_border", 9e99)),
            wborder_theta_lower=float(run_pars.get(
                "wborder_theta_lower", 0.0)),
            theta_upper_border=float(run_pars.get(
                "theta_upper_border", 9e99)),
            wborder_theta_upper=float(run_pars.get(
                "wborder_theta_upper", 0.0)),
        ))

    ent_p = grp("entropy")
    ent_slot = mkf.get("ENTROPY", mkf.get("ENERGY", ""))
    if "thermal_energy" in ent_slot or "initeth" in ent_p:
        # ENERGY slot variant: thermal_energy (evolves eth = rho*cv*T;
        # reference src/thermal_energy.f90)
        from ..physics.thermal_energy import ThermalEnergy
        modules.append(ThermalEnergy(
            chi=float(ent_p.get("chi", 0.0)),
            chi_shock=float(ent_p.get("chi_shock", 0.0)),
            lweno_transport=lweno,
            lupw_eth=bool(ent_p.get("lupw_eth", False)),
            init=str(ent_p.get("initeth", "const")),
            eth_const=float(ent_p.get("eth_const", 1.0)),
            eth_left=float(ent_p.get("eth_left", 0.0)),
            eth_right=float(ent_p.get("eth_right", 0.0)),
            width=float(ent_p.get("widtheth", 0.05)),
        ))
    elif "temperature_ionization" in ent_slot:
        # ENERGY slot variant for chemistry/ionization runs: lnTT holder,
        # reactive heating contributed by the chemistry module
        from ..physics.chemistry_chemkin import TemperatureIonization
        modules.append(TemperatureIonization(
            lupw_lnTT=bool(ent_p.get("lupw_lntt", False)),
            lviscosity_heat=bool(ent_p.get("lviscosity_heat", True)),
            heat_uniform=float(ent_p.get("heat_uniform", 0.0)),
            initlnTT=str(_first(ent_p.get("initlntt", "nothing"))),
            lnTT_const=float(ent_p.get(
                "lntt_const", ent_p.get("tt_const", 0.0))),
        ))
    elif "temperature" in ent_slot or ent_p.get("ltemperature_nolog") \
            or "initlntt" in ent_p:
        # ENERGY slot variant: temperature_idealgas (evolves lnTT or TT)
        from ..physics.temperature import TemperatureIdealGas
        inits = ent_p.get("initlntt", "nothing")
        inits = inits if isinstance(inits, list) else [inits]
        ampls = ent_p.get("ampl_lntt", 0.0)
        ampls = ampls if isinstance(ampls, list) else [ampls]
        ampls = [a if a is not None else 0.0 for a in ampls]
        ihc_t = str(ent_p.get("iheatcond", ""))
        modules.append(TemperatureIdealGas(
            lnolog=bool(ent_p.get("ltemperature_nolog", False)),
            chi=float(ent_p.get("chi", 0.0)) if "chi" in ihc_t or not ihc_t
                else 0.0,
            hcond0=float(ent_p.get("hcond0", 0.0)) if "K-const" in ihc_t
                else 0.0,
            lviscosity_heat=bool(ent_p.get("lviscosity_heat", True)),
            TT_const=float(ent_p.get("tt_const", 0.0)),
            lADI="implicit" in mkf.get("IMPLICIT_PHYSICS", "")
                 and float(ent_p.get("kmax", 0.0)) > 0.0,
            Fbot=float(ent_p.get("fbot", 0.0)),
            Kmax=float(ent_p.get("kmax", 0.0)),
            Kmin=float(ent_p.get("kmin", 0.0)),
            Tbump=float(ent_p.get("tbump", 0.0)),
            hole_slope=float(ent_p.get("hole_slope", 0.0)),
            hole_width=float(ent_p.get("hole_width", 0.0)),
            init=str(inits[0]),
            init2=str(inits[1]) if len(inits) > 1 else "",
            ampl=float(ampls[0]) if ampls else 0.0,
            ampl2=float(ampls[1]) if len(ampls) > 1 else 0.0,
            radius=float(ent_p.get("radius_lntt", 0.1)),
            center1_z=float(ent_p.get("center1_z", 0.0)),
            lupw_lnTT=bool(ent_p.get("lupw_lntt", False)),
        ))
    elif ("entropy" in ent_slot and "noentropy" not in ent_slot) or ent_p:
        # NOTE: an empty &entropy_init_pars group alone does NOT select
        # the module — the Makefile default is ENERGY=noentropy
        # (reference src/Makefile.src:57)
        ihc = ent_p.get("iheatcond", "K-const")
        _ss_joint = {"Ferriere": "zero", "thermal-hs": "zero",
                     "Galactic-hs": "zero", "Ferriere-hs": "zero",
                     "isentropic-star": "zero", "mixinglength": "zero"}
        _ss_nm = _init_name(ent_p.get("initss"))
        _ss_nm = (tuple(_ss_joint.get(n, n) for n in _ss_nm)
                  if isinstance(_ss_nm, tuple)
                  else _ss_joint.get(_ss_nm, _ss_nm))
        # cooltype='shell': derive the boundary sound speeds from the
        # polytropic shell profile (entropy.f90:830-868: TT_int/ext from
        # beta1 = cp1·g0/(mpoly+1)·γ/γ_m1, then cs² = (γ−1)cp·TT)
        _shc = {"cooltype": str(ent_p.get("cooltype", ""))}
        if str(ent_p.get("cooltype", "")) == "shell":
            _eosm = next((m for m in modules if m.name == "eos"), None)
            _gam = _eosm.gamma if _eosm else 5.0 / 3.0
            _cp = getattr(_eosm, "cp", 1.0) if _eosm else 1.0
            _cs20 = _eosm.cs20 if _eosm else 1.0
            _gm1 = _gam - 1.0
            _g0s = float(grav_p.get("g0", 0.0))
            _mps = float(den_p.get("mpoly", ent_p.get("mpoly", 1.5)))
            _ri = float(init_pars.get("r_int", 0.0))
            _re = float(init_pars.get("r_ext", 1.0))
            _T0s = float(ent_p.get("t0", 0.0))
            _TTe = _T0s if _T0s != 0.0 else _cs20 / (_gm1 * _cp)
            _b1 = (1.0 / _cp) * _g0s / (_mps + 1.0) * _gam / _gm1
            _TTi = _TTe + _b1 * (1.0 / max(_ri, 1e-30) - 1.0 / _re)
            _shc = dict(cooltype="shell",
                        cool_ext=float(ent_p.get("cool_ext", 0.0)),
                        cool_int=float(ent_p.get("cool_int", 0.0)),
                        cs2_ext=_gm1 * _cp * _TTe,
                        cs2_int=_gm1 * _cp * _TTi,
                        rshell_int=_ri, rshell_ext=_re)
        # MLT runs: hcond0 and Fbot derive from mixinglength_flux
        # (initialize_energy, entropy.f90:669-671)
        _mlf = float(ent_p.get("mixinglength_flux", 0.0))
        _h0e = float(ent_p.get("hcond0", 0.0))
        _fbe = float(ent_p.get("fbot", 0.0))
        if _mlf != 0.0 and _h0e == 0.0:
            _gze = float(grp("grav").get("gravz", -1.0))
            _game = float(eos_p.get("gamma", 5.0 / 3.0))
            _h0e = (-_mlf * (float(ent_p.get("mpoly0", 1.5)) + 1.0)
                    * (_game - 1.0) / _game / _gze)
            if _fbe == 0.0:
                _fbe = _mlf
        modules.append(Entropy(
            **_shc,
            lweno_transport=lweno,
            init=_ss_nm,
            init_list_pars=_list_pars(
                ent_p, _init_name(ent_p.get("initss")),
                {"ampl": "ampl_ss", "radius": "radius_ss"}),
            ampl=float(_first(ent_p.get(
                "ampl_ss", ent_p.get("ss_const", 0.0)))),
            radius=float(_first(ent_p.get("radius_ss", 1.0))),
            center1=(float(ent_p.get("center1_x", 0.0)),
                     float(ent_p.get("center1_y", 0.0)),
                     float(ent_p.get("center1_z", 0.0))),
            width=float(ent_p.get("widthss", 0.05)),
            iheatcond=_as_tuple(ihc),
            hcond0=_h0e,
            chi=float(ent_p.get("chi", 0.0)),
            chi_shock=float(ent_p.get("chi_shock", 0.0)),
            chi_hyper3=float(ent_p.get("chi_hyper3", 0.0)),
            chi_hyper3_mesh=float(ent_p.get("chi_hyper3_mesh", 0.0)),
            chi_hyper3_aniso=_aniso3(ent_p.get("chi_hyper3_aniso", 0.0)),
            tau_cool=float(ent_p.get("tau_cool", 0.0)),
            TTref_cool=float(ent_p.get("ttref_cool", 0.0)),
            lupw_ss=bool(ent_p.get("lupw_ss", False)),
            lthdiff_Hmax=bool(ent_p.get("lthdiff_hmax", False)),
            luminosity=float(ent_p.get("luminosity", 0.0)),
            wheat=float(ent_p.get("wheat", 0.1)),
            cool=float(ent_p.get("cool", 0.0)),
            wcool=float(ent_p.get("wcool", 0.2)),
            zcool=float(ent_p.get("zcool", 0.0)),
            cooling_profile=str(ent_p.get("cooling_profile",
                                          "gaussian")),
            cs2cool=float(ent_p.get("cs2cool", 0.0)),
            rcool=float(ent_p.get("rcool", 0.0)),
            r_ext=float(init_pars.get("r_ext",
                                      run_pars.get("r_ext", 1.0))),
            mpoly0=float(ent_p.get("mpoly0", 1.0)),
            mpoly1=float(ent_p.get("mpoly1", 3.0)),
            mpoly2=float(ent_p.get("mpoly2", 0.0)),
            z1=float(grav_p.get("z1", ent_p.get("z1", 0.0))),
            z2=float(grav_p.get("z2", ent_p.get("z2", 1.0))),
            isothtop=int(ent_p.get("isothtop", 1)),
            T0=float(ent_p.get("t0", 1.0)),
            sigmaSBt=float(run_pars.get(
                "sigmasbt", eos_p.get("sigmasbt",
                                      init_pars.get("sigmasbt", 0.0)))),
            chi_t=float(ent_p.get("chi_t", 0.0)),
            chit_prof1=float(ent_p.get("chit_prof1", 1.0)),
            chit_prof2=float(ent_p.get("chit_prof2", 1.0)),
            Fbot=_fbe,
            Ftop=float(ent_p.get("ftop", 0.0)),
            hcond0_kramers=float(ent_p.get("hcond0_kramers", 0.0)),
            nkramers=float(ent_p.get("nkramers", 1.0)),
            chimax_kramers=float(ent_p.get("chimax_kramers", 0.0)),
            chimin_kramers=float(ent_p.get("chimin_kramers", 0.0)),
            chi_t1=float(ent_p.get("chi_t1", 0.0))
            if bool(ent_p.get("lchit_fluct", False)) else 0.0,
            chi_cspeed=float(ent_p.get("chi_cspeed", 0.5)),
            heat_uniform=float(ent_p.get("heat_uniform", 0.0)),
            cool_uniform=float(ent_p.get("cool_uniform", 0.0)),
            hcond_table=_read_hcond_glhc(path)
            if bool(ent_p.get("lread_hcond", False)) else (),
            ss_left=float(ent_p.get("ss_left", 0.0)),
            ss_right=float(ent_p.get("ss_right", 0.0)),
        ))

    if lbouss:
        from ..physics.boussinesq import Boussinesq
        modules.append(Boussinesq(
            Ra=float(hyd_p.get("ra", 0.0)),
            Pr=float(hyd_p.get("pr", 0.0)),
            beta_bouss=float(ent_p.get("beta_bouss", -1.0)),
        ))
        if lanel:
            from ..physics.boussinesq import DensityAnelastic
            modules.append(DensityAnelastic(
                init=_init_name(den_p.get("initlnrho", "")),
                gravz=float(grp("grav").get("gravz", 0.0)),
            ))

    vis_p = grp("viscosity")
    if vis_p:
        modules.append(Viscosity(
            ivisc=tuple(str(v) for v in _as_tuple(vis_p.get("ivisc", "nu-const"))),
            nu=float(vis_p.get("nu", 0.0)),
            nu_hyper3=float(vis_p.get("nu_hyper3", 0.0)),
            nu_shock=float(vis_p.get("nu_shock", 0.0)),
            nu_cspeed=float(vis_p.get("nu_cspeed", 0.5)),
            zeta=float(vis_p.get("zeta", 0.0)),
            nu_aniso_hyper3=_aniso3(vis_p.get("nu_aniso_hyper3", 0.0)),
            limplicit_viscosity=bool(
                vis_p.get("limplicit_viscosity", False)),
        ))

    chm_p = grp("chemistry")
    if "chemistry" in mkf.get("CHEMISTRY", "") \
            and "nochemistry" not in mkf.get("CHEMISTRY", ""):
        cheminp = os.path.join(path, "chem.inp")
        mdat = os.path.join(path, "chemistry_m.dat")
        pdat = os.path.join(path, "chemistry_p.dat")
        if os.path.exists(cheminp):
            # detailed CHEMKIN mechanism (lcheminp path)
            from .chemkin import parse_air_dat, parse_chem_inp
            from ..physics.chemistry_chemkin import ChemistryChemkin
            mech = parse_chem_inp(cheminp)
            T0, P0, fracs = 300.0, 1.013e6, {}
            if str(chm_p.get("initchem", "")) in ("air",
                                                    "flame_front"):
                for fn in ("air.dat", "air.in"):
                    fp = os.path.join(path, fn)
                    if os.path.exists(fp):
                        T0, P0, fracs = parse_air_dat(fp)
                        break
            from .chemkin import parse_tran_dat
            trandat = os.path.join(path, "tran.dat")
            tran = parse_tran_dat(trandat, mech.species) \
                if os.path.exists(trandat) else None
            modules.append(ChemistryChemkin(
                mech=mech,
                tran=tran,
                init=str(chm_p.get("initchem", "air")),
                T_init=T0, P_init=P0,
                Y_init=tuple(sorted(fracs.items())),
                lreactions=bool(chm_p.get("lreactions", True)),
                ladvection=bool(chm_p.get("ladvection", True)),
                ldiffusion=bool(chm_p.get("ldiffusion", True)),
                lheatc_chemistry=bool(chm_p.get("lheatc_chemistry", True)),
                lDiff_simple=bool(chm_p.get("ldiff_simple", False)),
                lThCond_simple=bool(chm_p.get("lthcond_simple", False)),
                lfilter=bool(chm_p.get("lfilter", False)),
                init_TT1=float(chm_p.get("init_tt1", 298.0)),
                init_TT2=float(chm_p.get("init_tt2", 2400.0)),
                init_x1=float(chm_p.get("init_x1", -0.2)),
                init_x2=float(chm_p.get("init_x2", 0.2)),
                init_ux=float(chm_p.get("init_ux", 0.0)),
                init_pressure=float(chm_p.get("init_pressure", 1.013e6)),
                init_file=(os.path.join(path, str(chm_p.get("file_name")))
                           if chm_p.get("file_name") else ""),
                flame_pos=float(_first(chm_p.get("flame_pos", 0.0))),
            ))
            nsc_p = grp("nscbc")
            known.update({"NSCBC_init_pars", "NSCBC_run_pars"})
            nsc_p.update(_g(start, "NSCBC_init_pars"))
            nsc_p.update(_g(run, "NSCBC_run_pars"))
            if nsc_p.get("nscbc_bc"):
                from ..physics.nscbc import NSCBC
                bcspec = nsc_p["nscbc_bc"]
                bcspec = bcspec if isinstance(bcspec, list) else [bcspec]
                xbc = str(bcspec[0] or "")
                lo, _, hi = xbc.partition(":")
                # inlet targets from the 'set' boundary values: slot
                # order uu(3), lnrho, lnTT, species (NSCBC.f90 u_t/T_t/YYk
                # are the fbcx values of those components)
                import math as _math

                def _fbc_targets(key):
                    fb = init_pars.get(key) or run_pars.get(key) or []
                    fb = [float(v) for v in
                          (fb if isinstance(fb, list) else [fb])]
                    if len(fb) < 5:
                        return 0.0, 0.0, ()
                    return fb[0], _math.exp(fb[4]), tuple(fb[5:])
                u_lo, T_lo, Y_lo = _fbc_targets("fbcx1")
                u_hi, T_hi, Y_hi = _fbc_targets("fbcx2")
                modules.append(NSCBC(
                    nscbc_bc_x=(lo, hi),
                    nscbc_sigma_out=float(nsc_p.get("nscbc_sigma_out",
                                                    1.0)),
                    nscbc_sigma_in=float(nsc_p.get("nscbc_sigma_in",
                                                   1.0)),
                    p_infty=float(nsc_p.get("p_infty", 1.013e6)),
                    u_t_x=(u_lo, u_hi),
                    T_t_x=(T_lo, T_hi),
                    Y_in_x=(Y_lo, Y_hi),
                ))
        elif os.path.exists(mdat) and os.path.exists(pdat):
            # kreactions tables ('Axel case', e.g. chemistry_GrayScott)
            from .chemkin import parse_kreactions
            from ..physics.chemistry import Chemistry
            spnames, reactions = parse_kreactions(mdat, pdat)
            pref = chm_p.get("chem_diff_prefactor", 1.0)
            pref = pref if isinstance(pref, list) else [pref]
            pref = (pref * len(spnames))[: len(spnames)]
            cdiff = float(chm_p.get("chem_diff", 0.0))
            ak = chm_p.get("amplchemk", 0.0)
            ak = ak if isinstance(ak, list) else [ak]
            ak2 = chm_p.get("amplchemk2", 0.0)
            ak2 = ak2 if isinstance(ak2, list) else [ak2]
            modules.append(Chemistry(
                species=tuple(spnames),
                reactions=reactions,
                diff=tuple(cdiff * float(p) for p in pref),
                ladvect="nohydro" not in mkf.get("HYDRO", "hydro"),
                init=str(chm_p.get("initchem", "zero")),
                width=float(chm_p.get("widthchem", 0.1)),
                ampl_k=tuple(float(a) for a in ak),
                ampl2_k=tuple(float(a) for a in ak2),
            ))

    # ---- solid_cells: immersed bodies (SOLID_CELLS=solid_cells) ---------
    if "solid_cells" in mkf.get("SOLID_CELLS", "") \
            and "nosolid_cells" not in mkf.get("SOLID_CELLS", ""):
        sc_p = grp("solid_cells")
        known.update({"solid_cells_init_pars", "solid_cells_run_pars"})
        sc_p.update(_g(start, "solid_cells_init_pars"))
        sc_p.update(_g(run, "solid_cells_run_pars"))
        from ..physics.solid_cells import SolidCells
        from ..physics.solid_cells import _as_tuple as _sc_tuple
        ncyl = int(sc_p.get("ncylinders", 0))
        modules.append(SolidCells(
            ncylinders=ncyl,
            cylinder_radius=_sc_tuple(sc_p.get("cylinder_radius", ())),
            cylinder_xpos=_sc_tuple(sc_p.get("cylinder_xpos", (0.0,) * ncyl)),
            cylinder_ypos=_sc_tuple(sc_p.get("cylinder_ypos", (0.0,) * ncyl)),
            cylinder_zpos=_sc_tuple(sc_p.get("cylinder_zpos", (0.0,) * ncyl)),
            cylinder_temp=_sc_tuple(sc_p.get("cylinder_temp",
                                             (703.0,) * ncyl)),
            initsolid_cells=str(sc_p.get("initsolid_cells", "nothing")),
            init_uu=float(sc_p.get("init_uu", 0.0)),
            skin_depth=float(sc_p.get("skin_depth", 0.0)),
            ampl_noise=float(sc_p.get("ampl_noise", 0.0)),
            interpolation_method=str(sc_p.get("interpolation_method",
                                              "staircase")),
            nforcepoints=int(sc_p.get("nforcepoints", 200)),
            close_interpolation_method=int(
                sc_p.get("close_interpolation_method", 1)),
            lclose_interpolation=bool(sc_p.get("lclose_interpolation",
                                               False)),
            lclose_linear=bool(sc_p.get("lclose_linear", False)),
            limit_close_linear=float(sc_p.get("limit_close_linear", 0.5)),
            seed0=int(init_pars.get("seed0", 1812)),
            rng_kind=str(run_pars.get("random_gen",
                                      init_pars.get("random_gen",
                                                    "min_std"))),
        ))

    # ---- NSCBC outside the chemistry build (NSCBC=NSCBC, e.g. the
    # solid-cells cylinder samples: y-axis part_ref_inlet/outlet) --------
    if "NSCBC" in mkf.get("NSCBC", "") \
            and not any(m.name == "nscbc" for m in modules):
        nsc_p = grp("nscbc")
        known.update({"NSCBC_init_pars", "NSCBC_run_pars"})
        nsc_p.update(_g(start, "NSCBC_init_pars"))
        nsc_p.update(_g(run, "NSCBC_run_pars"))
        if nsc_p.get("nscbc_bc"):
            from ..physics.nscbc import NSCBC
            bcspec = nsc_p["nscbc_bc"]
            bcspec = bcspec if isinstance(bcspec, list) else [bcspec]
            while len(bcspec) < 3:
                bcspec.append("")
            sides = []
            for a in range(3):
                lo, _, hi = str(bcspec[a] or "").partition(":")
                sides.append((lo, hi))
            # u_t per axis from fbc<axis>(normal velocity component)
            # (NSCBC.f90:287-296; component order ux,uy,uz,...)
            uts = []
            for a, ax in enumerate("xyz"):
                lo_arr = init_pars.get(f"fbc{ax}",
                                       init_pars.get(f"fbc{ax}1"))
                hi_arr = init_pars.get(f"fbc{ax}2")
                def _val(arr):
                    if isinstance(arr, list) and len(arr) > a:
                        return float(arr[a])
                    return 0.0
                uts.append((_val(lo_arr), _val(hi_arr)))
            modules.append(NSCBC(
                nscbc_bc_x=sides[0],
                nscbc_bc_y=sides[1],
                nscbc_sigma_out=float(nsc_p.get("nscbc_sigma_out", 1.0)),
                nscbc_sigma_in=float(nsc_p.get("nscbc_sigma_in", 1.0)),
                p_infty=float(nsc_p.get("p_infty", 1.013e6)),
                u_t_x=uts[0],
                u_t_y=uts[1],
            ))

    mag_p = grp("magnetic")
    id_p = grp("implicit_diff")   # &implicit_diffusion_run_pars
    known.add("implicit_diffusion_run_pars")
    id_p.update(_g(run, "implicit_diffusion_run_pars"))
    if "bfield" in mkf.get("MAGNETIC", ""):
        # MAGNETIC=bfield: evolve B directly (src/bfield.f90); implicit
        # resistivity is integrated spectrally after each step
        from ..physics.bfield import Bfield
        bext = _vec3(mag_p.get("b_ext", [0.0, 0.0, 0.0]), [0.0, 0.0, 0.0])
        modules.append(Bfield(
            eta=float(mag_p.get("eta", 0.0)),
            B_ext=tuple(float(b) for b in bext),
            limplicit_resistivity=bool(
                mag_p.get("limplicit_resistivity", False)),
        ))
    elif ("magnetic_init_pars" in start or mag_p) \
            and "nomagnetic" not in mkf.get("MAGNETIC", "magnetic"):
        bext = mag_p.get("b_ext", [0.0, 0.0, 0.0])
        mf_p = grp("magn_mf")   # MAGNETIC_MEANFIELD namelists
        dem_p = grp("magn_mf_demfdt")  # MAGNETIC_MEANFIELD_DEMFDT sub-slot
        modules.append(Magnetic(
            # 'Ferriere-uniform-By' is density-dependent → provided by the
            # ISM joint IC plug-in (initcond.f90:6772 ferriere_uniform_y)
            init={"Ferriere-uniform-By": "zero",
                  "Ferriere-uniform-Bx": "zero"}.get(
                _init_name(mag_p.get("initaa")),
                _init_name(mag_p.get("initaa"))),
            init_list_pars=_list_pars(
                mag_p, _init_name(mag_p.get("initaa")),
                {"ampl": "amplaa", "kx": "kx_aa", "ky": "ky_aa",
                 "kz": "kz_aa"}),
            ampl=float(_first(mag_p.get("amplaa", 0.0))),
            relhel_aa=float(mag_p.get("relhel_aa", 1.0)),
            rnoise_int=float(mag_p.get(
                "rnoise_int", init_pars.get("r_int", 0.0))),
            rnoise_ext=float(mag_p.get(
                "rnoise_ext", init_pars.get("r_ext", 0.0))),
            kx=float(_first(mag_p.get("kx_aa", 1.0))),
            ky=float(_first(mag_p.get("ky_aa", 1.0))),
            kz=float(_first(mag_p.get("kz_aa", 1.0))),
            radius=float(mag_p.get("radius", 1.0)),
            epsilonaa=float(mag_p.get("epsilonaa", 0.0)),
            center1=(float(mag_p.get("center1_x", 0.0)),
                     float(mag_p.get("center1_y", 0.0)),
                     float(mag_p.get("center1_z", 0.0))),
            r_int=float(init_pars.get("r_int", 0.0)),
            r_ext=float(init_pars.get("r_ext", 1.0)),
            inclaa=float(mag_p.get("inclaa", 0.0)),
            lrelativistic_eos=bool(den_p.get("lrelativistic_eos", False)),
            eta=float(mag_p.get("eta", 0.0)),
            eta_hyper3=float(mag_p.get("eta_hyper3", 0.0)),
            eta_shock=float(mag_p.get("eta_shock", 0.0))
            if ({"eta-shock", "eta_shock", "shock"}
                & set(str(v) for v in
                      _as_tuple(mag_p.get("iresistivity", "")))) else 0.0,
            zdep_profile=str(mag_p.get("zdep_profile", "fs"))
            if ({"zdep", "eta-zdep"}
                & set(str(v) for v in
                      _as_tuple(mag_p.get("iresistivity", "")))) else "",
            lresi_shell=("shell" in set(
                str(v) for v in _as_tuple(mag_p.get("iresistivity", "")))),
            eta_int=float(mag_p.get("eta_int", 0.0)),
            eta_ext=float(mag_p.get("eta_ext", 0.0)),
            wresistivity=float(mag_p.get("wresistivity", 0.01)),
            eta_z0=float(mag_p.get("eta_z0", 1.0)),
            eta_zwidth=float(mag_p.get("eta_zwidth", 0.0)),
            eta_jump=float(mag_p.get("eta_jump", 0.0)),
            lweyl_gauge=bool(mag_p.get("lweyl_gauge", False)),
            limplicit_resistivity=bool(
                mag_p.get("limplicit_resistivity", False)),
            ladvective_gauge=bool(mag_p.get("ladvective_gauge", False)),
            lohmic_heat=bool(mag_p.get("lohmic_heat", True)),
            lboris_correction=bool(
                mag_p.get("lboris_correction", False)),
            va2max_boris=float(mag_p.get("va2max_boris", 0.0)),
            magnetogram_file=os.path.join(path, "driver", "mag_field.dat"),
            unit_magnetic=_units.get("unit_magnetic", 1.0),
            mu0=_mu0_code,
            battery_term=float(mag_p.get("battery_term", 0.0)),
            hall_term=float(mag_p.get("hall_term", 0.0)),
            llorentzforce=bool(mag_p.get("llorentzforce", True)),
            meanfield_alpha=float(mf_p.get("alpha_effect", 0.0)),
            meanfield_etat=float(mf_p.get("meanfield_etat", 0.0)),
            lmagn_mf_demfdt="demfdt" in mkf.get(
                "MAGNETIC_MEANFIELD_DEMFDT", ""),
            tau_emf=float(dem_p.get("tau_emf", 0.0)),
            tau1_emf=float(dem_p.get("tau1_emf", 0.0)),
            eta_emf_over_etat=float(dem_p.get("eta_emf_over_etat", 0.0)),
            meanfield_kf=float(mf_p.get("meanfield_kf", 1.0)),
            omega_profile=str(mf_p.get("omega_profile", "nothing"))
            if bool(mf_p.get("lomega_effect", False)) else "nothing",
            omega_ampl=float(mf_p.get("omega_ampl", 0.0)),
            B_ext=tuple(float(b) for b in bext),
        ))

    for_p = grp("forcing")
    if for_p:
        kf = float(for_p.get("kf", 0.0))
        kdat = os.path.join(path, "k.dat")
        if kf == 0.0 and os.path.exists(kdat):
            # first line of k.dat: n_vectors, mean |k| (reference forcing
            # reads the shell from this file, src/forcing.f90)
            with open(kdat) as f:
                kf = float(f.readline().split()[1])
        modules.append(Forcing(
            # reference default iforce='zero' → no stochastic kick unless
            # the run sets iforce (forcing.f90:40); force=0 encodes that
            force=(float(for_p.get("force", 0.02))
                   if str(for_p.get("iforce", "zero")) != "zero" else 0.0),
            kf=kf or 3.0,
            relhel=float(for_p.get("relhel", 1.0)),
            lforcing_cont=bool(for_p.get("lforcing_cont", False)),
            iforcing_cont=str(_first(for_p.get("iforcing_cont", ""))),
            ampl_ff=float(_first(for_p.get("ampl_ff", 0.0))),
            k1_ff=float(for_p.get("k1_ff", 1.0)),
            lscale_kvector_tobox=bool(
                for_p.get("lscale_kvector_tobox", False)),
            fcont_box=(grid.x0, grid.x0 + grid.Lx,
                       grid.z0, grid.z0 + grid.Lz),
        ))

    shear_p = grp("shear")
    if shear_p:
        modules.append(Shear(
            qshear=float(shear_p.get("qshear", 1.5)),
            Omega=float(shear_p.get("omega", hyd_p.get("omega", 1.0))),
            Sshear=float(shear_p.get("sshear", 0.0)),
            lshearadvection_as_shift=bool(
                shear_p.get("lshearadvection_as_shift", False)),
        ))

    tf_p = grp("testfield")
    if "testfield_xz" in mkf.get("TESTFIELD", ""):
        from ..physics.testfield import TestfieldXZ
        modules.append(TestfieldXZ(
            etatest=float(tf_p.get("etatest", 1e-2)),
            ktestfield_x=float(tf_p.get("ktestfield_x", 1.0)),
            ktestfield_z=float(tf_p.get("ktestfield_z", 1.0)),
            xx0=float(tf_p.get("xx0", 0.0)),
            zz0=float(tf_p.get("zz0", 0.0)),
            lsoca=bool(tf_p.get("lsoca", True)),
        ))
    elif tf_p or "testfield" in mkf.get("TESTFIELD", ""):
        from ..physics.testfield import TestfieldZ
        modules.append(TestfieldZ(
            etatest=float(tf_p.get("etatest", 1e-2)),
            ktestfield=float(tf_p.get("ktestfield", 1.0)),
            lsoca=bool(tf_p.get("lsoca", True)),
            leta_rank2=bool(tf_p.get("leta_rank2", True)),
        ))

    pq_p = grp("pointmasses")
    if pq_p and "pointmasses" in mkf.get("POINTMASSES", ""):
        from ..physics.pointmasses import PointMasses
        pmv = pq_p.get("pmass", [1.0])
        pmv = pmv if isinstance(pmv, list) else [pmv]
        xq0 = pq_p.get("xq0", [0.0] * len(pmv))
        xq0 = xq0 if isinstance(xq0, list) else [xq0]
        rsm = pq_p.get("r_smooth", [0.0] * len(pmv))
        rsm = rsm if isinstance(rsm, list) else [rsm]
        ipot = _as_tuple(pq_p.get("ipotential_pointmass", ()))
        lcyl = _as_tuple(pq_p.get("lcylindrical_gravity_nbody", ()))
        modules.append(PointMasses(
            pmass=tuple(float(v) for v in pmv),
            xq0=tuple(float(v) for v in xq0),
            r_smooth=tuple(float(v) for v in rsm)
            if "r_smooth" in pq_p else (),
            iprimary=int(pq_p.get("iprimary", 1)),
            GNewton=float(pq_p.get("gnewton", 1.0)),
            initxxq=str(pq_p.get("initxxq", "fixed-cm")),
            initvvq=str(pq_p.get("initvvq", "fixed-cm")),
            lreset_cm=bool(pq_p.get("lreset_cm", False)),
            ipotential=tuple(str(v) for v in ipot),
            lcylindrical_gravity=tuple(bool(v) for v in lcyl),
            frac_smooth=float(_first(pq_p.get("frac_smooth", 0.4))),
        ))

    shk_p = grp("shock")
    shock_slot = mkf.get("SHOCK", "")
    if (shk_p or any("shock" in str(v) for v in
                     _as_tuple(vis_p.get("ivisc", "")))
            or float(ent_p.get("chi_shock", 0.0)) != 0.0
            or ("shock" in shock_slot and "noshock" not in shock_slot)):
        modules.append(Shock(
            variant="highorder" if "highorder" in shock_slot else "original",
            ishock_max=int(shk_p.get("ishock_max", 1)),
            lgaussian_smooth=bool(shk_p.get("lgaussian_smooth", False)),
            lconvergence_only=bool(shk_p.get("lconvergence_only", True)),
            shock_div_pow=float(shk_p.get("shock_div_pow", 1.0)),
        ))

    rad_p = grp("radiation")
    rad_slot = mkf.get("RADIATION", "")
    if "radiation" in rad_slot and "noradiation" not in rad_slot:
        # RADIATION=radiation_ray (src/radiation_ray.f90): long-
        # characteristics transfer; physical constants enter in code
        # units (register.f90:270-310)
        from ..physics.radiation import RadiationRay
        _ul = _units.get("unit_length", 1.0)
        _uv = _units.get("unit_velocity", 1.0)
        _ud = _units.get("unit_density", 1.0)
        _ut = _units.get("unit_temperature", 1.0)
        _um = _ud * _ul ** 3
        _uflux = _ud * _uv ** 3
        bcr = rad_p.get("bc_rad", ["0:0", "0:0", "S:0"])
        bcr = list(_as_tuple(bcr))
        if len(bcr) == 1:
            bcr = bcr * 3
        bc_rad = tuple(
            tuple(str(b).split(":")) if ":" in str(b)
            else (str(b), str(b)) for b in bcr)
        modules.append(RadiationRay(
            radx=int(rad_p.get("radx", 0)),
            rady=int(rad_p.get("rady", 0)),
            radz=int(rad_p.get("radz", 1)),
            rad2max=int(rad_p.get("rad2max", 1)),
            angle_weight=str(rad_p.get("angle_weight", "corrected")),
            lfix_radweight_1d=bool(rad_p.get("lfix_radweight_1d", True)),
            bc_rad=bc_rad,
            source_function_type=str(
                rad_p.get("source_function_type", "LTE")),
            opacity_type=str(rad_p.get("opacity_type", "Hminus")),
            lcooling=bool(rad_p.get("lcooling", True)),
            lradflux=bool(rad_p.get("lradflux", False)),
            lradpressure=bool(rad_p.get("lradpressure", False)),
            scalefactor_Srad=float(_first(
                rad_p.get("scalefactor_srad", 1.0))),
            scalefactor_kappa=float(_first(
                rad_p.get("scalefactor_kappa", 1.0))),
            scalefactor_cooling=float(
                rad_p.get("scalefactor_cooling", 1.0)),
            scalefactor_radpressure=float(
                rad_p.get("scalefactor_radpressure", 1.0)),
            kappa_cst=float(_first(rad_p.get("kappa_cst", 1.0))),
            kapparho_cst=float(rad_p.get("kapparho_cst", 1.0)),
            kappa_Kconst=float(rad_p.get("kappa_kconst", 1.0)),
            kapparho_floor=float(rad_p.get("kapparho_floor", 0.0)),
            kappa_ceiling=float(rad_p.get("kappa_ceiling", 1e30)),
            yMetals=float(eos_p.get("ymetals", 0.0)),
            Frad_boundary_ref=float(
                rad_p.get("frad_boundary_ref", 0.0)),
            TT_top=float(rad_p.get("tt_top", 0.0)),
            TT_bot=float(rad_p.get("tt_bot", 0.0)),
            tau_top=float(rad_p.get("tau_top", 0.0)),
            tau_bot=float(rad_p.get("tau_bot", 0.0)),
            lcutoff_opticallythin=bool(
                rad_p.get("lcutoff_opticallythin", False)),
            lcutoff_zconst=bool(rad_p.get("lcutoff_zconst", False)),
            z_cutoff=float(rad_p.get("z_cutoff", 0.0)),
            cool_wid=float(rad_p.get("cool_wid", 1.0)),
            lno_rad_heating=bool(rad_p.get("lno_rad_heating", False)),
            qrad_max=float(rad_p.get("qrad_max", 0.0)),
            cdtrad=float(rad_p.get("cdtrad", 0.1)),
            cdtrad_thin=float(rad_p.get("cdtrad_thin", 1.0)),
            cdtrad_thick=float(rad_p.get("cdtrad_thick", 0.25)),
            lcdtrad_old=bool(rad_p.get("lcdtrad_old", True)),
            sigmaSB=5.6704e-5 / (_uflux / _ut ** 4),
            kappa_es=3.4e-1 / (_ul ** 2 / _um),
            c_light=2.99792458e10 / _uv,
            unit_length=_ul,
            unit_density=_ud,
            unit_temperature=_ut,
        ))

    psc_p = grp("pscalar")
    if psc_p:
        pinit = str(psc_p.get("initcc", psc_p.get("initlncc", "zero")))
        pinit = {"wave-z": "sinwave-z"}.get(pinit, pinit)
        pampl = float(_first(psc_p.get("amplcc",
                                       psc_p.get("ampllncc", 0.0))))
        if pinit == "constant":
            # f(ilncc) = log(cc_const) (pscalar.f90:161)
            import math as _math
            pinit = "const"
            pampl = _math.log(float(psc_p.get("cc_const", 1.0)))
        modules.append(PassiveScalar(
            init=pinit,
            ampl=pampl,
            diffcc=float(psc_p.get("pscalar_diff", psc_p.get("diffcc", 0.0))),
        ))

    asc_p = grp("ascalar")
    if asc_p and "noascalar" not in mkf.get("ASCALAR", "noascalar"):
        from ..physics.smallslots import CondensingScalar
        _pp_asc = grp("particles")
        modules.append(CondensingScalar(
            ascalar_diff=float(asc_p.get("ascalar_diff", 0.0)),
            thermal_diff=float(asc_p.get("thermal_diff", 0.0)),
            lttc=bool(asc_p.get("lttc", False)),
            lttc_mean=bool(asc_p.get("lttc_mean", False)),
            lbuoyancy=bool(asc_p.get("lbuoyancy", False)),
            lcondensation_rate=bool(
                asc_p.get("lcondensation_rate", False)),
            acc_const=float(asc_p.get("acc_const", 0.0)),
            ttc_const=float(asc_p.get("ttc_const", 0.0)),
            latent_heat=float(asc_p.get("latent_heat", 2.5e6)),
            cp_constant=float(asc_p.get("cp_constant", 1005.0)),
            const1_qvs=float(asc_p.get("const1_qvs", 2.53e11)),
            const2_qvs=float(asc_p.get("const2_qvs", 5420.0)),
            Rv=float(asc_p.get("rv", 461.5)),
            rhoa=float(asc_p.get("rhoa", 1.0)),
            gravity_acceleration=float(
                asc_p.get("gravity_acceleration", 9.81)),
            Rv_over_Rd_minus_one=float(
                asc_p.get("rv_over_rd_minus_one", 0.608)),
            T_env=float(asc_p.get("t_env", 293.0)),
            qv_env=float(asc_p.get("qv_env", 1e-2)),
            G_condensation=float(_pp_asc.get("g_condensation", 0.0)),
            rhopmat=float(_g(start, "particles_radius_init_pars")
                          .get("rhopmat", 1.0)),
        ))

    par_p = grp("particles")
    known.update({"particles_stalker_init_pars", "particles_stalker_run_pars",
                  "particles_radius_init_pars", "particles_radius_run_pars"})
    prad_p = grp("particles_radius")
    pnum_p = grp("particles_number")
    prad_p.update(_g(start, "particles_radius_init_pars"))
    prad_p.update(_g(run, "particles_radius_run_pars"))
    if par_p:
        from ..particles import ParticlesDust
        scheme = "tsc" if par_p.get("lparticlemesh_tsc") else (
            "cic" if par_p.get("lparticlemesh_cic")
            or str(par_p.get("interp_pol_uu", "")) == "cic" else "tsc")
        sc_mod = next((m for m in modules if m.name == "solid_cells"), None)
        solid_cyl = ()
        if sc_mod is not None and sc_mod.ncylinders:
            solid_cyl = (sc_mod.cylinder_xpos[0], sc_mod.cylinder_ypos[0],
                         sc_mod.cylinder_radius[0])
        # mass density per superparticle (particles_dust.f90:640-665):
        # rhop_swarm = eps_dtog·rhom/(npar/nwgrid), where for a vertically
        # stratified box (lgravz_gas or particle gravz_profile='linear')
        # rhom = √(2π)/Lz·(rho0·cs0/nu_epicycle) accounts for gas outside
        # the box
        _epsd = float(par_p.get("eps_dtog", 0.0))
        _rhop_swarm = float(par_p.get("rhop_swarm", 0.0))
        _npar_tot = int(cpar.get("npar", 1024))
        _gp_par = str(_first(par_p.get("gravz_profile", "")))
        _nuepi_par = float(par_p.get("nu_epicycle", 0.0))
        if _rhop_swarm == 0.0 and _epsd > 0.0 \
                and bool(par_p.get("ldragforce_gas_par", False)):
            _rho0p = float(eos_p.get("rho0", 1.0))
            _cs0p = float(eos_p.get("cs0", 1.0))
            _strat = bool(par_p.get("lreassign_strat_rhom", True)) and (
                bool(grp("grav").get("lgravz_gas", False))
                or _gp_par == "linear")
            if _strat and grid.Lz > 0.0:
                _rhom = _math.sqrt(2.0 * _math.pi) / grid.Lz
                if _nuepi_par > 0.0:
                    _rhom *= _rho0p * _cs0p / _nuepi_par
            else:
                _rhom = _rho0p
            _nw = 1
            for _n in (nx, ny, nz):
                if _n > 1:
                    _nw *= _n
            _rhop_swarm = _epsd * _rhom / (float(_npar_tot) / _nw)
        ply_p = grp("particles_lyapunov")
        pca_p = grp("particles_caustics")
        modules.append(ParticlesDust(
            draglaw=("steadystate"
                     if par_p.get("ldraglaw_steadystate")
                     else "purestokes"
                     if par_p.get("ldraglaw_purestokes") else "epstein"),
            ltracers="particles_tracers" in mkf.get("PARTICLES", ""),
            llyapunov="particles_lyapunov"
                      in mkf.get("PARTICLES_LYAPUNOV", ""),
            bamp=float(ply_p.get("bamp", 1e-2)),
            linit_largeb=bool(ply_p.get("linit_largeb", False)),
            kmode_forb=float(ply_p.get("kmode_forb", 3.0)),
            lcaustics="particles_caustics"
                      in mkf.get("PARTICLES_CAUSTICS", ""),
            trsigma_cutoff=float(pca_p.get("trsigma_cutoff", -1e10)),
            npar_species=int(cpar.get("npar_species", 1)),
            tausp_species=tuple(
                float(v) for v in _as_tuple(
                    par_p.get("tausp_species", []))),
            ldragforce_equi_global_eps=bool(
                par_p.get("ldragforce_equi_global_eps", False)),
            ldragforce_gas_par=bool(
                par_p.get("ldragforce_gas_par", False)),
            lselfgrav_par=("particles_selfgravity"
                           in mkf.get("PARTICLES_SELFGRAVITY", "")),
            rhop_swarm=_rhop_swarm,
            gravz_profile=_gp_par,
            nu_epicycle=_nuepi_par,
            procgrid=(
                int(cpar.get("nprocx",
                             max(1, int(cpar.get("ncpus", 1))
                                 // (int(cpar.get("nprocy", 1))
                                     * int(cpar.get("nprocz", 1)))))),
                int(cpar.get("nprocy", 1)),
                int(cpar.get("nprocz", 1))),
            ap0=float(_first(prad_p.get("ap0", 0.0))),
            rhopmat=float(prad_p.get("rhopmat", 0.0)),
            mean_free_path_gas=float(par_p.get("mean_free_path_gas", 0.0)),
            bcpy=str(_first(par_p.get("bcpy", "p"))),
            solid_cyl=solid_cyl,
            npar=int(cpar.get("npar", 1024)),
            ncpus_ref=int(cpar.get("ncpus", 1)),
            # with PARTICLES_DRAG the particle drag + back-reaction are
            # handled entirely by the operator-split PIC solve
            # (ldragforce_dust_par defaults to F, particles_dust.f90)
            tausp=(0.0 if "particles_drag" in mkf.get("PARTICLES_DRAG", "")
                   else float(par_p.get("tausp", 0.0))),
            eps_dtog=float(par_p.get("eps_dtog", 0.0)),
            scheme=scheme,
            init=str(_first(par_p.get("initxxp", "random"))),
            init_list=tuple(
                str(v) for v in _as_tuple(par_p.get("initxxp", "random"))),
            vinit=str(_first(par_p.get("initvvp", "zero"))),
            amplxxp=float(par_p.get("amplxxp", 0.0)),
            kx_xxp=float(par_p.get("kx_xxp", 0.0)),
            ky_xxp=float(par_p.get("ky_xxp", 0.0)),
            kz_xxp=float(par_p.get("kz_xxp", 0.0)),
            rp_int=float(run_pars.get("rp_int",
                                      init_pars.get("rp_int", 0.0))),
            rp_ext=float(run_pars.get("rp_ext",
                                      init_pars.get("rp_ext", 0.0))),
            dustdensity_powerlaw=float(
                par_p.get("dustdensity_powerlaw", 0.0)),
            zp0=float(par_p.get("zp0", 1.0)),
            xp0=float(par_p.get("xp0", 0.0)),
            yp0=float(par_p.get("yp0", 0.0)),
            zp0_box=float(par_p.get("zp0", 0.0)),
            Lx0=float(par_p.get("lx0", 0.0)),
            Ly0=float(par_p.get("ly0", 0.0)),
            Lz0=float(par_p.get("lz0", 0.0)),
            delta_vp0=float(par_p.get("delta_vp0", 1.0)),
            # init-time value: start.in wins (run.in may zero it and hand
            # the pressure gradient to particles_drag gx_gas)
            beta_glnrho_global=tuple(float(v) for v in _vec3(
                _g(start, "density_init_pars").get(
                    "beta_glnrho_global",
                    den_p.get("beta_glnrho_global", [0.0, 0.0, 0.0])),
                [0.0, 0.0, 0.0])),
            Omega=float(hyd_p.get("omega", 0.0)),
            cs0=float(eos_p.get("cs0", 1.0)),
            lcharged="particles_charged" in mkf.get("PARTICLES", ""),
            lsweepup_par=bool(prad_p.get("lsweepup_par", False)),
            lfragmentation_par=bool(pnum_p.get("lfragmentation_par",
                                               False)),
            lcondensation_simplified=bool(
                prad_p.get("lcondensation_simplified", False)),
            GS_condensation=float(prad_p.get("gs_condensation", 0.0)),
            ldust_accretion=bool(prad_p.get("ldust_accretion", False)),
            xi_accretion=float(prad_p.get("xi_accretion", 0.0)),
            tstart_condensation=float(
                prad_p.get("tstart_condensation_par", 0.0)),
            vthresh_sweepup=float(prad_p.get("vthresh_sweepup", -1.0)),
            vthresh_coagulation=float(
                pnum_p.get("vthresh_coagulation", 0.0)),
            deltavp12_floor=float(prad_p.get("deltavp12_floor", 0.0)),
            deltavp22_floor=float(pnum_p.get("deltavp22_floor", 0.0)),
            cdtps=float(prad_p.get("cdtps", 0.2)),
            cdtpf=float(pnum_p.get("cdtpf", 0.2)),
            dust_charge=float(par_p.get("dust_charge", 0.0)),
            rhodust=float(par_p.get("rhodust", 1.0)),
            lonly_eforce=bool(par_p.get("lonly_eforce", False)),
            lstokes_drag=bool(par_p.get("lstokes_drag", False)),
            fluid_mu=float(par_p.get("fluid_mu", 0.0)),
            ap0_list=tuple(
                float(v) for v in (prad_p.get("ap0", [])
                                   if isinstance(prad_p.get("ap0", []),
                                                 list) else [])),
            initap=str(_first(prad_p.get("initap", ""))),
            a0_initdist=float(prad_p.get("a0_initdist", 0.0)),
            sigma_initdist=float(prad_p.get("sigma_initdist", 0.2)),
            initnpswarm=str(pnum_p.get("initnpswarm", "")),
            np_swarm0=float(pnum_p.get("np_swarm0", 0.0)),
            rhop_swarm0=float(pnum_p.get("rhop_swarm0", 0.0)),
            nu_draglaw=float(par_p.get("nu_draglaw", 0.0))
            if par_p.get("lnu_draglaw") else 0.0,
        ))
        if "particles_drag" in mkf.get("PARTICLES_DRAG", ""):
            # PIC mutual-drag operator splitting + optional NSH drag
            # equilibrium init (particles_drag.f90)
            from ..particles.drag import ParticlesDrag
            pdr_p = grp("particles_drag")
            Om_ = float(hyd_p.get("omega", 0.0))
            taus_ = float(pdr_p.get("taus", 0.0))
            modules.append(ParticlesDrag(
                tdrag=float(pdr_p.get("tdrag", 0.0)),
                taus=taus_,
                Omega=Om_,
                qshear=float(grp("shear").get("qshear", 1.5)),
                ldrag_on_par=bool(pdr_p.get("ldrag_on_par", True)),
                ldrag_on_gas=bool(pdr_p.get("ldrag_on_gas", False)),
                eps_dtog=float(par_p.get("eps_dtog", 0.0)),
                particle_mesh=str(par_p.get("particle_mesh", "tsc")),
                gx_gas=float(pdr_p.get("gx_gas", 0.0)),
            ))
            if bool(pdr_p.get("lset_drag_equilibrium", False)) \
                    and bool(pdr_p.get("ldrag_equilibrium_global", False)):
                # NSH solution (particles_drag.f90:683-712): applied as
                # vp0 on the particles + ux0/uy0 through the gas IC
                gx_gas = float(pdr_p.get("gx_gas", 0.0))
                dv_gas = gx_gas / (2.0 * Om_) if Om_ != 0.0 else 0.0
                epsd = float(par_p.get("eps_dtog", 0.0))
                a_ = 1.0 + epsd
                b_ = dv_gas / (a_ * a_ + taus_ * taus_)
                vx_ = -2.0 * taus_ * b_
                vy_ = -a_ * b_
                _nsh = {"ux0": -epsd * vx_,
                        "uy0": -(a_ + taus_ * taus_) * b_,
                        "vpx0": vx_, "vpy0": vy_}
            else:
                _nsh = None
        else:
            _nsh = None
        if _nsh is not None or str(_first(par_p.get("initxxp", ""))) \
                == "streaming_coldstart":
            import dataclasses as _dcp
            cf = _complex_floats(par_p.get("coeff", []))
            # INIT-time beta (start.in): run.in often zeroes
            # beta_glnrho_global for the dynamics (the pressure gradient
            # is then carried by particles_drag gx_gas)
            beta0_ = _vec3(_g(start, "density_init_pars").get(
                "beta_glnrho_global",
                den_p.get("beta_glnrho_global", [0, 0, 0])), [0, 0, 0])[0]
            eta_vK_ = -0.5 * float(beta0_) * float(eos_p.get("cs0", 1.0))
            modules = [
                _dcp.replace(
                    m,
                    amplxxp=float(par_p.get("amplxxp", 0.0)),
                    kx_xxp=float(par_p.get("kx_xxp", 0.0)),
                    kz_xxp=float(par_p.get("kz_xxp", 0.0)),
                    coeff=cf,
                    vp0=((_nsh["vpx0"], _nsh["vpy0"], 0.0)
                         if _nsh else (0.0, 0.0, 0.0)))
                if m.name == "particles" else m for m in modules]
            from ..physics.initial_condition import InitialCondition
            gas_pars = {
                "coeff": cf,
                "amplxxp": float(par_p.get("amplxxp", 0.0)),
                "kx_xxp": float(par_p.get("kx_xxp", 0.0)),
                "kz_xxp": float(par_p.get("kz_xxp", 0.0)),
                "eta_vk": eta_vK_,
                "ux0": _nsh["ux0"] if _nsh else 0.0,
                "uy0": _nsh["uy0"] if _nsh else 0.0,
            }
            modules.append(InitialCondition(
                plugin="streaming_coldstart_gas",
                params=tuple(sorted(gas_pars.items()))))
        if "particles_coagulation" in mkf.get("PARTICLES_COAGULATION", ""):
            from ..particles.coagulation import ParticlesCoagulation
            pcg_p = grp("particles_coag")
            modules.append(ParticlesCoagulation(
                rhopmat=float(prad_p.get("rhopmat", 1.0)),
                kernel=("constant"
                        if pcg_p.get("lconstant_kernel_test") else
                        "linear" if pcg_p.get("llinear_kernel_test")
                        else "physical"),
                kernel_cst=float(pcg_p.get("kernel_cst", 1.0)),
                kernel_lin=float(pcg_p.get("kernel_lin", 1.0)),
                lcoag_simultaneous=bool(
                    pcg_p.get("lcoag_simultaneous", True)),
                lnoselfcollision=bool(
                    pcg_p.get("lnoselfcollision", True)),
            ))

    is_p = grp("interstellar")
    if "nointerstellar" not in mkf.get("INTERSTELLAR", "nointerstellar"):
        from ..physics.interstellar import Interstellar
        modules.append(Interstellar(
            cdts=float(run_pars.get("cdts", 1.0)),
            cooling_select=str(is_p.get("cooling_select", "WSW")),
            heating_select=str(is_p.get("heating_select", "wolfire")),
            heating_rate=float(is_p.get("heating_rate", 0.015)),
            GammaUV=float(is_p.get("gammauv", 0.0)),
            coolingfunction_scalefactor=float(
                is_p.get("coolingfunction_scalefactor", 1.0)),
            heatingfunction_scalefactor=float(
                is_p.get("heatingfunction_scalefactor", 1.0)),
            heatingfunction_fadefactor=float(
                is_p.get("heatingfunction_fadefactor", 0.0)),
            laverage_SNI_heating=bool(
                is_p.get("laverage_sni_heating", False)),
            laverage_SNII_heating=bool(
                is_p.get("laverage_snii_heating", False)),
            lSNI=bool(is_p.get("lsni", True)),
            lSNII=bool(is_p.get("lsnii", True)),
            ltestSN=bool(is_p.get("ltestsn", False)),
            h_SNI=float(is_p.get("h_sni", 0.0)),
            h_SNII=float(is_p.get("h_snii", 0.0)),
            initinterstellar=_first(is_p.get("initinterstellar", "nothing")),
            initial_SNI=int(is_p.get("initial_sni", 0)),
            lSN_scale_rad=bool(is_p.get("lsn_scale_rad", False)),
            N_mass=float(is_p.get("n_mass", 250.0)),
            rfactor_SN=float(is_p.get("rfactor_sn", 5.0)),
            frac_ecr=float(is_p.get("frac_ecr", 0.0)),
            frac_kin=float(is_p.get("frac_kin", 0.0)),
            kin_max=float(is_p.get("kin_max", 0.075)),
            thermal_profile=str(is_p.get("thermal_profile", "gaussian")),
            velocity_profile=str(is_p.get("velocity_profile", "gaussian")),
            width_SN=float(is_p.get("width_sn", 0.0)),
            t_next_SNI=float(is_p.get("t_next_sni", -2.0)),
            t_next_SNII=float(is_p.get("t_next_snii", -2.0)),
            ampl_SN=float(is_p.get("ampl_sn", 0.0)),
            mass_SN=float(is_p.get("mass_sn", 0.0)),
            lSN_mass=bool(is_p.get("lsn_mass", False)),
            lSN_eth=bool(is_p.get("lsn_eth", True)),
            lSN_momentum=bool(is_p.get("lsn_momentum", True)),
            lSN_autofrackin=bool(is_p.get("lsn_autofrackin", True)),
            mass_profile=str(is_p.get("mass_profile", "gaussian")),
            mass_width_ratio=float(is_p.get("mass_width_ratio", 1.0)),
            energy_width_ratio=float(is_p.get("energy_width_ratio", 1.0)),
            velocity_width_ratio=float(
                is_p.get("velocity_width_ratio", 1.0)),
            rho_SN_min=float(is_p.get("rho_sn_min", 0.0)),
            rho_SN_max=float(is_p.get("rho_sn_max", 0.0)),
            TT_SN_min=float(is_p.get("tt_sn_min", -1.0)),
            TT_SN_max=float(is_p.get("tt_sn_max", 0.0)),
            SN_TT_ratio=float(is_p.get("sn_tt_ratio", 20.0)),
            SN_rho_ratio=float(is_p.get("sn_rho_ratio", 1e4)),
            eps_mass=float(is_p.get("eps_mass", 0.05)),
            SNI_factor=float(is_p.get("sni_factor", 1.0)),
            SNII_factor=float(is_p.get("snii_factor", 1.0)),
            SNI_area_rate=float(is_p.get("sni_area_rate", 0.0)),
            SNII_area_rate=float(is_p.get("snii_area_rate", 0.0)),
            center_SN=(float(is_p.get("center_sn_x", 0.0)),
                       float(is_p.get("center_sn_y", 0.0)),
                       float(is_p.get("center_sn_z", 0.0))),
            seed0=int(init_pars.get("seed0", run_pars.get("seed0", 1812))),
            mu_ism=float(eos_p.get("mu", 0.62)),
            unit_length=_units.get("unit_length", 1.0),
            unit_velocity=_units.get("unit_velocity", 1.0),
            unit_density=_units.get("unit_density", 1.0),
            unit_temperature=_units.get("unit_temperature", 1.0),
        ))

    hf_p = grp("heatflux")
    if "noheatflux" not in mkf.get("HEATFLUX", "noheatflux"):
        from ..physics.heatflux import HeatFlux
        modules.append(HeatFlux(
            iheatflux=_first(hf_p.get("iheatflux", "nothing")),
            tau_inv_spitzer=float(hf_p.get("tau_inv_spitzer", 0.0)),
            Kspitzer_para=float(hf_p.get("kspitzer_para", 0.0)),
            saturation_flux=float(hf_p.get("saturation_flux", 0.0)),
            Kc=float(hf_p.get("kc", 0.0)),
            lnfs2=bool(hf_p.get("lnfs2", False)),
            ltau_spitzer_va=bool(hf_p.get("ltau_spitzer_va", False)),
            va2max_tau_boris=float(hf_p.get("va2max_tau_boris", 0.0)),
            lreset_heatflux=bool(hf_p.get("lreset_heatflux", False)),
            cdts=float(run_pars.get("cdts", 1.0)),
            unit_velocity=_units.get("unit_velocity", 1.0),
            unit_temperature=_units.get("unit_temperature", 1.0),
            clight_code=(2.99792458e8 if _unit_system == "SI"
                         else 2.99792458e10)
            / _units.get("unit_velocity", 1.0),
        ))

    sp_p = grp("special")
    sp_slot = mkf.get("SPECIAL", "")
    if sp_slot:
        from ..physics.special import make_special
        # multiple simultaneous specials: whitespace-separated slot list
        # (reference initialize_mult_special, src/run.f90:133)
        # cylinder/sphere-in-a-box bounds live in the general namelists;
        # specials with r_int/r_ext fields pick them up (unknown keys are
        # ignored by make_special)
        sp_all = dict(sp_p)
        for k in ("r_int", "r_ext"):
            if k not in sp_all:
                v = run_pars.get(k, init_pars.get(k))
                if v is not None:
                    sp_all[k] = float(v)
        # unit system + disk reference radius for radiative specials
        # (newton_cooling needs σ_SB and the cgs κ(T,ρ) in code units)
        for k in ("unit_temperature", "unit_density", "unit_length",
                  "unit_velocity", "r_ref"):
            if k not in sp_all:
                v = init_pars.get(k)
                if v is not None:
                    sp_all[k] = float(v)
        sp_all.setdefault("cdts", float(run_pars.get("cdts", 1.0)))
        # specials that read run-dir data files (meanfield_e_tensor's
        # emftensors.h5) pick the directory up from this field
        sp_all.setdefault("rundir", path)
        for slot in sp_slot.split():
            if slot.split("/")[-1] == "nospecial":
                continue
            sp_name = slot.split("/")[-1]
            if "streamfunction" in sp_name:
                # the streamfunction special owns BOTH TT and psi (it
                # replaces the temperature module's evolution with its
                # Stokes-flow advection) — drop a TemperatureIdealGas the
                # energy branch already appended to avoid a duplicate TT
                modules = [m for m in modules if m.name != "temperature"]
            modules.append(make_special(sp_name, sp_all))

    # the IC plug-in group is named plain &initial_condition_pars
    known.add("initial_condition_pars")
    ic_p = _g(start, "initial_condition_pars")
    ic_p.update(_g(run, "initial_condition_pars"))
    ic_slot = mkf.get("INITIAL_CONDITION", "")
    if ic_slot:
        from ..physics.initial_condition import InitialCondition
        plugin = ic_slot.split("/")[-1]
        # unit system for IC plug-ins with cgs-constant profiles
        for k, v in _units.items():
            ic_p.setdefault(k, v)
        # hydrostatic IC plug-ins need the constant vertical gravity
        ic_p.setdefault("gravz", float(grp("grav").get("gravz", 0.0)))
        # disk ICs read cdata flags rsmooth / lcylindrical_gravity
        # (centrifugal_balance.f90 power_law + strat gating)
        ic_p.setdefault("rsmooth", float(init_pars.get("rsmooth", 0.0)))
        ic_p.setdefault("lcylindrical_gravity", bool(
            init_pars.get("lcylindrical_gravity", False)
            or grp("grav").get("lcylindrical_gravity", False)))
        if plugin == "ths_equilibrium_ism":
            ism_fn = os.path.join(path, "init_ism.in")
            if os.path.exists(ism_fn):
                rows = []
                with open(ism_fn) as fh:
                    for line in fh:
                        parts = line.split()
                        if len(parts) >= 2:
                            try:
                                rows.append((float(parts[0]),
                                             float(parts[1])))
                            except ValueError:
                                pass
                ic_p["_init_ism_rows"] = tuple(rows)
        if plugin == "streaming_instability":
            # multi-species SI: hashable-ify the complex si_ev list and
            # route the particle side through init='si_exact_mode'
            import dataclasses as _dsi
            from ..physics.initial_condition import nsh_multispecies
            ic_p["si_ev"] = _complex_floats(ic_p.get("si_ev", []))
            for k in ("taus", "eps"):
                v = ic_p.get(k, [])
                ic_p[k] = tuple(float(u) for u in
                                (v if isinstance(v, list) else [v]))
            eta_vK_si = -0.5 * float(ic_p.get("dlnrhodlnr", 0.0)) \
                * float(eos_p.get("cs0", 1.0))
            vpx_, vpy_, ux0_, uy0_ = nsh_multispecies(
                ic_p["taus"], ic_p["eps"], eta_vK_si)
            modules = [
                _dsi.replace(m, ux0=ux0_, uy0=uy0_,
                             eps_dtog=float(sum(ic_p["eps"])))
                if m.name == "multisp_drag_eq" else m for m in modules]
            modules = [
                _dsi.replace(
                    m, init="si_exact_mode",
                    npar_species=int(cpar.get("npar_species", 1)),
                    taus_species=ic_p["taus"],
                    eps_species=ic_p["eps"],
                    si_ev=ic_p["si_ev"],
                    si_amp=float(ic_p.get("si_amp", 1e-6)),
                    si_kx=float(ic_p.get("si_kx", 0.0)),
                    si_kz=float(ic_p.get("si_kz", 0.0)),
                    dlnrhodlnr=float(ic_p.get("dlnrhodlnr", 0.0)),
                    vp0_species=tuple(
                        (float(a), float(b)) for a, b in zip(vpx_, vpy_)),
                    rho0=float(eos_p.get("rho0", 1.0)),
                    ldragforce_gas_par=True)
                if m.name == "particles" else m for m in modules]
        modules.append(InitialCondition(
            plugin=plugin,
            params=tuple(sorted((k, v) for k, v in ic_p.items()))))
        if plugin == "spherical_convection":
            # the IC writes the radiative-conductivity profile the run
            # uses (kappa = L·ρ0·√(g·R*)·cv(γ−1)/4π·(npoly2+1),
            # spherical_convection.f90) — expose its boundary values so
            # the 'Fgs'/'c1' entropy BCs have a finite K
            import dataclasses as _dc
            import math as _math
            for i, m in enumerate(modules):
                if m.name == "entropy":
                    gamma_ = float(eos_p.get("gamma", 5.0 / 3.0))
                    cv_ = 1.0 / gamma_          # cp = 1 in code units
                    L_ = float(ic_p.get("star_luminosity", 0.0))
                    gx_ = float(grav_p.get("gravx", 1.0))
                    Rs_ = float(ic_p.get("rstar", 1.0))
                    rho0_ = float(eos_p.get("rho0", 1.0))
                    nad_ = float(ic_p.get("nad", 1.5))
                    njump_ = float(ic_p.get("npoly_jump", 1.0))
                    x0_ = grid.x0
                    Rsurf_ = grid.x0 + grid.Lx
                    coef1 = (L_ * rho0_ * _math.sqrt(gx_ * Rs_) * cv_
                             * (gamma_ - 1.0) / (4.0 * _math.pi))
                    npoly_bot = nad_
                    npoly_top = (njump_ * (Rsurf_ / x0_) ** (-15.0)
                                 + nad_ - njump_)
                    modules[i] = _dc.replace(
                        m, hcondbot=coef1 * (npoly_bot + 1.0),
                        hcondtop=max(coef1 * (npoly_top + 1.0), 0.0))
                    break
    elif str(den_p.get("initlnrho", "")) == "globaldisc":
        # pre-2013 samples: initlnrho='globaldisc' in density_init_pars is
        # today's initial_condition/centrifugal_balance (params split
        # between density_init_pars and initial_condition_pars)
        from ..physics.initial_condition import InitialCondition
        merged = dict(ic_p)
        for k in ("temperature_power_law", "density_power_law", "r_ref"):
            if k in den_p and k not in merged:
                merged[k] = den_p[k]
        modules.append(InitialCondition(
            plugin="centrifugal_balance",
            params=tuple(sorted((k, v) for k, v in merged.items()))))
    elif str(den_p.get("initlnrho", "")) == "isentropic-star":
        # joint lnrho+ss hydrostatic star init (density.f90:1250)
        from ..physics.initial_condition import InitialCondition
        merged = dict(ic_p)
        merged.setdefault("r_ext", float(init_pars.get("r_ext", 1.0)))
        merged.setdefault("cs2cool", float(
            ent_p0.get("cs2cool", grp("entropy").get("cs2cool", 0.0))))
        modules.append(InitialCondition(
            plugin="isentropic_star",
            params=tuple(sorted((k, v) for k, v in merged.items()))))
    elif str(den_p.get("initlnrho", "")) in (
            "Ferriere", "thermal-hs", "Galactic-hs", "Ferriere-hs"):
        # ISM joint density+entropy equilibria (entropy.f90:2361 ferriere,
        # interstellar(_old).f90 thermal_hs, entropy.f90:2457 ferriere_hs)
        from ..physics.initial_condition import InitialCondition
        ism_p = grp("interstellar")
        merged = dict(ic_p)
        for k, v in _units.items():
            merged.setdefault(k, v)
        nm = str(den_p.get("initlnrho"))
        mag_p0 = grp("magnetic")
        if str(_init_name(mag_p0.get("initaa"))) == "Ferriere-uniform-By":
            merged["ferriere_uniform_by"] = float(
                _first(mag_p0.get("amplaa", 0.0)))
        if nm == "Ferriere":
            plugin = "ferriere_ism"
        else:
            plugin = "hs_equilibrium_ism"
            ut_ = float(merged.get("unit_temperature", 1.0))
            ud_ = float(merged.get("unit_density", 1e-24))
            merged.setdefault("t_init",
                              float(ism_p.get("t0hs", 7.088e2 / ut_)))
            merged.setdefault("rho0ts",
                              float(ism_p.get("rho0ts", 3.5e-24 / ud_)))
            merged.setdefault("lthermal_hse",
                              bool(ism_p.get("lthermal_hse", False)))
        modules.append(InitialCondition(
            plugin=plugin,
            params=tuple(sorted((k, v) for k, v in merged.items()))))

    _ss_names = _init_name(_g(start, "entropy_init_pars").get("initss", ""))
    if "mixinglength" in (_ss_names if isinstance(_ss_names, tuple)
                          else (_ss_names,)):
        # MLT stratification (entropy.f90:2108-2218 'mixinglength'):
        # secant-iterate rhotop so rho(z1)=rho0, REDEFINE eos rho0 to
        # rhotop (the reference mutates rho0/lnrho0 at :2195-2196), and
        # install the (lnrho, T) columns through an IC plug-in
        import dataclasses as _dc
        from ..physics.initial_condition import mlt_iterate
        e0 = _g(start, "entropy_init_pars")
        gr0 = _g(start, "grav_init_pars")
        eosm = next(m for m in modules if m.name == "eos")
        dzz = grid.Lz / max(grid.nz - 1, 1)
        rhotop, lnrhom, tempm = mlt_iterate(
            flux=float(e0.get("mixinglength_flux", 0.0)),
            nzgrid=grid.nz, dz=dzz, ztop=grid.z0 + grid.Lz,
            z1=float(gr0.get("z1", 0.0)), z2=float(gr0.get("z2", 1.0)),
            cs20=eosm.cs0 ** 2, gamma=eosm.gamma, rho0=eosm.rho0,
            mpoly0=float(e0.get("mpoly0", 1.5)),
            mpoly1=float(e0.get("mpoly1", 1.5)),
            alpha_mlt=float(e0.get("alpha_mlt", 1.5)),
            gravz=float(gr0.get("gravz", -1.0)))
        modules = [_dc.replace(m, rho0=rhotop) if m.name == "eos" else m
                   for m in modules]
        from ..physics.initial_condition import InitialCondition
        modules.append(InitialCondition(
            plugin="mlt_profile",
            params=(("lnrhom", tuple(float(v) for v in lnrhom)),
                    ("tempm", tuple(float(v) for v in tempm)))))

    # llocal_iso: swap the eos for the locally-isothermal radial profile
    # (cs² static power law; cdata.f90 llocal_iso flag)
    if bool(init_pars.get("llocal_iso", False)):
        from ..physics.eos import EosLocalIso
        qT = float(ic_p.get("temperature_power_law",
                            den_p.get("temperature_power_law", 1.0)))
        lcyl = (bool(init_pars.get("lcylindrical_gravity", False))
                or bool(grav_p.get("lcylindrical_gravity", False))
                or bool(init_pars.get("lcylinder_in_a_box", False))
                or grid.coords == "cylindrical")
        modules = [
            EosLocalIso(gamma=m.gamma, cs0=m.cs0, rho0=m.rho0, cp=m.cp,
                        temperature_power_law=qT,
                        r_ref=float(ic_p.get("r_ref", 1.0)),
                        lcylindrical=lcyl)
            if m.name == "eos" else m for m in modules]

    # BCs: run.in overrides start.in; component order = registry order
    from ..core.farray import Registry
    reg = Registry()
    tmp_modules = tuple(modules)
    from ..model import _reg_key
    for m in sorted(tmp_modules, key=_reg_key):
        m.register(reg)
    reg.finalize()
    # communicated auxiliaries take BC entries too (e.g. 'pp' in the
    # Boussinesq samples' bcz list); zip() stops at the provided codes
    comp_names = reg.comp_names[: reg.ncom]

    def bcs_for(axis_key, side_vals):
        codes = run_pars.get(axis_key, init_pars.get(axis_key))
        if codes is None:
            return ()
        codes = codes if isinstance(codes, list) else [codes]
        # per-component BC values: fbcz = bottom, fbcz2 = top (reference
        # fbcx/fbcy/fbcz(:,k) arrays read from the init_pars namelist)
        fbc_lo = init_pars.get("f" + axis_key,
                               init_pars.get("f" + axis_key + "1",
                                             run_pars.get("f" + axis_key)))
        fbc_hi = init_pars.get("f" + axis_key + "2",
                               run_pars.get("f" + axis_key + "2"))
        fbc_lo = fbc_lo if isinstance(fbc_lo, list) else None
        fbc_hi = fbc_hi if isinstance(fbc_hi, list) else None
        pairs = [(c, code, i) for i, (c, code) in
                 enumerate(zip(comp_names, codes))]
        # apply density BCs before entropy (cT/c1 read lnrho ghosts)
        pairs.sort(key=lambda p: 1 if p[0] == "ss" else 0)
        ent = next((m for m in modules if m.name == "entropy"), None)
        grav = next((m for m in modules if m.name == "gravity"), None)
        eos = next((m for m in modules if m.name == "eos"), None)
        out = []
        for comp, code, ci in pairs:
            lval = hval = 0.0
            parts = str(code).split(":")
            lo_code = parts[0]
            hi_code = parts[-1]
            for side, c in ((0, lo_code), (1, hi_code)):
                v = 0.0
                arr = fbc_lo if side == 0 else fbc_hi
                if arr is not None and ci < len(arr):
                    v = float(arr[ci])
                if c == "cT" and ent is not None and getattr(ent, "cs2cool", 0) > 0:
                    v = ent.cs2cool
                elif c == "ism":
                    # observed scale height: density_scale_factor or
                    # 900 pc / unit_length (boundcond.f90:8613-8617)
                    dsf = run_pars.get(
                        "density_scale_factor",
                        init_pars.get("density_scale_factor"))
                    v = float(dsf) if dsf is not None else \
                        2.7774e21 / _units.get("unit_length", 1.0)
                elif c == "c1" and ent is not None and grav is not None \
                        and eos is not None:
                    # equilibrium flux F/K = −dT/dz of the bottom polytrope:
                    # dT/dz = γ·gravz/((m+1)(γ−1)cp)
                    mlay = getattr(ent, "mpoly1", 1.0) if side == 0 else getattr(ent, "mpoly2", 0.0)
                    v = -eos.gamma * grav.gravz / (
                        (mlay + 1.0) * (eos.gamma - 1.0) * eos.cp)
                if side == 0:
                    lval = v
                else:
                    hval = v
            out.append(BC.parse(comp, str(code), lval, hval))
        return tuple(out)

    # Radial freeze zones (lfreeze_uint/uext etc. → FreezeZones module;
    # equ.f90:424-520; rfreeze defaults to r_int/r_ext, run.f90:259-260)
    _rho_name = "rho" if bool(grp("density").get("ldensity_nolog", False)) \
        else "lnrho"
    _fz_int, _fz_ext = [], []
    for stem2, flagi, flage, fname2 in (
            ("hydro", "lfreeze_uint", "lfreeze_uext", "uu"),
            ("density", "lfreeze_lnrhoint", "lfreeze_lnrhoext", _rho_name),
            ("magnetic", "lfreeze_aint", "lfreeze_aext", "aa"),
            ("entropy", "lfreeze_sint", "lfreeze_sext", "ss")):
        pg2 = grp(stem2)
        if bool(pg2.get(flagi, False)):
            _fz_int.append(fname2)
        if bool(pg2.get(flage, False)):
            _fz_ext.append(fname2)
    # run_pars-level per-VARIABLE freeze arrays (cdata lfreeze_varint /
    # lfreeze_varext, applied in equ.f90:446-505); interpret the flag
    # list against the reference f-array layout uu,lnrho,ss,aa
    # (ths_equilibrium_ism.f90:26) and freeze a field when all its
    # components are flagged
    def _expand_freeze(flags):
        if flags is None:
            return []
        if isinstance(flags, str):
            # unsplit namelist value like 'T T T T T T T T'
            flags = flags.replace(",", " ").split()
        if not isinstance(flags, (list, tuple)):
            flags = [flags]
        flags = [str(v).strip().lower() in ("t", "true", ".true.", "1")
                 if isinstance(v, str) else bool(v) for v in flags]
        layout = []
        have = {m.name for m in modules}
        if "hydro" in have:
            layout.append(("uu", 3))
        if "density" in have:
            layout.append((_rho_name, 1))
        if "entropy" in have:
            layout.append(("ss", 1))
        if "magnetic" in have:
            layout.append(("aa", 3))
        names, i0 = [], 0
        for fn3, nc3 in layout:
            fl = flags[i0:i0 + nc3]
            i0 += nc3
            if fl and all(fl):
                names.append(fn3)
        return names
    for nm3 in _expand_freeze(run_pars.get("lfreeze_varint")):
        if nm3 not in _fz_int:
            _fz_int.append(nm3)
    for nm3 in _expand_freeze(run_pars.get("lfreeze_varext")):
        if nm3 not in _fz_ext:
            _fz_ext.append(nm3)
    if _fz_int or _fz_ext:
        from ..physics.freeze import FreezeZones
        _ri0 = float(init_pars.get("r_int", run_pars.get("r_int", 0.0)))
        _re0 = float(init_pars.get("r_ext", run_pars.get("r_ext", -9e99)))
        modules.append(FreezeZones(
            rfreeze_int=float(run_pars.get(
                "rfreeze_int", _ri0 if _ri0 > 1e-12 else -9e99)),
            rfreeze_ext=float(run_pars.get(
                "rfreeze_ext", _re0 if _re0 > -1e99 else -9e99)),
            wfreeze_int=float(run_pars.get(
                "wfreeze_int", run_pars.get("wfreeze", 0.0))),
            wfreeze_ext=float(run_pars.get(
                "wfreeze_ext", run_pars.get("wfreeze", 0.0))),
            fshift_int=float(run_pars.get("fshift_int", -1.0)),
            fshift_ext=float(run_pars.get("fshift_ext", 1.0)),
            fields_int=tuple(_fz_int),
            fields_ext=tuple(_fz_ext),
            lcyl=bool(init_pars.get("lcylinder_in_a_box", False))
            or grid.coords == "cylindrical",
        ))


    overrides, modules_final = _parity_replay(
        path, tuple(modules), grid, int(run_pars.get("nt", 100)),
        init_pars, run_pars, cpar)

    # REAL_PRECISION=double: honored when the JAX x64 mode is enabled
    # (required by e.g. the RKF45 chemistry goldens at eps_rkf=1e-8)
    dtype = "float32"
    if "double" in mkf.get("REAL_PRECISION", ""):
        import jax
        if jax.config.jax_enable_x64:
            dtype = "float64"
    cfg = Config(
        grid=grid, time=time, modules=modules_final,
        bcx=bcs_for("bcx", None), bcy=bcs_for("bcy", None),
        bcz=bcs_for("bcz", None), dtype=dtype,
    )
    unmapped = [g for g in list(start) + list(run) if g not in known]
    info = {
        "init_overrides": overrides,
        "run_pars": run_pars,
        "unmapped_groups": sorted(set(unmapped)),
        "nt": int(run_pars.get("nt", 100)),
        "it1": int(run_pars.get("it1", 10)),
        "isave": int(run_pars.get("isave", 200)),
        "dsnap": float(run_pars.get("dsnap", 0.0)),
        "dvid": float(run_pars.get("dvid", 0.0)),
    }
    return cfg, info


def load_print_in(path) -> tuple:
    """print.in → print_columns for RunParams."""
    from ..io.timeseries import parse_print_in
    p = os.path.join(str(path), "print.in")
    if not os.path.exists(p):
        return ("it", "t", "dt", "urms", "umax", "rhom")
    with open(p) as f:
        return tuple(parse_print_in(f.read()))
