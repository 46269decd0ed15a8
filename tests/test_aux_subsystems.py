"""Auxiliary subsystems: structure functions, autocorrelation, remesh,
RELOAD hot-reload, sound probes."""
import os

import jax.numpy as jnp
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro, Model,
                        TimeSpec, Viscosity)
from pencil_tpu.io.structfunc import autocorrelation, structure_function
from pencil_tpu.post.remesh import remesh_state
from pencil_tpu.run import Run, RunParams


def test_structure_function_single_mode():
    """For u = A sin(kx): SF2(ℓ) = 2A²·<sin²>·(1−cos kℓ) = A²(1−cos kℓ)."""
    n = 32
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    u = np.zeros((3, n, 8, 8), np.float32)
    u[1] = np.sin(x)[:, None, None]
    sf = structure_function(jnp.asarray(u), orders=(2,), axis=0, max_sep=16)
    seps = np.arange(1, 17) * (2 * np.pi / n)
    expect = 1.0 - np.cos(seps)
    np.testing.assert_allclose(np.asarray(sf[2]), expect, rtol=1e-4, atol=1e-6)


def test_autocorrelation_single_mode():
    n = 32
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    u = (np.sin(2 * x)[:, None, None] * np.ones((1, 4, 4))).astype(np.float32)
    c = np.asarray(autocorrelation(jnp.asarray(u), axis=0))
    np.testing.assert_allclose(c, np.cos(2 * x), atol=1e-5)


def test_remesh_roundtrip():
    spec32 = GridSpec(nx=32, ny=16, nz=8)
    spec64 = GridSpec(nx=64, ny=16, nz=8)
    x = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    f = np.asarray(np.sin(3 * x)[:, None, None] * np.ones((1, 16, 8)),
                   np.float32)
    state = {"fields": {"lnrho": jnp.asarray(f)}, "t": 0.0}
    up = remesh_state(state, spec32, spec64)
    assert up["fields"]["lnrho"].shape == (64, 16, 8)
    x64 = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    np.testing.assert_allclose(np.asarray(up["fields"]["lnrho"][:, 0, 0]),
                               np.sin(3 * x64), atol=1e-4)
    down = remesh_state(up, spec64, spec32)
    np.testing.assert_allclose(np.asarray(down["fields"]["lnrho"]), f,
                               atol=1e-4)


def test_sound_probes(tmp_path):
    cfg = Config(grid=GridSpec(nx=8, ny=8, nz=8),
                 modules=(EosIdealGas(gamma=1.0001), Density(),
                          Hydro(init="sinwave-x", ampl=0.1)))
    model = Model(cfg)
    run = Run(model, datadir=tmp_path,
              params=RunParams(nt=4, it1=2,
                               sound_points=((0.0, 0.0, 0.0),),
                               sound_fields=("uy", "lnrho")),
              quiet=True)
    run.main_loop(model.init_state(0))
    lines = open(tmp_path / "sound.dat").read().strip().splitlines()
    assert len(lines) == 4 and len(lines[0].split()) == 3


def test_reload_control_file(tmp_path):
    """RELOAD with a rundir rebuilds the step without losing state."""
    import shutil
    rundir = tmp_path / "run"
    (rundir / "src").mkdir(parents=True)
    (rundir / "start.in").write_text(
        "&init_pars\n/\n&eos_init_pars\n gamma=1.0001\n/\n"
        "&density_init_pars\n/\n&hydro_init_pars\n inituu='gaussian-noise',"
        " ampluu=1e-2\n/\n")
    (rundir / "run.in").write_text(
        "&run_pars\n nt=10, it1=5\n/\n&viscosity_run_pars\n ivisc='nu-const',"
        " nu=2e-3\n/\n")
    (rundir / "src" / "cparam.local").write_text(
        "integer, parameter :: nxgrid=8,nygrid=8,nzgrid=8\n")
    from pencil_tpu.compat.rundir import load_rundir
    cfg, info = load_rundir(rundir)
    model = Model(cfg)
    datadir = rundir / "data"
    run = Run(model, datadir=datadir, params=RunParams(nt=6, it1=3),
              rundir=str(rundir), quiet=True)
    state = model.init_state(0)
    os.makedirs(datadir, exist_ok=True)
    # drop RELOAD with changed viscosity mid-run
    (rundir / "run.in").write_text(
        "&run_pars\n nt=10, it1=5\n/\n&viscosity_run_pars\n ivisc='nu-const',"
        " nu=8e-3\n/\n")
    open(datadir / "RELOAD", "w").close()
    state = run.main_loop(state)
    assert int(np.asarray(state["it"])) == 6
    assert run.model.cfg.module("viscosity").nu == 8e-3
