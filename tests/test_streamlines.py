"""Field-line tracing + tracer maps (reference src/streamlines.f90,
fixed_points analysis)."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu import GridSpec
from pencil_tpu.io.streamlines import (fixed_points, trace_streamlines,
                                       tracer_map)


def test_uniform_field_straight_lines():
    spec = GridSpec(nx=16, ny=16, nz=16)
    B = jnp.zeros((3, 16, 16, 16)).at[2].set(1.0)
    seeds = jnp.asarray([[0.0, 0.0, spec.z0], [1.0, -1.0, spec.z0]])
    path = trace_streamlines(B, seeds, spec, nsteps=64)
    p = np.asarray(path)
    # x, y constant; z increases monotonically by ds per step
    np.testing.assert_allclose(
        p[:, :, 0], np.broadcast_to(p[0, :, 0], p[:, :, 0].shape),
        atol=1e-6)
    np.testing.assert_allclose(
        p[:, :, 1], np.broadcast_to(p[0, :, 1], p[:, :, 1].shape),
        atol=1e-6)
    assert (np.diff(p[:, 0, 2]) > 0).all()


def test_sheared_field_footpoint_map():
    """B = (tan(θ), 0, 1)-like uniform slanted field: the z0→z1 map is a
    uniform shift by Lz·Bx/Bz."""
    spec = GridSpec(nx=16, ny=16, nz=16)
    bx0 = 0.25
    B = jnp.zeros((3, 16, 16, 16)).at[2].set(1.0).at[0].set(bx0)
    seeds, end = tracer_map(B, spec, nseed=4, nsteps=2048)
    shift = np.asarray(end - seeds)
    expect_x = spec.Lz * bx0
    np.testing.assert_allclose(shift[:, 0], expect_x, rtol=0.02)
    np.testing.assert_allclose(shift[:, 1], 0.0, atol=1e-3)


def test_fixed_points_of_identity_map():
    spec = GridSpec(nx=8, ny=8, nz=8)
    B = jnp.zeros((3, 8, 8, 8)).at[2].set(1.0)
    seeds, end = tracer_map(B, spec, nseed=4, nsteps=1024)
    fp, dist = fixed_points(seeds, end, spec)
    # a vertical field maps every footpoint onto itself
    assert len(fp) == len(seeds)
    assert dist.max() < 1e-3


def test_post_calc_operators_analytic():
    """post.calc 6th-order operators reproduce analytic derivatives of a
    trig field on a periodic box (reference python/pencil/calc)."""
    from pencil_tpu.post import calc
    n = 32
    L = 2 * np.pi
    d = L / n
    x = (np.arange(n) + 0.5) * d
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    f = np.sin(X) * np.cos(2 * Y) * np.sin(Z)
    g = calc.grad(f, d, d, d)
    np.testing.assert_allclose(
        g[0], np.cos(X) * np.cos(2 * Y) * np.sin(Z), atol=2e-4)
    np.testing.assert_allclose(
        g[1], -2 * np.sin(X) * np.sin(2 * Y) * np.sin(Z), atol=2e-3)
    l2 = calc.del2(f, d, d, d)
    np.testing.assert_allclose(l2, -6.0 * f, atol=5e-3)
    # curl of a gradient vanishes
    c = calc.curl(g, d, d, d)
    assert np.abs(c).max() < 5e-3
    # div(curl) vanishes
    v = np.stack([np.sin(Y), np.sin(Z), np.sin(X)])
    cv = calc.curl(v, d, d, d)
    assert np.abs(calc.div(cv, d, d, d)).max() < 5e-3


def test_post_sim_roundtrip(tmp_path):
    """get_sim wraps a run dir: run in-process, read ts/var back, compute
    derived quantities (reference pc.sim.get_sim + pc.calc workflow)."""
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Magnetic, TimeSpec, Viscosity)
    from pencil_tpu.model import Model
    from pencil_tpu.post import calc, get_sim
    from pencil_tpu.run import Run, RunParams
    rundir = tmp_path / "myrun"
    (rundir / "data").mkdir(parents=True)
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3)),
    )
    model = Model(cfg)
    run = Run(model, datadir=str(rundir / "data"),
              params=RunParams(nt=10, it1=5), quiet=True)
    run.main_loop(model.init_state(0))

    sim = get_sim(rundir)
    t = sim.ts()
    assert len(t.t) >= 2 and np.isfinite(t.urms).all()
    v = sim.var()
    assert v.uu.shape == (3, 16, 16, 16)
    ek = calc.kinetic_energy(v)
    em = calc.magnetic_energy(v)
    assert ek > 0 and em > 0
    w = calc.vorticity(v)
    assert np.isfinite(w).all()
    from pencil_tpu.post import simulations
    sims = simulations(tmp_path)
    assert len(sims) == 1
