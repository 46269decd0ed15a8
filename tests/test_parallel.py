"""Layout-invariance: the sharded step over a virtual 8-device CPU mesh must
reproduce the single-device run (the reference's implicit guarantee that
reference.out is identical across committed proc layouts — SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pencil_tpu import (BC, Config, Density, EosIdealGas, Gravity, GridSpec,
                        Hydro, Magnetic, MeshSpec, Model, TimeSpec, Viscosity)


def _cfg(mesh, periodic=(True, True, True), bcz=()):
    return Config(
        grid=GridSpec(nx=16, ny=16, nz=16, periodic=periodic),
        mesh=mesh,
        time=TimeSpec(itorder=3),
        modules=(
            EosIdealGas(gamma=1.4, cs0=1.0),
            Density(init="sinwave-z", ampl=0.05),
            Hydro(init="gaussian-noise", ampl=1e-2),
            Viscosity(ivisc=("nu-const",), nu=2e-3),
            Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3),
        ),
        bcz=bcz,
    )


def _run(cfg, nsteps, sharded):
    model = Model(cfg)
    state = model.init_state(7)
    if sharded:
        mesh = model.make_mesh()
        step = model.make_sharded_step(mesh)
    else:
        step = model.make_step()
    for _ in range(nsteps):
        state = step(state)
    return {k: np.asarray(v) for k, v in state["fields"].items()}, float(state["dt"])


@pytest.mark.parametrize("mesh", [MeshSpec(1, 2, 4), MeshSpec(2, 2, 2)])
def test_sharded_matches_single_periodic(mesh):
    assert len(jax.devices()) >= mesh.ndev, "conftest must give 8 cpu devices"
    ref, dt_ref = _run(_cfg(MeshSpec(1, 1, 1)), 5, sharded=False)
    shr, dt_shr = _run(_cfg(mesh), 5, sharded=True)
    assert abs(dt_ref - dt_shr) < 1e-6 * abs(dt_ref)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)


def test_sharded_selfgravity_shock_matches_single():
    """Self-gravity's Poisson solve and shock's max/smooth aux pass must be
    GLOBAL operations: an 8-device run has to reproduce the single-device
    fields (round-1 regression: a per-shard FFT solved 8 independent
    periodic problems without erroring)."""
    from pencil_tpu import SelfGravity, Shock

    def cfg(mesh):
        return Config(
            grid=GridSpec(nx=16, ny=16, nz=16),
            mesh=mesh,
            time=TimeSpec(itorder=3),
            modules=(
                EosIdealGas(gamma=1.4, cs0=1.0),
                Density(init="sinwave-z", ampl=0.2),
                Hydro(init="gaussian-noise", ampl=1e-2),
                Viscosity(ivisc=("nu-const", "nu-shock"), nu=2e-3,
                          nu_shock=1.0),
                SelfGravity(gravitational_const=0.05),
                Shock(),
            ),
        )

    ref, dt_ref = _run(cfg(MeshSpec(1, 1, 1)), 4, sharded=False)
    shr, dt_shr = _run(cfg(MeshSpec(2, 2, 2)), 4, sharded=True)
    assert abs(dt_ref - dt_shr) < 1e-5 * abs(dt_ref)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=5e-4, atol=1e-6,
                                   err_msg=k)


def test_sharded_matches_single_nghost5():
    """10th-order (nghost=5) halo exchange must ship 5-wide slabs: a
    z-sharded run has to match single-device (round-2 weakness: the slab
    width was hardcoded to 3)."""
    def cfg(mesh):
        return Config(
            grid=GridSpec(nx=16, ny=16, nz=16, nghost=5),
            mesh=mesh,
            time=TimeSpec(itorder=3),
            modules=(
                EosIdealGas(gamma=1.4, cs0=1.0),
                Density(init="sinwave-z", ampl=0.05),
                Hydro(init="gaussian-noise", ampl=1e-2),
                Viscosity(ivisc=("nu-const",), nu=2e-3),
                Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3),
            ),
        )

    ref, dt_ref = _run(cfg(MeshSpec(1, 1, 1)), 4, sharded=False)
    shr, dt_shr = _run(cfg(MeshSpec(2, 2, 2)), 4, sharded=True)
    assert abs(dt_ref - dt_shr) < 1e-5 * abs(dt_ref)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("mesh", [MeshSpec(1, 2, 4), MeshSpec(2, 2, 2)])
def test_sharded_shear_matches_single(mesh):
    """Shearing-box halos across a sharded mesh (reference shears across
    up to 3 y-neighbor ranks, mpicomm.f90:2104-2422): sharded y
    all-gathers the x-face slab and Fourier-shifts over the global y
    circle; sharded x shifts only on domain-edge shards.  Must match the
    single-device run (round-2 weak #8: this raised NotImplementedError)."""
    from pencil_tpu import Shear

    def cfg(mesh):
        return Config(
            grid=GridSpec(nx=16, ny=16, nz=16),
            mesh=mesh,
            time=TimeSpec(itorder=3),
            modules=(
                EosIdealGas(gamma=1.0001, cs0=1.0),
                Density(init="sinwave-z", ampl=0.05),
                Hydro(init="gaussian-noise", ampl=1e-2, Omega=1.0),
                Shear(Omega=1.0, qshear=1.5),
                Viscosity(ivisc=("nu-const",), nu=2e-3),
                Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3),
            ),
        )

    ref, dt_ref = _run(cfg(MeshSpec(1, 1, 1)), 5, sharded=False)
    shr, dt_shr = _run(cfg(mesh), 5, sharded=True)
    assert abs(dt_ref - dt_shr) < 1e-5 * abs(dt_ref)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=5e-4, atol=2e-6,
                                   err_msg=k)


@pytest.mark.parametrize("mesh", [MeshSpec(1, 2, 4), MeshSpec(2, 2, 2)])
def test_sharded_radiation_matches_single(mesh):
    """The ray sweep must be GLOBAL across a sharded axis (the reference's
    rank relay, mpicomm.f90:2424-2703): round-2 weakness #6 — each shard
    re-seeded the scan with its local boundary, so a z-sharded mesh gave a
    different answer than one device."""
    from pencil_tpu import Entropy, RadiationRay

    def cfg(mesh):
        return Config(
            grid=GridSpec(nx=16, ny=16, nz=16),
            mesh=mesh,
            time=TimeSpec(itorder=3),
            modules=(
                EosIdealGas(gamma=1.4, cs0=1.0),
                Density(init="sinwave-z", ampl=0.1),
                Hydro(init="gaussian-noise", ampl=1e-2),
                Viscosity(ivisc=("nu-const",), nu=2e-3),
                Entropy(),
                RadiationRay(arad=0.3, kapparho_const=2.0,
                             qrad_factor=0.5),
            ),
        )

    ref, dt_ref = _run(cfg(MeshSpec(1, 1, 1)), 4, sharded=False)
    shr, dt_shr = _run(cfg(mesh), 4, sharded=True)
    assert abs(dt_ref - dt_shr) < 1e-5 * abs(dt_ref)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=5e-4, atol=1e-6,
                                   err_msg=k)


def test_radiation_periodic_ray_closed_form():
    """bc_rad='p': the closed-loop inflow I = B/(1−A)
    (radboundary_yz_periodic_ray, mpicomm.f90:2655).  For a UNIFORM box
    I must equal S exactly (radiative equilibrium → Q = 0), which the
    thermalized-inflow default also satisfies; for a structured box the
    periodic sweep must match wrapping the domain twice."""
    import jax.numpy as jnp
    from pencil_tpu.physics.radiation import _ray_sweep
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.uniform(0.5, 2.0, (8, 8, 8)), jnp.float32)
    dtau = jnp.asarray(rng.uniform(0.1, 0.5, (8, 8, 8)), jnp.float32)
    I = np.asarray(_ray_sweep(S, dtau, 2, False, True))
    # brute force: iterate the loop map I0 <- A I0 + B until fixed point
    a = np.exp(-np.asarray(dtau))
    b = (1 - a) * np.asarray(S)
    I0 = np.zeros((8, 8, 1))
    for _ in range(200):
        x = I0
        for k in range(8):
            x = a[:, :, k:k+1] * x + b[:, :, k:k+1]
        I0 = x
    # I at index k = state after passing cells 0..k starting from I0
    x = I0
    expect = np.empty((8, 8, 8))
    for k in range(8):
        x = a[:, :, k:k+1] * x + b[:, :, k:k+1]
        expect[:, :, k] = x[:, :, 0]
    np.testing.assert_allclose(I, expect, rtol=2e-5, atol=1e-6)


def test_radiation_frequency_bins():
    """Two frequency bins with weights (reference nnu>1): equal-opacity
    bins with weights summing to 1 must reproduce the single-bin Q."""
    from pencil_tpu import Entropy, RadiationRay

    def run(rad):
        cfg = Config(
            grid=GridSpec(nx=8, ny=8, nz=8),
            time=TimeSpec(itorder=3),
            modules=(EosIdealGas(gamma=1.4), Density(init="sinwave-z",
                                                     ampl=0.1),
                     Hydro(), Entropy(), rad),
        )
        model = Model(cfg)
        state = model.init_state(1)
        step = model.make_step()
        for _ in range(3):
            state = step(state)
        return np.asarray(state["fields"]["ss"])

    a = run(RadiationRay(arad=0.3, kapparho_const=2.0, qrad_factor=0.5))
    b = run(RadiationRay(arad=0.3, kapparho_const=2.0, qrad_factor=0.5,
                         kappa_bins=(1.0, 1.0), weight_bins=(0.4, 0.6)))
    np.testing.assert_allclose(b, a, rtol=1e-6)
    # distinct bins give a different (finite) answer
    c = run(RadiationRay(arad=0.3, kapparho_const=2.0, qrad_factor=0.5,
                         kappa_bins=(0.2, 3.0), weight_bins=(0.5, 0.5)))
    assert np.isfinite(c).all()
    assert np.abs(c - a).max() > 1e-6


def test_sharded_matches_single_nonperiodic_z():
    bcz = (BC.parse("ux", "s"), BC.parse("uy", "s"), BC.parse("uz", "a"),
           BC.parse("lnrho", "a2"),
           BC.parse("ax", "s"), BC.parse("ay", "s"), BC.parse("az", "a"))
    ref, _ = _run(_cfg(MeshSpec(1, 1, 1), (True, True, False), bcz), 5, False)
    shr, _ = _run(_cfg(MeshSpec(1, 2, 4), (True, True, False), bcz), 5, True)
    for k in ref:
        np.testing.assert_allclose(shr[k], ref[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)
