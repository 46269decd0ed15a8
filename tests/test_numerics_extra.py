"""ADI implicit diffusion and WENO5 transport tests."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu.core.config import GridSpec
from pencil_tpu.integrate.implicit import adi_diffuse
from pencil_tpu.ops.stencil import NGHOST
from pencil_tpu.ops.weno import weno5_div_flux


def test_adi_decay_rate_periodic():
    """Implicit solve of a single Fourier mode decays exactly by
    1/(1+χΔt k²) per application — stable far beyond the explicit CFL."""
    spec = GridSpec(nx=32, ny=8, nz=8)
    x = np.linspace(spec.x0, spec.x0 + spec.Lx, 32, endpoint=False)
    f = jnp.asarray((np.sin(2 * x)[:, None, None]
                     * np.ones((1, 8, 8))).astype(np.float32))
    chi_dt = 10.0  # explicit CFL would need dt ~ 1e-3; this is ~1e4 x larger
    out = adi_diffuse(f, chi_dt, spec)
    expect = np.asarray(f) / (1.0 + chi_dt * 4.0)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_adi_nonperiodic_stable_and_conservative():
    spec = GridSpec(nx=8, ny=8, nz=32, periodic=(True, True, False))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((8, 8, 32)).astype(np.float32))
    out = adi_diffuse(f, 5.0, spec)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # zero-flux BCs conserve the total
    np.testing.assert_allclose(o.mean(), np.asarray(f).mean(), atol=1e-5)
    # and strongly smooth the field
    assert o.std() < 0.5 * np.asarray(f).std()


def _advect_weno(q0, u, nsteps, dt, dx):
    g = NGHOST
    q = q0
    ug = jnp.pad(jnp.full_like(q0, u), ((g, g), (0, 0), (0, 0)), mode="wrap")
    for _ in range(nsteps):
        # SSP RK2
        qg = jnp.pad(q, ((g, g), (0, 0), (0, 0)), mode="wrap")
        k1 = weno5_div_flux(qg, ug, 0, 1.0 / dx)
        q1 = q + dt * k1
        qg1 = jnp.pad(q1, ((g, g), (0, 0), (0, 0)), mode="wrap")
        k2 = weno5_div_flux(qg1, ug, 0, 1.0 / dx)
        q = 0.5 * (q + q1 + dt * k2)
    return q


def test_weno5_advects_tophat_without_oscillation():
    n = 64
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    q0 = jnp.asarray(((x > 0.25) & (x < 0.5)).astype(np.float32)
                     [:, None, None] * np.ones((1, 4, 4), np.float32))
    u = 1.0
    dt = 0.4 * dx
    nsteps = int(round(0.25 / (u * dt)))  # advect by 1/4 box
    q = np.asarray(_advect_weno(q0, u, nsteps, dt, dx))
    # essentially non-oscillatory: no significant over/undershoots
    assert q.min() > -5e-3 and q.max() < 1.005
    # mass conserved
    np.testing.assert_allclose(q.mean(), np.asarray(q0).mean(), rtol=1e-5)
    # profile actually moved by ~0.25: centroid check (periodic-safe window)
    c0 = (np.asarray(q0)[:, 0, 0] * x).sum() / np.asarray(q0)[:, 0, 0].sum()
    c1 = (q[:, 0, 0] * x).sum() / q[:, 0, 0].sum()
    np.testing.assert_allclose(c1 - c0, 0.25, atol=0.02)


def test_weno5_smooth_accuracy():
    """On a smooth profile WENO5 ≈ 5th order: tiny error after advection."""
    n = 64
    dx = 2 * np.pi / n
    x = np.arange(n) * dx
    q0 = jnp.asarray((np.sin(x)[:, None, None]
                      * np.ones((1, 4, 4))).astype(np.float32))
    dt = 0.3 * dx
    nsteps = 40
    q = np.asarray(_advect_weno(q0, 1.0, nsteps, dt, dx))
    expect = np.sin(x - 1.0 * nsteps * dt)
    err = np.abs(q[:, 0, 0] - expect).max()
    assert err < 5e-3, err
