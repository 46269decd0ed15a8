"""Shearing-box and passive-scalar module tests."""
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro, Model,
                        PassiveScalar, Shear, TimeSpec, Viscosity)


def test_epicyclic_oscillation():
    """Uniform velocity perturbation in a shearing box oscillates at the
    epicyclic frequency κ = sqrt(2(2−q))·Ω (q=1.5, Ω=1 → κ=1)."""
    Om, q = 1.0, 1.5
    kappa = np.sqrt(2.0 * (2.0 - q)) * Om
    dt = 2e-3
    A = 1e-4
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=dt),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=1.0),
            Density(),
            Hydro(init="const-x", ampl=A, Omega=Om),
            Shear(qshear=q, Omega=Om),
        ),
    )
    # add a tiny uniform ux via custom init: use zero then set manually
    model = Model(cfg.replace(modules=(
        EosIdealGas(gamma=1.0001, cs0=1.0),
        Density(),
        Hydro(init="zero", Omega=Om),
        Shear(qshear=q, Omega=Om),
    )))
    state = model.init_state(0)
    state["fields"]["uu"] = state["fields"]["uu"].at[0].add(A)
    step = model.make_step()
    # half period: ux should flip sign to −A
    nsteps = int(round(np.pi / kappa / dt))
    for _ in range(nsteps):
        state = step(state)
    ux = float(np.mean(np.asarray(state["fields"]["uu"][0])))
    np.testing.assert_allclose(ux, -A, rtol=2e-2)


def test_shear_bc_identity_at_full_period():
    """deltay ≡ 0 (mod Ly) makes the shear BC exactly periodic: a run with
    qshear whose deltay lands on a multiple of Ly stays identical to the
    same run sampled through its own fourier shift — here just smoke + the
    deltay formula."""
    sh = Shear(qshear=1.5, Omega=1.0)
    Lx = Ly = 1.0
    import jax.numpy as jnp
    d = float(sh.deltay(jnp.asarray(2.0 / 1.5), Lx, Ly))  # S·Lx·t = −2.0
    np.testing.assert_allclose(d % Ly, 0.0, atol=1e-6)


def test_passive_scalar_advection_diffusion():
    """Gaussian scalar decays diffusively at rate D·k² for each mode; total
    scalar is conserved under advection in a periodic box."""
    D = 5e-3
    cfg = Config(
        grid=GridSpec(nx=32, ny=4, nz=4),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=1.0),
            Density(),
            Hydro(init="zero"),
            PassiveScalar(init="sinwave-x", ampl=1.0, kx=1.0, diffcc=D),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    T = 2.0
    for _ in range(int(T / 5e-3)):
        state = step(state)
    cc = np.asarray(state["fields"]["cc"])
    amp = np.abs(cc).max()
    # the half-cell-shifted periodic grid (reference convention) puts the
    # sine crest midway between points: max sampled |sin| = cos(dx/2)
    crest = np.cos(np.pi / 32)
    expect = crest * np.exp(-D * 1.0 ** 2 * T)
    np.testing.assert_allclose(amp, expect, rtol=2e-3)
