"""Smaller module slots: chiral, polymer, heatflux, lorenz gauge, ascalar,
interstellar."""
import numpy as np

from pencil_tpu import (ActiveScalar, Chiral, Config, Density, EosIdealGas,
                        Entropy, GridSpec, HeatFlux, Hydro, Interstellar,
                        LorenzGauge, Magnetic, Model, Polymer, TimeSpec,
                        Viscosity)


def _run(extra, n=8, nsteps=20, dt=1e-3, seed=0, mutate=None):
    cfg = Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3, dt=dt),
        modules=(EosIdealGas(gamma=5.0 / 3.0), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)) + extra,
    )
    model = Model(cfg)
    state = model.init_state(seed)
    if mutate:
        mutate(state)
    step = model.make_step()
    for _ in range(nsteps):
        state = step(state)
    return model, state


def test_chiral_total_chirality_conserved():
    """Without the BAHN reaction, X and Y are advected/diffused only —
    their volume means are conserved (reference chiral.f90 diffusion
    terms)."""
    model, state = _run((Chiral(chiral_diff=1e-3, reaction="none",
                                initX="const", amplX=1e-2,
                                initY="const", amplY=5e-3),))
    X = np.asarray(state["fields"]["XX_chiral"])
    Y = np.asarray(state["fields"]["YY_chiral"])
    assert np.isfinite(X).all() and np.isfinite(Y).all()
    np.testing.assert_allclose(float(X.mean()), 1e-2, rtol=1e-3)
    np.testing.assert_allclose(float(Y.mean()), 5e-3, rtol=1e-3)


def test_polymer_relaxes_to_identity():
    """Without flow, C relaxes to the identity on tau_poly."""
    def mutate(state):
        state["fields"]["poly"] = state["fields"]["poly"].at[0].add(0.5)
    model, state = _run((Polymer(tau_poly=0.05),), nsteps=100, dt=2e-3,
                        mutate=mutate)
    cxx = np.asarray(state["fields"]["poly"][0])
    np.testing.assert_allclose(cxx, 1.0, atol=0.02)


def test_heatflux_telegraph_relaxation():
    """Uniform T: q relaxes to zero on tau_q."""
    def mutate(state):
        state["fields"]["qq"] = state["fields"]["qq"].at[0].add(0.1)
    model, state = _run((Entropy(), HeatFlux(tau_q=0.05, Kq=1e-3)),
                        nsteps=100, dt=2e-3, mutate=mutate)
    qx = np.asarray(state["fields"]["qq"][0])
    assert np.abs(qx).max() < 0.01


def test_lorenz_gauge_damps_diva():
    """The gauge wave carries away ∇·A (A stays divergence-damped)."""
    model, state = _run((Magnetic(init="gaussian-noise", ampl=1e-2, eta=0.0),
                         LorenzGauge(cgauge2=1.0)), nsteps=50, dt=2e-3)
    assert np.isfinite(np.asarray(state["fields"]["phi_lg"])).all()


def test_ascalar_relaxes():
    def mutate(state):
        state["fields"]["acc"] = state["fields"]["acc"] + 1.0
    model, state = _run((ActiveScalar(tau_cond=0.05),), nsteps=100, dt=2e-3,
                        mutate=mutate)
    assert np.abs(np.asarray(state["fields"]["acc"])).max() < 0.05


def test_interstellar_heating_raises_entropy():
    """'cst' heating with code-unit gas below every WSW cooling band:
    heatcool = exp(-lnTT)*heat > 0, so ss drifts up monotonically
    (reference calc_heat 'cst' branch, interstellar.f90)."""
    model0, state0 = _run((Entropy(),), nsteps=1, dt=1e-3)
    ss0 = float(np.asarray(state0["fields"]["ss"]).mean())
    model, state = _run(
        (Entropy(), Interstellar(heating_select="cst", heating_rate=0.01,
                                 GammaUV=0.0)),
        nsteps=50, dt=1e-3)
    ss = np.asarray(state["fields"]["ss"])
    assert np.isfinite(ss).all()
    assert float(ss.mean()) > ss0


def test_meanfield_e_tensor_alpha2_dynamo():
    """Isotropic-alpha EMF tensor drives an alpha^2 dynamo: a Beltrami-z
    mode with k=1 grows at lambda = alpha*k - eta*k^2 (reference
    special/meanfield_e_tensor.f90 E = alpha.B with alpha = a*I)."""
    import jax.numpy as jnp
    from pencil_tpu import GridSpec, TimeSpec, Config, Model
    from pencil_tpu.physics.special.meanfield_e_tensor import MeanfieldETensor
    from pencil_tpu import EosIdealGas, Density, Magnetic

    alpha, eta = 0.5, 0.1
    cfg = Config(
        grid=GridSpec(nx=4, ny=4, nz=16),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(EosIdealGas(gamma=1.0), Density(),
                 Magnetic(init="beltrami-z", ampl=1e-4, eta=eta),
                 MeanfieldETensor(lalpha=True, alpha_name="isotropic",
                                  alpha_scale=alpha)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()

    def arms(st):
        return float(np.sqrt(np.mean(np.square(
            np.asarray(st["fields"]["aa"])))))

    a0 = arms(state)
    nsteps = 40
    for _ in range(nsteps):
        state = step(state)
    a1 = arms(state)
    lam = np.log(a1 / a0) / (nsteps * 5e-3)
    # for a k=1 Beltrami mode E=alpha*B gives dA/dt = alpha*kA - eta*k^2 A
    np.testing.assert_allclose(lam, alpha - eta, rtol=0.05)
