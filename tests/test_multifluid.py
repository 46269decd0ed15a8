"""Multi-fluid modules: cosmic rays, fluid dust, neutrals, mean-field EMF,
border profiles."""
import numpy as np

from pencil_tpu import (BorderProfiles, Config, CosmicRay, Density, DustFluid,
                        EosIdealGas, GridSpec, Hydro, Magnetic, Model,
                        Neutrals, TimeSpec, Viscosity)


def _base(n=16, extra=(), periodic=(True, True, True)):
    return Config(
        grid=GridSpec(nx=n, ny=n, nz=n, periodic=periodic),
        time=TimeSpec(itorder=3, dt=2e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)) + extra,
    )


def test_cosmicray_advection_conserves_energy():
    cfg = _base(extra=(CosmicRay(init="sinwave-x", ampl=0.1, Kperp=1e-3),))
    model = Model(cfg)
    state = model.init_state(0)
    state["fields"]["ecr"] = state["fields"]["ecr"] + 1.0
    e0 = float(np.mean(np.asarray(state["fields"]["ecr"])))
    step = model.make_step()
    for _ in range(20):
        state = step(state)
    ecr = np.asarray(state["fields"]["ecr"])
    assert np.isfinite(ecr).all()
    # adiabatic exchange is bounded; mean ecr changes only at O(divu·ecr)
    assert abs(float(ecr.mean()) - e0) < 0.05 * e0


def test_dustfluid_drag_equilibration():
    """Fluid dust relaxes to the gas velocity on τ_s (same physics as the
    Lagrangian test, Eulerian carrier)."""
    tau = 0.1
    u0 = 0.05
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=1e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(), Hydro(init="zero"),
                 DustFluid(tausd=tau)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    state["fields"]["uu"] = state["fields"]["uu"].at[0].add(u0)
    step = model.make_step()
    T = 0.2
    for _ in range(int(T / 1e-3)):
        state = step(state)
    udx = np.asarray(state["fields"]["uud"][0])
    np.testing.assert_allclose(udx, u0 * (1 - np.exp(-T / tau)), rtol=2e-2)


def test_neutrals_momentum_conserved():
    """Ion-neutral friction conserves total momentum (equal densities)."""
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=1e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(), Hydro(init="zero"),
                 Neutrals(colldrag=5.0, csn0=1.0)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    state["fields"]["uun"] = state["fields"]["uun"].at[0].add(0.1)
    step = model.make_step()
    for _ in range(100):
        state = step(state)
    px = float(np.mean(np.asarray(state["fields"]["uu"][0]))) \
        + float(np.mean(np.asarray(state["fields"]["uun"][0])))
    # total momentum (ρ=ρ_n=1): stays at initial 0.1
    np.testing.assert_allclose(px, 0.1, rtol=5e-3)
    # velocity difference decays exactly as e^(−2ν_ni t) (equal densities)
    du = abs(float(np.mean(np.asarray(state["fields"]["uu"][0])))
             - float(np.mean(np.asarray(state["fields"]["uun"][0]))))
    np.testing.assert_allclose(du, 0.1 * np.exp(-2 * 5.0 * 0.1), rtol=0.05)


def test_meanfield_alpha2_dynamo():
    """α²-dynamo: with EMF = αB − η_t µ0 J, modes with k < α/η_t grow."""
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=32),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(), Hydro(init="zero"),
                 Magnetic(init="beltrami-z", ampl=1e-6, kz=1.0,
                          eta=1e-3, meanfield_alpha=0.5,
                          meanfield_etat=0.1)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    a0 = float(np.abs(np.asarray(state["fields"]["aa"])).max())
    for _ in range(200):
        state = step(state)
    a1 = float(np.abs(np.asarray(state["fields"]["aa"])).max())
    # growth rate γ = αk − (η+η_t)k² = 0.5 − 0.101 ≈ 0.4 → ×e^0.4 at t=1
    assert a1 > 1.2 * a0, (a0, a1)


def test_border_damps_waves():
    from pencil_tpu import BC
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=32, periodic=(True, True, False)),
        time=TimeSpec(itorder=3, dt=2e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 BorderProfiles(border_frac_z=(0.15, 0.15), tborder=0.05,
                                driving=(("uu", "zero"),))),
        bcz=(BC.parse("ux", "s"), BC.parse("uy", "s"), BC.parse("uz", "a"),
             BC.parse("lnrho", "s")),
    )
    model = Model(cfg)
    state = model.init_state(0)
    u0 = np.abs(np.asarray(state["fields"]["uu"])).max()
    step = model.make_step()
    for _ in range(100):
        state = step(state)
    uu = np.asarray(state["fields"]["uu"])
    # border zones strongly damped relative to the interior (the border
    # relaxation reaches a steady balance against waves propagating in,
    # so compare against the surviving interior amplitude)
    border = np.abs(uu[:, :, :, :3]).max()
    interior = np.abs(uu[:, :, :, 12:20]).max()
    assert border < 0.5 * interior
    assert interior > 0.5 * u0
