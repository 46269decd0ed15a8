"""End-to-end smoke + physics sanity tests of the composed model."""
import jax
import jax.numpy as jnp
import numpy as np

from pencil_tpu import (BC, Config, Density, Entropy, EosIdealGas, Gravity,
                        GridSpec, Hydro, Magnetic, MeshSpec, Model, TimeSpec,
                        Viscosity)


def _isothermal_cfg(n=16, cs0=1.0):
    return Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=cs0),
            Density(init="zero"),
            Hydro(init="sinwave-x", ampl=1e-3, kx=1.0),
            Viscosity(ivisc=("nu-const",), nu=1e-3),
        ),
    )


def test_step_runs_and_is_finite():
    model = Model(_isothermal_cfg())
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(5):
        state = step(state)
    for name, arr in state["fields"].items():
        assert np.isfinite(np.asarray(arr)).all(), name
    assert float(state["dt"]) > 0
    assert int(state["it"]) == 5


def test_mass_conservation_periodic():
    """∫ρ dV is conserved by the continuity equation in a periodic box."""
    model = Model(_isothermal_cfg())
    state = model.init_state(0)
    # seed a non-trivial density perturbation
    state["fields"]["lnrho"] = jnp.asarray(
        0.1 * np.sin(np.linspace(0, 2 * np.pi, 16, endpoint=False)), jnp.float32
    )[:, None, None] * jnp.ones((16, 16, 16), jnp.float32)
    step = model.make_step()
    m0 = float(jnp.mean(jnp.exp(state["fields"]["lnrho"])))
    for _ in range(20):
        state = step(state)
    m1 = float(jnp.mean(jnp.exp(state["fields"]["lnrho"])))
    assert abs(m1 - m0) / m0 < 2e-4, (m0, m1)


def test_sound_wave_speed():
    """A small-amplitude acoustic wave must travel at cs (isothermal EOS):
    after time T the ux field equals a standing-wave evolution; test the
    oscillation frequency ω = cs·k via the energy exchange period."""
    cs0 = 1.0
    n = 32
    cfg = Config(
        grid=GridSpec(nx=n, ny=4, nz=4),
        time=TimeSpec(itorder=3, dt=1e-3),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=cs0),
            Density(init="zero"),
            Hydro(init="coswave-x", ampl=1e-6, kx=1.0),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    # standing wave: ux(t) = A cos(kx) cos(ω t); zero crossing at ωt = π/2
    # with ω = cs·k = 1 → t_zero = π/2 ≈ 1.5708
    nsteps = int(round(np.pi / 2 / 1e-3))
    amps = []
    for i in range(nsteps):
        state = step(state)
    ux = np.asarray(state["fields"]["uu"][0])
    # amplitude should be ~0 at the quarter period
    assert np.abs(ux).max() < 1e-6 * 0.15, np.abs(ux).max()


def test_rk_tables_order():
    """Verify the 2N low-storage tables hit their design order on y' = λy
    (float64 numpy; reference coefficients src/timestep.f90:30-46)."""
    from pencil_tpu.integrate.timestep import RK_TABLES

    lam = -1.0 + 2.3j

    def integrate(order, dt, T):
        alpha, beta, _ = RK_TABLES[order]
        y, df = 1.0 + 0j, 0.0 + 0j
        for _ in range(int(round(T / dt))):
            for a, b in zip(alpha, beta):
                df = a * df + lam * y
                y = y + b * dt * df
        return y

    for order, design in ((1, 1), (2, 2), (3, 3), (4, 4)):
        e1 = abs(integrate(order, 0.02, 1.0) - np.exp(lam))
        e2 = abs(integrate(order, 0.01, 1.0) - np.exp(lam))
        measured = np.log2(e1 / e2)
        assert measured > design - 0.3, (order, measured)


def test_alfven_wave_mhd():
    """Alfvén wave on uniform B0 x̂: ω = vA·k. Seed uy = A cos(kx x); after a
    quarter period energy is fully in the magnetic perturbation."""
    n = 32
    rho0 = 1.0
    B0 = 1.0
    vA = B0 / np.sqrt(rho0)
    dt = 1e-3
    cfg = Config(
        grid=GridSpec(nx=n, ny=4, nz=4),
        time=TimeSpec(itorder=3, dt=dt),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=1.0),
            Density(init="zero"),
            Hydro(init="sinwave-x", ampl=1e-6, kx=1.0),  # uy = A sin(kx)
            Magnetic(B_ext=(B0, 0.0, 0.0)),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    nsteps = int(round(np.pi / 2 / vA / dt))
    for _ in range(nsteps):
        state = step(state)
    uy = np.asarray(state["fields"]["uu"][1])
    assert np.abs(uy).max() < 1e-6 * 0.2, np.abs(uy).max()


def test_divB_zero_machine_precision():
    """Evolving A keeps ∇·B = 0 (the whole point of the vector potential)."""
    from pencil_tpu.parallel.halo import fill_ghosts
    from pencil_tpu.physics.pencils import Pencils

    n = 16
    cfg = Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3),
        modules=(
            EosIdealGas(gamma=1.0001, cs0=1.0),
            Density(init="zero"),
            Hydro(init="gaussian-noise", ampl=1e-2),
            Magnetic(init="gaussian-noise", ampl=1e-2, eta=1e-3),
            Viscosity(ivisc=("nu-const",), nu=1e-3),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(10):
        state = step(state)
    fa = model.reg.stack(state["fields"])
    fg = fill_ghosts(fa, cfg.grid, (cfg.bcx, cfg.bcy, cfg.bcz), model.reg,
                     model.grid, cfg, model.eos)
    pen = Pencils(fg, model.grid, model.reg, cfg, model.eos)
    bb = np.asarray(pen.bb())
    assert np.isfinite(bb).all()
    # ∇·(∇×A) vanishes identically for commuting central stencils: compute
    # divB with the SAME der operator on wrap-padded B (periodic box).
    from pencil_tpu.ops import stencil as st
    bbg = jnp.asarray(np.pad(bb, ((0, 0), (3, 3), (3, 3), (3, 3)), mode="wrap"))
    inv = float(model.grid.dx_1[3])
    divb = sum(
        np.asarray(st.i(st.der(bbg[a:a + 1], a, inv), tuple({0, 1, 2} - {a})))[0]
        for a in range(3)
    )
    bscale = np.abs(bb).max() * inv
    assert np.abs(divb).max() < 1e-4 * bscale, (np.abs(divb).max(), bscale)


def test_density_nolog_matches_log_formulation():
    """ldensity_nolog: evolving rho directly matches the lnrho run."""
    import dataclasses
    base = Config(
        grid=GridSpec(nx=16, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=2e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(init="sinwave-x",
                                                    ampl=0.05),
                 Hydro(init="gaussian-noise", ampl=2e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)),
    )
    m1 = Model(base)
    mods = tuple(dataclasses.replace(m, lnolog=True)
                 if m.name == "density" else m for m in base.modules)
    m2 = Model(base.replace(modules=mods))
    s1, s2 = m1.init_state(2), m2.init_state(2)
    s2["fields"]["rho"] = jnp.exp(m1.init_state(2)["fields"]["lnrho"])
    st1, st2 = m1.make_step(), m2.make_step()
    for _ in range(20):
        s1, s2 = st1(s1), st2(s2)
    rho_log = np.exp(np.asarray(s1["fields"]["lnrho"]))
    rho_nolog = np.asarray(s2["fields"]["rho"])
    np.testing.assert_allclose(rho_nolog, rho_log, rtol=2e-4, atol=1e-6)
