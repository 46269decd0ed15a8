"""ENERGY-slot variants and kinematic hydro + radiation tests."""
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                        HydroKinematic, Magnetic, Model, RadiationRay,
                        TemperatureIdealGas, TimeSpec, Viscosity)


def test_temperature_sound_wave():
    """lnTT-based energy eq reproduces the adiabatic sound speed
    cs = sqrt((γ−1)·cp·T₀): choose T₀ so cs = 1, then ux vanishes at the
    quarter period t = π/2 of the k=1 standing wave."""
    gamma = 5.0 / 3.0
    T0 = 1.0 / (gamma - 1.0)  # cs² = (γ−1)cp·T = 1
    cfg = Config(
        grid=GridSpec(nx=32, ny=4, nz=4),
        time=TimeSpec(itorder=3, dt=2e-3),
        modules=(
            EosIdealGas(gamma=gamma, cs0=1.0),
            Density(),
            # amplitude large enough that lnTT increments survive f32
            # rounding around its O(0.4) offset (see docs/PARITY.md float
            # discipline note)
            Hydro(init="coswave-x", ampl=1e-3, kx=1.0),
            TemperatureIdealGas(),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    nsteps = int(round(np.pi / 2 / 2e-3))  # quarter period at cs=1, k=1
    for _ in range(nsteps):
        state = step(state)
    ux = np.asarray(state["fields"]["uu"][0])
    assert np.abs(ux).max() < 1e-3 * 0.1, np.abs(ux).max()


def test_kinematic_roberts_dynamo_grows():
    """Roberts flow is a classic kinematic dynamo: with the right Rm the
    field grows; at minimum the induction term must inject energy."""
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3, dt=5e-3),
        modules=(
            EosIdealGas(gamma=1.0001),
            Density(),
            HydroKinematic(profile="roberts", ampl=1.0),
            # seed the growing k_z=1 eigenmode directly (noise seeds decay
            # resistively before the dynamo mode emerges)
            Magnetic(init="beltrami-z", ampl=1e-6, kz=1.0, eta=0.05),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    def brms(s):
        from pencil_tpu.parallel.halo import fill_ghosts
        from pencil_tpu.physics.pencils import Pencils
        fa = model.reg.stack(s["fields"])
        fg = fill_ghosts(fa, cfg.grid, (cfg.bcx, cfg.bcy, cfg.bcz),
                         model.reg, model.grid, cfg, model.eos)
        pen = Pencils(fg, model.grid, model.reg, cfg, model.eos)
        return float(np.sqrt(np.mean(np.asarray(pen.b2()))))
    b0 = brms(state)
    for _ in range(300):
        state = step(state)
    b1 = brms(state)
    assert np.isfinite(b1)
    assert b1 > 1.3 * b0, (b0, b1)  # dynamo growth at Rm = u/(η k) = 20


def test_radiation_relaxes_temperature():
    """Grey radiative transfer drives a hot spot toward radiative
    equilibrium with its surroundings (Q < 0 where T > T_eq)."""
    cfg = Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3, dt=1e-4),
        modules=(
            EosIdealGas(gamma=5.0 / 3.0, cs0=1.0),
            Density(),
            Hydro(init="zero"),
            __import__("pencil_tpu").Entropy(init="gaussian-z", ampl=0.2,
                                             width=0.5),
            RadiationRay(arad=1.0, kapparho_const=2.0, qrad_factor=1.0),
        ),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    ss0 = np.asarray(state["fields"]["ss"])
    spread0 = ss0.max() - ss0.min()
    for _ in range(50):
        state = step(state)
    ss1 = np.asarray(state["fields"]["ss"])
    assert np.isfinite(ss1).all()
    assert ss1.max() - ss1.min() < spread0, "radiation should smooth T"
