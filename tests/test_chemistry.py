"""Chemistry module: mass-action kinetics + the Gray-Scott 2-D test
(reference samples/2d-tests/chemistry_GrayScott)."""
import numpy as np

from pencil_tpu import (Chemistry, Config, Density, EosIdealGas, GridSpec,
                        Hydro, Model, TimeSpec)


def test_first_order_decay_exact():
    """A → B at rate k: Y_A(t) = e^(−kt), Y_B = 1 − Y_A."""
    k = 2.0
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=1e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(), Hydro(init="zero"),
                 Chemistry(species=("YA", "YB"),
                           reactions=(((("YA", 1),), (("YB", 1),), k, 0.0, 0.0),),
                           diff=(0.0, 0.0), ladvect=False)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    state["fields"]["chem"] = state["fields"]["chem"].at[0].set(1.0)
    state["fields"]["chem"] = state["fields"]["chem"].at[1].set(0.0)
    step = model.make_step()
    T = 0.5
    for _ in range(int(T / 1e-3)):
        state = step(state)
    YA = float(np.mean(np.asarray(state["fields"]["chem"][0])))
    YB = float(np.mean(np.asarray(state["fields"]["chem"][1])))
    np.testing.assert_allclose(YA, np.exp(-k * T), rtol=1e-4)
    np.testing.assert_allclose(YA + YB, 1.0, rtol=1e-5)


def test_gray_scott_pattern_develops():
    cfg = Config(
        grid=GridSpec(nx=64, ny=64, nz=4, x0=0.0, y0=0.0, z0=0.0,
                      Lx=2.5, Ly=2.5, Lz=0.1),
        time=TimeSpec(itorder=3, dt=0.2),
        modules=(EosIdealGas(gamma=1.0001), Density(), Hydro(init="zero"),
                 Chemistry(preset="gray-scott", feed=0.04, kill=0.06,
                           diff=(2e-5, 1e-5), width=0.12, ladvect=False)),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(300):
        state = step(state)
    U = np.asarray(state["fields"]["chem"][0])
    V = np.asarray(state["fields"]["chem"][1])
    assert np.isfinite(U).all() and np.isfinite(V).all()
    assert 0.0 <= U.min() and U.max() <= 1.2
    # the V spot survives and spreads (pattern formation, not decay)
    assert V.max() > 0.1
    assert (V > 0.1).mean() > 0.005
