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


def test_stiff_chemistry_operator_split():
    """LSODE-analog operator splitting (reference
    src/lsode_for_chemistry.f90 + split_update, timestep.f90:199): H2/O2
    ignition integrated THROUGH the runaway at dt=2e-6 — far beyond the
    explicit stability limit.  The explicit path goes NaN; the split path
    (per-cell backward-Euler/Newton, 8 substeps) matches a fine-dt truth
    integration to <1%.  Subprocess for x64."""
    import json
    import os
    import subprocess
    import sys

    ref = "/root/reference/samples/0d-tests/chemistry_H2_ignition_rkf"
    if not os.path.isdir(ref):
        import pytest
        pytest.skip("reference tree not mounted")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = r'''
import sys, json, dataclasses
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from pencil_tpu.compat.rundir import load_rundir
from pencil_tpu.core.config import TimeSpec
from pencil_tpu import Model
cfg, info = load_rundir(%r)

def runto(dt, t_end, split=False):
    mods = cfg.modules
    if split:
        mods = tuple(dataclasses.replace(m, lsplit_reactions=True,
                                         nsplit_substeps=8, newton_iters=5)
                     if m.name == "chemistry" else m for m in mods)
    mdl = Model(dataclasses.replace(cfg, modules=mods,
                                    time=TimeSpec(itorder=3, dt=dt)))
    st = mdl.init_state(0)
    n = int(round(t_end / dt))
    done = 0
    while done < n:
        k = min(500, n - done)
        st = mdl.make_multi_step(k)(st)
        done += k
        T = float(np.exp(np.asarray(st["fields"]["lnTT"])).flat[0])
        if not np.isfinite(T):
            return T
    return float(np.exp(np.asarray(st["fields"]["lnTT"])).flat[0])

out = {
    "truth": runto(1e-7, 6e-4),
    "explicit": runto(2e-6, 6e-4),
    "split": runto(2e-6, 6e-4, split=True),
}
print("RESULT " + json.dumps(out))
'''
    out = subprocess.run([sys.executable, "-c", code % (repo, ref)],
                         capture_output=True, text=True, timeout=1100)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    data = json.loads(line[0][7:])
    import math
    # explicit at 13x the stable dt diverges through the runaway
    assert not math.isfinite(data["explicit"])
    # the L-stable split stays on the true trajectory
    assert math.isfinite(data["split"])
    assert abs(data["split"] - data["truth"]) < 0.01 * data["truth"]
    assert data["truth"] > 1500.0     # runaway really happened
