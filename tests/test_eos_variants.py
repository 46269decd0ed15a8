"""EOS slot variants: Saha partial ionization."""
import numpy as np
import jax.numpy as jnp

from pencil_tpu import (Config, Density, EosIdealGas, EosIonization, Entropy,
                        GridSpec, Hydro, Model, TimeSpec)


def _pen(eos, ss_val=0.0, lnrho_val=0.0):
    from pencil_tpu.core.farray import Registry
    from pencil_tpu.core.grid import make_grid
    from pencil_tpu.physics.pencils import Pencils
    spec = GridSpec(nx=8, ny=8, nz=8)
    cfg = Config(grid=spec, modules=(eos,))
    grid = make_grid(spec)
    reg = Registry()
    reg.register("lnrho", 1, "pde")
    reg.register("ss", 1, "pde")
    reg.finalize()
    fg = jnp.stack([jnp.full((14, 14, 14), lnrho_val, jnp.float32),
                    jnp.full((14, 14, 14), ss_val, jnp.float32)])
    return Pencils(fg, grid, reg, cfg, eos)


def test_saha_limits():
    eos = EosIonization(gamma=5.0 / 3.0, cs0=1.0, TT_ion=50.0, saha_A=1.0)
    # cold: T << TT_ion → neutral, cs2 → ideal-gas value
    pen = _pen(eos, ss_val=0.0)
    y = np.asarray(eos.yH(pen))
    assert y.max() < 1e-3
    cs2_cold = np.asarray(pen.cs2())
    ref = np.asarray(_pen(EosIdealGas(gamma=5.0 / 3.0, cs0=1.0)).cs2())
    np.testing.assert_allclose(cs2_cold, ref, rtol=1e-3)
    # hot: T >> TT_ion → fully ionized, cs2 → 2x ideal (1+y, y→1)
    eos_hot = EosIonization(gamma=5.0 / 3.0, cs0=1.0, TT_ion=0.001,
                            saha_A=1e4)
    pen = _pen(eos_hot, ss_val=0.0)
    y = np.asarray(eos_hot.yH(pen))
    assert y.min() > 0.99
    cs2_hot = np.asarray(pen.cs2())
    np.testing.assert_allclose(cs2_hot, 2.0 * ref, rtol=2e-2)


def test_saha_monotone_in_temperature():
    eos = EosIonization(gamma=5.0 / 3.0, cs0=1.0, TT_ion=5.0, saha_A=1.0)
    ys = []
    for ss in (-1.0, 0.0, 1.0, 2.0):   # increasing entropy → increasing T
        ys.append(float(np.mean(np.asarray(eos.yH(_pen(eos, ss_val=ss))))))
    assert all(a <= b + 1e-9 for a, b in zip(ys, ys[1:])), ys


def test_ionizing_sound_wave_runs():
    cfg = Config(
        grid=GridSpec(nx=16, ny=8, nz=8),
        time=TimeSpec(itorder=3, dt=2e-3),
        modules=(EosIonization(gamma=5.0 / 3.0, cs0=1.0, TT_ion=2.0,
                               saha_A=1.0),
                 Density(), Hydro(init="coswave-x", ampl=1e-3, kx=1.0),
                 Entropy()),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(20):
        state = step(state)
    for k, v in state["fields"].items():
        assert np.isfinite(np.asarray(v)).all(), k
