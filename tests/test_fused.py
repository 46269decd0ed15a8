"""Fused Pallas megakernel vs the jnp reference path: identical physics.

The fused kernel (ops/fused_rhs.py) evaluates the same Module.rhs code on
VMEM tiles with z handled by circular rolls; its step must reproduce the
jnp path to float32 roundoff.  Runs on real TPU only (the CPU interpreter
is too slow for a useful grid).
"""
import jax
import numpy as np
import pytest

from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                        Magnetic, Model, TimeSpec, Viscosity)

needs_tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                               reason="fused kernel runs on TPU")


@needs_tpu
def test_fused_matches_jnp_path():
    base = dict(
        grid=GridSpec(nx=32, ny=32, nz=128),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.0001),
                 Density(init="sinwave-z", ampl=0.05),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3)),
    )
    out = {}
    for fused in (True, False):
        model = Model(Config(fused=fused, **base))
        if fused:
            assert model._fused_ok
        state = model.init_state(3)
        step = model.make_step()
        for _ in range(3):
            state = step(state)
        out[fused] = {k: np.asarray(v) for k, v in state["fields"].items()}
    for k in out[True]:
        a, b = out[True][k], out[False][k]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert rel < 2e-5, (k, rel)
