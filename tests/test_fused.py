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


def test_fused_wrap_tail_matches_jnp():
    """The wrap-mode tail chain (deferred substep-1 axpy, dead-df-write
    elision on the last substep, in-kernel forcing kick) must reproduce
    the jnp path bit-for-bit-in-f32 — this IS the benchmarked flagship
    configuration.  CPU interpreter at 16³, or 16×16×128 compiled on the
    real chip (the z lane extent must be 128-aligned on hardware)."""
    from pencil_tpu import Forcing
    nz = 128 if jax.default_backend() == "tpu" else 16
    base = dict(
        grid=GridSpec(nx=16, ny=16, nz=nz),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.0, cs0=1.0),
                 Density(),
                 Hydro(init="gaussian-noise", ampl=1e-3),
                 Viscosity(ivisc=("nu-const",), nu=5e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-4, eta=5e-3),
                 Forcing(force=0.07, kf=3.0)),
    )
    out = {}
    for fused in (True, False):
        model = Model(Config(fused=fused, **base))
        if fused:
            assert model._fused_mode(None, None, nz) == "wrap"
        state = model.init_state(11)
        step = model.make_step()
        for _ in range(4):
            state = step(state)
        out[fused] = {k: np.asarray(v) for k, v in state["fields"].items()}
        out[(fused, "dt")] = float(state["dt"])
    np.testing.assert_allclose(out[(True, "dt")], out[(False, "dt")],
                               rtol=1e-6)
    for k in out[True]:
        a = np.asarray(out[True][k], np.float64)
        b = np.asarray(out[False][k], np.float64)
        # the fused path applies the forcing kick INSIDE the last-substep
        # kernel (same sub-key, different f32 op order), so allow a few
        # ulps more than pure-roundoff: 2e-5 relative, the same bound as
        # test_fused_matches_jnp_path
        assert np.abs(a - b).max() < 2e-5 * max(np.abs(b).max(), 1e-3), k


def test_fused_zsharded_matches_jnp():
    """The megakernel must survive a z-sharded mesh (round-2 verdict #2):
    with mesh (1,2,4) the fused path switches to z-ghosted tiles whose z
    halo rides the ppermute exchange; result must match the single-device
    jnp path.  Runs in the CPU interpreter at 16³."""
    from pencil_tpu import MeshSpec
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    base = dict(
        grid=GridSpec(nx=16, ny=16, nz=16),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.0001),
                 Density(init="sinwave-z", ampl=0.05),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3)),
    )
    mj = Model(Config(fused=False, **base))
    sj = mj.init_state(3)
    stj = mj.make_step()
    mf = Model(Config(fused=True, mesh=MeshSpec(1, 2, 4), **base))
    assert mf._fused_ok
    assert mf._fused_mode(("x", "y", "z"), None, 4) == "zghost"
    sf = mf.init_state(3)
    stf = mf.make_sharded_step(mf.make_mesh())
    for _ in range(3):
        sj, sf = stj(sj), stf(sf)
    np.testing.assert_allclose(float(sf["dt"]), float(sj["dt"]), rtol=1e-6)
    for k in sj["fields"]:
        a = np.asarray(sf["fields"][k], np.float64)
        b = np.asarray(sj["fields"][k], np.float64)
        assert np.abs(a - b).max() < 5e-6 * max(np.abs(b).max(), 1e-3), k


def test_fused_nonperiodic_z_matches_jnp():
    """z-ghosted tiles also unlock the fused kernel for non-periodic z
    (physical BCs applied in the HBM ghosts before the DMA) — the
    conv-slab geometry.  Fused vs jnp: 16³ in the CPU interpreter, or
    32×32×128 COMPILED when run on the real chip (PC_TPU=1 lane —
    this is the hardware validation of the z-ghosted Mosaic layout)."""
    from pencil_tpu import BC
    on_tpu = jax.default_backend() == "tpu"
    nz = 128 if on_tpu else 16
    bcz = (BC.parse("ux", "s"), BC.parse("uy", "s"), BC.parse("uz", "a"),
           BC.parse("lnrho", "a2"))
    base = dict(
        grid=GridSpec(nx=16, ny=16, nz=nz, periodic=(True, True, False)),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.4),
                 Density(init="sinwave-x", ampl=0.05),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)),
        bcz=bcz,
    )
    out = {}
    for fused in (True, False):
        model = Model(Config(fused=fused, **base))
        if fused:
            assert model._fused_ok
            assert model._fused_mode(None, None, nz) == "zghost"
        state = model.init_state(3)
        step = model.make_step()
        for _ in range(3):
            state = step(state)
        out[fused] = {k: np.asarray(v) for k, v in state["fields"].items()}
    for k in out[True]:
        a, b = out[True][k], out[False][k]
        assert np.abs(a - b).max() < 5e-6 * max(np.abs(b).max(), 1e-3), k


def test_fused_shear_shock_matches_jnp_small():
    """Fused path with SHEAR (shear-periodic x ghosts + in-kernel tile
    coordinates for u_y0 = S·x) and SHOCK (jnp aux pre-pass feeding the
    kernel's comm-aux slot) against the jnp path — 16³ runs fine in the
    CPU interpreter.  Also regression-guards the y-pad Fourier-shift bug
    (the shearing ghost shift must FFT over exactly ny interior rows,
    not the sublane-padded slab)."""
    import dataclasses
    from pencil_tpu.physics.shear import Shear
    from pencil_tpu.physics.shock import Shock
    mods = (EosIdealGas(gamma=1.0001),
            Density(init="gaussian-noise", ampl=1e-2),
            Hydro(init="gaussian-noise", ampl=1e-2, Omega=1.0),
            Shear(Omega=1.0, qshear=1.5),
            Viscosity(ivisc=("nu-const", "nu-shock"), nu=2e-3,
                      nu_shock=1.0),
            Magnetic(init="gaussian-noise", ampl=1e-4, eta=2e-3),
            Shock())
    cfg_f = Config(grid=GridSpec(nx=16, ny=16, nz=16), modules=mods,
                   fused=True)
    cfg_j = dataclasses.replace(cfg_f, fused=False)
    mf, mj = Model(cfg_f), Model(cfg_j)
    assert mf._fused_ok
    sf, sj = mf.init_state(5), mj.init_state(5)
    stf, stj = jax.jit(mf.make_step()), jax.jit(mj.make_step())
    for _ in range(3):
        sf, sj = stf(sf), stj(sj)
    np.testing.assert_allclose(float(sf["dt"]), float(sj["dt"]), rtol=1e-6)
    for k in ("uu", "lnrho", "aa"):
        a = np.asarray(sf["fields"][k], np.float64)
        b = np.asarray(sj["fields"][k], np.float64)
        scale = np.abs(b).max()
        assert np.abs(a - b).max() < 5e-6 * max(scale, 1e-3), k


def test_packed_state_matches_dict_state():
    """pack_state swaps the fields dict for the stacked _fa in the hot
    loop (bench.py / Run chunked scans).  The packed step must be
    BIT-identical to the dict step — same kernels, same RNG stream
    (including the in-kernel forcing kick's sub-key)."""
    from pencil_tpu import Forcing
    nz = 128 if jax.default_backend() == "tpu" else 16
    base = dict(
        grid=GridSpec(nx=16, ny=16, nz=nz),
        time=TimeSpec(itorder=3),
        fused=True,
        modules=(EosIdealGas(gamma=1.0, cs0=1.0),
                 Density(),
                 Hydro(init="gaussian-noise", ampl=1e-3),
                 Viscosity(ivisc=("nu-const",), nu=5e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-4, eta=5e-3),
                 Forcing(force=0.07, kf=3.0)),
    )
    model = Model(Config(**base))
    s_dict = model.init_state(7)
    s_pack = model.pack_state(s_dict)
    assert "_fa" in s_pack, "flagship configuration must be packable"
    step = model.make_step()
    for _ in range(3):
        s_dict = step(s_dict)
        s_pack = step(s_pack)
    out = model.unpack_state(s_pack)
    assert float(out["t"]) == float(s_dict["t"])
    assert float(out["dt"]) == float(s_dict["dt"])
    assert np.array_equal(np.asarray(out["key"]), np.asarray(s_dict["key"]))
    for k in s_dict["fields"]:
        np.testing.assert_array_equal(np.asarray(out["fields"][k]),
                                      np.asarray(s_dict["fields"][k]), k)


def test_pack_state_refuses_dict_needing_hooks():
    """A configuration whose forcing cannot ride the in-kernel kick (jnp
    path) must NOT pack — otherwise the after_timestep hook would be
    silently skipped."""
    from pencil_tpu import Forcing
    model = Model(Config(
        grid=GridSpec(nx=16, ny=16, nz=16),
        fused=False,
        modules=(EosIdealGas(gamma=1.0, cs0=1.0), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-3),
                 Viscosity(ivisc=("nu-const",), nu=5e-3),
                 Forcing(force=0.07, kf=3.0)),
    ))
    s = model.init_state(1)
    assert "_fa" not in model.pack_state(s)
