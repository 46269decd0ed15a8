"""Benchmark: forced isothermal MHD turbulence, single chip.

The reference's universal metric is µs per step per mesh point
(src/run.f90:945-951); BASELINE.json's north-star is >1e9 grid-point
updates/s/chip at 256³ MHD.  vs_baseline = updates_per_sec / 1e9.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np


def bench_particles():
    """PC_BENCH=particles: dusty-turbulence throughput with npar≈1e6 TSC
    particles + drag back-reaction on the gas (the workload the
    reference's brick load balancing exists for,
    src/particles_mpicomm_blocks.f90)."""
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    n = int(os.environ.get("BENCH_N", 128 if on_accel else 16))
    npar = int(os.environ.get("BENCH_NPAR",
                              1_000_000 if on_accel else 10_000))
    nsteps = int(os.environ.get("BENCH_STEPS", 10 if on_accel else 3))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Model, ParticlesDust, TimeSpec, Viscosity)

    cfg = Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3),
                 ParticlesDust(npar=npar, tausp=0.1, eps_dtog=0.01,
                               init="random", scheme="tsc")),
    )
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    state = step(state)
    jax.block_until_ready(state["particles"]["vp"])
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state)
    jax.block_until_ready(state["particles"]["vp"])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(np.asarray(state["particles"]["vp"])).all()
    per_s = nsteps * (npar + n ** 3) / elapsed
    print(json.dumps({
        "metric": f"gas+particle updates/s/chip, {n}^3 hydro + {npar} TSC "
                  f"drag particles w/ back-reaction, {platform}",
        "value": per_s,
        "unit": "updates/s",
        "vs_baseline": per_s / 1.0e9,
        "steps": nsteps, "npar": npar, "grid": n,
    }))


def main():
    import jax

    if os.environ.get("PC_BENCH", "") == "particles":
        return bench_particles()

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    n = int(os.environ.get("BENCH_N", 256 if on_accel else 32))
    nwarm = 3
    nsteps = int(os.environ.get("BENCH_STEPS", 20 if on_accel else 5))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_cfg
    from pencil_tpu import Model

    cfg = _flagship_cfg(n=n)
    if os.environ.get("PC_FAKE_RHS"):
        # memory-floor instrumentation: the fake RHS produces no CFL
        # signal, so pin dt tiny to keep the state finite
        import dataclasses
        cfg = dataclasses.replace(
            cfg, time=dataclasses.replace(cfg.time, dt=1e-9))
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()

    # production inner loop: scan a chunk of steps inside one jit (the run
    # driver's between-diagnostics pattern) so per-step dispatch amortizes
    import jax.numpy as jnp

    chunk = int(os.environ.get("BENCH_CHUNK", 10))

    # the hot loop carries the PACKED (stacked-fa) state: the per-step
    # dict unstack/stack fusions cost ~17% of a fused 256³ step
    state = model.pack_state(state)

    @jax.jit
    def steps(state):
        def body(s, _):
            return model._local_step(s, model.grid), ()
        s, _ = jax.lax.scan(body, state, None, length=chunk)
        return s

    for _ in range(nwarm):
        state = steps(state)
    jax.block_until_ready(state.get("_fa", state.get("fields")))

    t0 = time.perf_counter()
    for _ in range(nsteps // chunk):
        state = steps(state)
    jax.block_until_ready(state.get("_fa", state.get("fields")))
    elapsed = time.perf_counter() - t0
    nsteps = (nsteps // chunk) * chunk
    state = model.unpack_state(state)

    npts = n ** 3
    updates_per_s = nsteps * npts / elapsed
    us_per_pt_step = elapsed * 1e6 / (nsteps * npts)
    assert np.isfinite(np.asarray(state["fields"]["uu"])).all()

    print(json.dumps({
        "metric": f"grid-point updates/sec/chip, {n}^3 forced isothermal MHD "
                  f"(8 vars, RK3, 6th-order FD), {platform}",
        "value": updates_per_s,
        "unit": "updates/s",
        "vs_baseline": updates_per_s / 1.0e9,
        "us_per_point_step": us_per_pt_step,
        "steps": nsteps,
        "grid": n,
    }))


if __name__ == "__main__":
    main()
