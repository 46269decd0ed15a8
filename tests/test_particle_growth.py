"""Particle growth physics: superparticle coagulation (reference
src/particles_coagulation.f90) and sink-particle accretion (reference
src/particles_sink.f90) — validated against the analytic constant-kernel
Smoluchowski solution and by conservation laws."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pencil_tpu import Config, GridSpec
from pencil_tpu.particles import ParticlesCoagulation, ParticlesSink

FOUR_PI_OVER_3 = 4.1887902047863905


def test_constant_kernel_smoluchowski():
    """Constant kernel K: the mean physical number density obeys
    n(t) = n0 / (1 + K n0 t / 2) — the classic Smoluchowski solution the
    reference validates its kernel-test mode against."""
    npar = 512
    spec = GridSpec(nx=1, ny=1, nz=1, Lx=1.0, Ly=1.0, Lz=1.0)
    K = 1.0
    n0_tot = 1.0
    n0 = n0_tot / npar          # each swarm carries 1/npar of the density
    coag = ParticlesCoagulation(kernel="constant", kernel_cst=K,
                                lcoag_simultaneous=True)
    key = jax.random.PRNGKey(0)
    kx, key = jax.random.split(key)
    pstate = {
        "xp": jax.random.uniform(kx, (npar, 3)),
        "vp": jnp.zeros((npar, 3)),
        "ap": jnp.full((npar,), 1e-3),
        "npswarm": jnp.full((npar,), n0),
    }
    sweep = jax.jit(lambda ps, k: coag.sweep(ps, spec, 0.5, k))
    rho0 = float(jnp.sum(FOUR_PI_OVER_3 * pstate["ap"] ** 3
                         * pstate["npswarm"]))
    t = 0.0
    for it in range(40):
        key, sub = jax.random.split(key)
        pstate = sweep(pstate, sub)
        t += 0.5
    # total swarm mass density conserved exactly
    rho1 = float(jnp.sum(FOUR_PI_OVER_3 * pstate["ap"] ** 3
                         * pstate["npswarm"]))
    np.testing.assert_allclose(rho1, rho0, rtol=1e-5)
    # total physical number density follows Smoluchowski within MC noise
    nbar = float(jnp.sum(pstate["npswarm"]))
    n_analytic = n0_tot / (1.0 + 0.5 * K * n0_tot * t)
    assert abs(nbar - n_analytic) / n_analytic < 0.25, (nbar, n_analytic)
    # radii grew
    assert float(jnp.mean(pstate["ap"])) > 1e-3


def test_coagulation_asymmetric_mass_conserved():
    npar = 128
    spec = GridSpec(nx=2, ny=2, nz=2)
    coag = ParticlesCoagulation(kernel="physical", rhopmat=2.0,
                                lcoag_simultaneous=False)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    pstate = {
        "xp": spec.x0 + spec.Lx * jax.random.uniform(k1, (npar, 3)),
        "vp": 0.5 * jax.random.normal(k2, (npar, 3)),
        "ap": 10 ** jax.random.uniform(k3, (npar,), minval=-2, maxval=-1),
        "npswarm": jnp.full((npar,), 100.0),
    }
    rho0 = float(jnp.sum(pstate["ap"] ** 3 * pstate["npswarm"]))
    for it in range(10):
        key, sub = jax.random.split(key)
        pstate = coag.sweep(pstate, spec, 0.01, sub)
    rho1 = float(jnp.sum(pstate["ap"] ** 3 * pstate["npswarm"]))
    np.testing.assert_allclose(rho1, rho0, rtol=1e-4)


def test_sink_accretion_conserves_mass_momentum():
    npar = 64
    spec = GridSpec(nx=8, ny=8, nz=8)
    sink = ParticlesSink(sink_radius=2.0)
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    xp = spec.x0 + spec.Lx * jax.random.uniform(k1, (npar, 3))
    xp = xp.at[0].set(jnp.zeros(3))        # the sink at the origin
    vp = jax.random.normal(k2, (npar, 3))
    mp = jnp.ones((npar,))
    srad = jnp.zeros((npar,)).at[0].set(sink.sink_radius)
    pstate = {"xp": xp, "vp": vp, "mp": mp, "srad": srad,
              "active": jnp.ones((npar,), bool)}
    m0 = float(jnp.sum(mp))
    p0 = np.asarray(jnp.sum(mp[:, None] * vp, axis=0))
    out = sink.sweep(pstate, spec)
    n_eaten = int(npar - out["active"].sum())
    assert n_eaten > 0, "no accretion happened — enlarge sink_radius"
    act = np.asarray(out["active"])
    m1 = float(jnp.sum(jnp.where(out["active"], out["mp"], 0.0)))
    p1 = np.asarray(jnp.sum(jnp.where(out["active"][:, None],
                                      out["mp"][:, None] * out["vp"], 0.0),
                            axis=0))
    np.testing.assert_allclose(m1, m0, rtol=1e-6)
    np.testing.assert_allclose(p1, p0, rtol=1e-4, atol=1e-5)
    # sink grew
    assert float(out["mp"][0]) > 1.0


def test_sink_creation_threshold():
    spec = GridSpec(nx=4, ny=4, nz=4)
    sink = ParticlesSink(sink_radius=0.1, rhop_sink_create=5.0)
    npar = 8
    pstate = {
        "xp": jnp.zeros((npar, 3)),
        "vp": jnp.zeros((npar, 3)),
        "mp": jnp.ones((npar,)),
        "srad": jnp.zeros((npar,)),
        "active": jnp.ones((npar,), bool),
    }
    rhop = jnp.asarray([10.0, 1.0] * 4)     # alternating high/low density
    out = sink.sweep(pstate, spec, rhop_at=lambda xp: rhop)
    srad = np.asarray(out["srad"])
    assert (srad[0::2] > 0).all() or (np.asarray(out["active"]).sum()
                                      < npar)
