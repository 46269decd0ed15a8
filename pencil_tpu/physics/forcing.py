"""Stochastic helical k-shell forcing (reference ``src/forcing.f90``,
``forcing_hel`` at :1851-2259, applied once per full step OUTSIDE the RK
substeps via ``addforce``, src/run.f90:729).

Each step draws a random wavevector k from the shell |k| ∈ [kf−dk, kf+dk]
(the reference reads the shell from ``k.dat``; we enumerate the same integer
lattice shell at trace time), a random phase φ, and a random transverse
direction, building the helical eigenfunction

    f_k = (k×e − i·σ k̂×(k×e)) / (√(1+σ²) |k×e|)        σ = relhel

so that ∇×f = σ k f for |σ|=1 (maximally helical).  The velocity increment
is Δu = N·Re(f_k e^{i k·x + iφ})·dt with N = force·cs₀·√(kf·cs₀/dt) — the
√dt scaling of δ-correlated forcing."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from .base import ModuleBase


def shell_vectors(kf: float, dk: float) -> np.ndarray:
    """Integer wavevectors with |k| ∈ [kf−dk, kf+dk] (excluding k=0)."""
    kmax = int(np.ceil(kf + dk))
    rng = np.arange(-kmax, kmax + 1)
    kx, ky, kz = np.meshgrid(rng, rng, rng, indexing="ij")
    kk = np.stack([kx.ravel(), ky.ravel(), kz.ravel()], axis=1).astype(np.float64)
    kabs = np.sqrt((kk ** 2).sum(1))
    sel = (kabs > 0) & (np.abs(kabs - kf) <= dk)
    out = kk[sel]
    if len(out) == 0:
        raise ValueError(f"empty forcing shell kf={kf} dk={dk}")
    return out


@dataclass(frozen=True)
class Forcing(ModuleBase):
    name: ClassVar[str] = "forcing"

    force: float = 0.02
    kf: float = 3.0      # forcing-shell radius in box-wavenumber units
    dk: float = 0.5
    relhel: float = 1.0  # σ: 1 = maximally helical, 0 = non-helical

    def after_timestep(self, state, grid, cfg, reg, eos, dt, t, key):
        kk_table = jnp.asarray(shell_vectors(self.kf, self.dk),
                               dtype=state["uu"].dtype)
        nk = kk_table.shape[0]
        k_idx, k_phase, k_e = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (), 0, nk)
        kvec = kk_table[idx]                      # (3,) in integer units
        phase = jax.random.uniform(k_phase, (), minval=-jnp.pi, maxval=jnp.pi)
        # random direction for e, redrawn to avoid near-parallel with k
        e = jax.random.normal(k_e, (3,), dtype=kvec.dtype)
        e = e / jnp.sqrt(jnp.sum(e * e))
        # Gram-Schmidt: remove component along k
        khat = kvec / jnp.sqrt(jnp.sum(kvec * kvec))
        e = e - jnp.sum(e * khat) * khat
        e = e / jnp.maximum(jnp.sqrt(jnp.sum(e * e)), 1e-12)

        kxe = jnp.cross(kvec, e)
        kxe = kxe / jnp.maximum(jnp.sqrt(jnp.sum(kxe * kxe)), 1e-12)
        kxkxe = jnp.cross(khat, kxe)
        sig = self.relhel
        norm = 1.0 / jnp.sqrt(1.0 + sig * sig)
        f_re = norm * kxe                      # real part of f_k
        f_im = -norm * sig * kxkxe             # imag part (−iσ k̂×(k×e))

        # physical wavevector: integer k scaled by 2π/L per axis
        gs = cfg.grid
        k_phys = kvec * jnp.asarray(
            [2.0 * np.pi / gs.Lx, 2.0 * np.pi / gs.Ly, 2.0 * np.pi / gs.Lz],
            dtype=kvec.dtype)
        theta = (k_phys[0] * grid.xg + k_phys[1] * grid.yg
                 + k_phys[2] * grid.zg + phase)
        cs0 = eos.cs0 if eos is not None else 1.0
        kf_mag = jnp.sqrt(jnp.sum(k_phys * k_phys))
        N = self.force * cs0 * jnp.sqrt(kf_mag * cs0 / jnp.maximum(dt, 1e-30))
        c, s = jnp.cos(theta), jnp.sin(theta)
        duu = N * dt * jnp.stack([
            f_re[0] * c - f_im[0] * s,
            f_re[1] * c - f_im[1] * s,
            f_re[2] * c - f_im[2] * s,
        ])
        state = dict(state)
        state["uu"] = state["uu"] + duu
        return state
