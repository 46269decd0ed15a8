"""FFT-based Poisson solver (reference ``src/poisson.f90``
``inverse_laplacian_fft`` :85-253 over ``src/fourier_fftpack.f90``'s
transpose-based parallel FFT).

TPU-native: ``jnp.fft`` on the (possibly sharded) global array — under jit
with sharded inputs XLA inserts the all-to-all transposes that the
reference hand-codes in ``transp`` (src/mpicomm.f90:5298).  Solves
∇²φ = f in a fully periodic box; the k=0 mode is projected out (φ defined
up to a constant; f must have zero mean for solvability)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def wavenumbers(spec, dtype=jnp.float32):
    kx = 2 * np.pi * np.fft.fftfreq(spec.nx, d=spec.Lx / spec.nx)
    ky = 2 * np.pi * np.fft.fftfreq(spec.ny, d=spec.Ly / spec.ny)
    kz = 2 * np.pi * np.fft.fftfreq(spec.nz, d=spec.Lz / spec.nz)
    return (jnp.asarray(kx, dtype), jnp.asarray(ky, dtype),
            jnp.asarray(kz, dtype))


def inverse_laplacian(f, spec):
    """φ with ∇²φ = f (periodic box, spectral inverse)."""
    kx, ky, kz = wavenumbers(spec, jnp.float32)
    k2 = (kx[:, None, None] ** 2 + ky[None, :, None] ** 2
          + kz[None, None, :] ** 2)
    fk = jnp.fft.fftn(f, axes=(-3, -2, -1))
    inv = jnp.where(k2 > 0, -1.0 / jnp.maximum(k2, 1e-30), 0.0)
    phik = fk * inv
    return jnp.real(jnp.fft.ifftn(phik, axes=(-3, -2, -1))).astype(f.dtype)
