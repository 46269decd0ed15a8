"""FFT-based Poisson solver (reference ``src/poisson.f90``
``inverse_laplacian_fft`` :85-253 over ``src/fourier_fftpack.f90``'s
transpose-based parallel FFT).

TPU-native: ``jnp.fft`` on the (possibly sharded) global array — under jit
with sharded inputs XLA inserts the all-to-all transposes that the
reference hand-codes in ``transp`` (src/mpicomm.f90:5298).  Solves
∇²φ = f in a fully periodic box; the k=0 mode is projected out (φ defined
up to a constant; f must have zero mean for solvability)."""
from __future__ import annotations

import jax
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


def inverse_laplacian_sharded(f_local, spec, mesh_axis_names=None,
                              mesh_shape=(1, 1, 1)):
    """Global periodic Poisson solve from inside a ``shard_map`` region.

    The reference's solve is global by construction (src/poisson.f90:85
    over ``transp``-rotated full pencils, src/mpicomm.f90:5298); a local
    per-shard FFT would silently solve nproc independent small problems.
    Here each shard ``all_gather``s the source to the full grid, solves
    spectrally, and slices its own block back out — O(N) replicated memory
    per device, which is fine at the grid sizes a Poisson-gravity run uses;
    an all_to_all transposed FFT is the scalable upgrade path.
    """
    names = mesh_axis_names or (None, None, None)
    full = f_local
    for axis in range(3):
        if names[axis] is not None and mesh_shape[axis] > 1:
            full = jax.lax.all_gather(full, names[axis], axis=axis,
                                      tiled=True)
    phi = inverse_laplacian(full, spec)
    for axis in range(3):
        if names[axis] is not None and mesh_shape[axis] > 1:
            n_loc = phi.shape[axis] // mesh_shape[axis]
            idx = jax.lax.axis_index(names[axis])
            phi = jax.lax.dynamic_slice_in_dim(phi, idx * n_loc, n_loc,
                                               axis=axis)
    return phi
