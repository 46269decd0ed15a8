"""Operator-split implicit diffusion (reference ``src/implicit_physics.f90``
``calc_heatcond_ADI`` called at src/run.f90:715: alternating-direction
tridiagonal solves for heat conduction stiffer than the explicit CFL).

TPU-native: per axis, solve (I − Δt·χ ∂²_a) f = f sequentially
(Douglas–Gunn splitting, 1st-order in the splitting, unconditionally
stable).  Periodic axes solve exactly in Fourier space (diagonal there);
non-periodic axes use ``jax.lax.linalg.tridiagonal_solve`` with
zero-gradient boundary rows."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _solve_axis_periodic(f, chi_dt, n, d, axis):
    k = 2 * np.pi * np.fft.fftfreq(n, d=d)
    k2 = jnp.asarray(k * k, jnp.float32)
    shape = [1] * f.ndim
    shape[axis] = n
    fk = jnp.fft.fft(f, axis=axis)
    fk = fk / (1.0 + chi_dt * k2.reshape(shape))
    return jnp.real(jnp.fft.ifft(fk, axis=axis)).astype(f.dtype)


def _solve_axis_tridiag(f, chi_dt, n, d, axis):
    """(I − Δt·χ·D2) x = f with 2nd-order D2 and zero-flux boundaries."""
    r = chi_dt / (d * d)
    dl = jnp.full((n,), -r, jnp.float32).at[0].set(0.0)
    du = jnp.full((n,), -r, jnp.float32).at[n - 1].set(0.0)
    diag = jnp.full((n,), 1.0 + 2.0 * r, jnp.float32)
    # zero-gradient: ghost = first interior → boundary rows see only one
    # neighbour with weight r
    diag = diag.at[0].set(1.0 + r).at[n - 1].set(1.0 + r)
    fm = jnp.moveaxis(f, axis, 0).astype(jnp.float32)
    sh = fm.shape
    b = fm.reshape(n, -1)
    x = jax.lax.linalg.tridiagonal_solve(dl, diag, du, b)
    return jnp.moveaxis(x.reshape(sh), 0, axis).astype(f.dtype)


def adi_diffuse(field, chi_dt, spec):
    """Implicitly diffuse one interior scalar field by Δt·χ (split per
    axis)."""
    out = field
    for axis, (n, d, per) in enumerate(zip(
            spec.shape, (spec.dx, spec.dy, spec.dz), spec.periodic)):
        ax = field.ndim - 3 + axis
        if per:
            out = _solve_axis_periodic(out, chi_dt, n, d, ax)
        else:
            out = _solve_axis_tridiag(out, chi_dt, n, d, ax)
    return out
