"""Structure functions and two-point statistics (reference
``src/struct_func.f90``: SF_p(l) = <|u(x+l)−u(x)|^p> via pairwise
differences with transposes; here periodic rolls under jit)."""
from __future__ import annotations

import jax.numpy as jnp


def structure_function(field, orders=(2,), axis=0, max_sep=None):
    """SF_p(ℓ) along one axis for a scalar or vector field.

    field: (nx,ny,nz) or (3,nx,ny,nz); returns {p: (nsep,) array}, with
    separations ℓ = 1..max_sep grid cells (periodic)."""
    if field.ndim == 3:
        field = field[None]
    ax = field.ndim - 3 + axis
    n = field.shape[ax]
    nsep = max_sep or n // 2
    out = {p: [] for p in orders}
    for l in range(1, nsep + 1):
        du = jnp.roll(field, -l, axis=ax) - field
        dmag = jnp.sqrt(jnp.sum(du * du, axis=0))
        for p in orders:
            out[p].append(jnp.mean(dmag ** p))
    return {p: jnp.stack(v) for p, v in out.items()}


def autocorrelation(field, axis=0):
    """Two-point autocorrelation C(ℓ) = <f(x)·f(x+ℓ)>/<|f|²> along one
    axis (component-summed for vectors, averaged over the other axes)."""
    if field.ndim == 3:
        field = field[None]
    ax = field.ndim - 3 + axis
    fk = jnp.fft.fft(field, axis=ax)
    corr = jnp.fft.ifft(fk * jnp.conj(fk), axis=ax).real
    corr = jnp.sum(corr, axis=0)  # sum components → (nx, ny, nz)
    other = tuple(a for a in range(3) if a != axis)
    c = jnp.mean(corr, axis=other)
    return c / c[0]
