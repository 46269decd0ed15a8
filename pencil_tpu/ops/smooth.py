"""Neighborhood max + binomial smoothing operators (reference
``src/shock.f90``'s max5/smooth chain used for the artificial shock
viscosity profile).  All operate along the trailing three axes of a
ghosted array, consuming ghost width as they go."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_reduce(fg, radius, op):
    """Apply op over a (2r+1)³ separable neighborhood; each axis shrinks by
    2·radius."""
    out = fg
    for axis in range(3):
        ax = out.ndim - 3 + axis
        m = out.shape[ax]
        n = m - 2 * radius
        acc = None
        for k in range(2 * radius + 1):
            s = jax.lax.slice_in_dim(out, k, k + n, axis=ax)
            acc = s if acc is None else op(acc, s)
        out = acc
    return out


def max_filter(fg, radius=2):
    """Separable running maximum over a (2r+1)³ box (reference max5)."""
    return _shift_reduce(fg, radius, jnp.maximum)


def smooth_binomial(fg):
    """Separable binomial [1,2,1]/4 smoothing (reference smooth kernel);
    each axis shrinks by 2."""
    out = fg
    for axis in range(3):
        ax = out.ndim - 3 + axis
        m = out.shape[ax]
        n = m - 2
        lo = jax.lax.slice_in_dim(out, 0, n, axis=ax)
        mid = jax.lax.slice_in_dim(out, 1, n + 1, axis=ax)
        hi = jax.lax.slice_in_dim(out, 2, n + 2, axis=ax)
        out = 0.25 * lo + 0.5 * mid + 0.25 * hi
    return out
