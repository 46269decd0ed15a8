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


def max_filter_axes(fg, radius, active):
    """Separable running max over ±radius along the axes where ``active``
    is True; every axis shrinks by 2·radius regardless (inactive axes are
    center-cropped) so the output shape is shape−2r on all three trailing
    axes (reference shock_highorder.f90 ``ni=merge(ishock_max,0,nxgrid>1)``)."""
    out = fg
    for axis in range(3):
        ax = out.ndim - 3 + axis
        n = out.shape[ax] - 2 * radius
        if not active[axis]:
            out = jax.lax.slice_in_dim(out, radius, radius + n, axis=ax)
            continue
        acc = None
        for k in range(2 * radius + 1):
            s = jax.lax.slice_in_dim(out, k, k + n, axis=ax)
            acc = s if acc is None else jnp.maximum(acc, s)
        out = acc
    return out


def smooth_7pt(fg, active, lgaussian=False):
    """Separable 7-point smoothing along the active axes, each trailing axis
    shrinking by 6 (ghost width 3).  Weights are the reference
    ``smoothing_kernel`` (src/sub.f90:8674): binomial (1,6,15,20,15,6,1)
    or 'gaussian' (1,9,45,70,45,9,1), normalised per axis."""
    w = (1., 9., 45., 70., 45., 9., 1.) if lgaussian else \
        (1., 6., 15., 20., 15., 6., 1.)
    w = [c / sum(w) for c in w]
    out = fg
    for axis in range(3):
        ax = out.ndim - 3 + axis
        n = out.shape[ax] - 6
        if not active[axis]:
            out = jax.lax.slice_in_dim(out, 3, 3 + n, axis=ax)
            continue
        acc = None
        for k in range(7):
            s = w[k] * jax.lax.slice_in_dim(out, k, k + n, axis=ax)
            acc = s if acc is None else acc + s
        out = acc
    return out


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
