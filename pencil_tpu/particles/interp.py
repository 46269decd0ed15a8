"""Grid↔particle mapping (reference ``src/particles_map.f90``: NGP/CIC/TSC
selection at :54-90, interpolation of gas quantities to particles and
deposition of particle fields to the grid).

TPU-native: interpolation = vectorized gather from the *ghosted* gas stack
(ghost zones make periodic wrap free); deposition = scatter-add onto a
ghosted accumulator followed by a ghost-fold (the adjoint of the periodic
ghost fill).  All shapes static; indices clipped to the ghosted extents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stencil import NGHOST


def _cell_coords(xp, spec, dtype, origin=None):
    """Fractional cell coordinates of particles relative to the ghosted
    array origin.  xp: (npar, 3) positions; ``origin`` overrides the box
    corner for per-shard local frames."""
    g = NGHOST
    if origin is None:
        x0 = jnp.asarray([spec.x0, spec.y0, spec.z0], dtype)
    else:
        x0 = origin
    d = jnp.asarray([spec.dx, spec.dy, spec.dz], dtype)
    return (xp - x0) / d + g  # grid-point i sits at x0 + (i-g)*dx


def _tsc_weights(fc):
    """Triangular-shaped-cloud weights over 3 points per axis.

    fc: fractional coordinate; returns (idx0, (w0, w1, w2)) with idx0 the
    lowest of the 3 contributing grid indices."""
    i_near = jnp.floor(fc + 0.5).astype(jnp.int32)  # nearest grid point
    d = fc - i_near.astype(fc.dtype)                # in [-1/2, 1/2]
    w0 = 0.5 * (0.5 - d) ** 2
    w1 = 0.75 - d * d
    w2 = 0.5 * (0.5 + d) ** 2
    return i_near - 1, (w0, w1, w2)


def _cic_weights(fc):
    i0 = jnp.floor(fc).astype(jnp.int32)
    d = fc - i0.astype(fc.dtype)
    return i0, (1.0 - d, d)


def interpolate(fields, xp, spec, scheme="tsc", origin=None, mask=None):
    """Gather gas values at particle positions.

    fields: ghosted (nc, mx, my, mz); xp: (npar, 3); returns (nc, npar).
    With ``origin``/``mask`` (sharded mode) the gather is in the shard's
    local frame, indices are clipped, and non-owned particles zeroed —
    psum over the mesh then reconstructs every particle's value."""
    fc = _cell_coords(xp, spec, fields.dtype, origin)
    if scheme == "tsc":
        i0, wx = _tsc_weights(fc[:, 0])
        j0, wy = _tsc_weights(fc[:, 1])
        k0, wz = _tsc_weights(fc[:, 2])
    elif scheme == "cic":
        i0, wx = _cic_weights(fc[:, 0])
        j0, wy = _cic_weights(fc[:, 1])
        k0, wz = _cic_weights(fc[:, 2])
    elif scheme == "ngp":
        idx = jnp.rint(fc).astype(jnp.int32)
        return fields[:, idx[:, 0], idx[:, 1], idx[:, 2]]
    else:
        raise ValueError(scheme)
    if mask is not None:
        mx_, my_, mz_ = fields.shape[1:]
        i0 = jnp.clip(i0, 0, mx_ - 3)
        j0 = jnp.clip(j0, 0, my_ - 3)
        k0 = jnp.clip(k0, 0, mz_ - 3)
    out = 0.0
    for a, wa in enumerate(wx):
        for b, wb in enumerate(wy):
            for c, wc in enumerate(wz):
                w = wa * wb * wc
                out = out + w * fields[:, i0 + a, j0 + b, k0 + c]
    if mask is not None:
        out = out * mask[None, :]
    return out


def deposit(values, xp, spec, shape, scheme="tsc", dtype=jnp.float32,
            origin=None, mask=None, mesh_axis_names=None,
            mesh_shape=(1, 1, 1)):
    """Scatter particle values onto the grid (ghosted accumulate + fold).

    values: (npar,) or (nc, npar); returns interior (nc?, nx, ny, nz) with
    the particle quantity *density* (sum of value·weight per cell).
    Sharded mode (origin/mask given): deposit into the local ghosted block
    and ship ghost-zone spill to the owning neighbours (reverse halo)."""
    g = NGHOST
    squeeze = values.ndim == 1
    if squeeze:
        values = values[None]
    if mask is not None:
        values = values * mask[None, :]
    nc = values.shape[0]
    mx, my, mz = shape[0] + 2 * g, shape[1] + 2 * g, shape[2] + 2 * g
    acc = jnp.zeros((nc, mx, my, mz), dtype)
    fc = _cell_coords(xp, spec, dtype, origin)
    if scheme == "tsc":
        i0, wx = _tsc_weights(fc[:, 0])
        j0, wy = _tsc_weights(fc[:, 1])
        k0, wz = _tsc_weights(fc[:, 2])
    elif scheme == "cic":
        i0, wx = _cic_weights(fc[:, 0])
        j0, wy = _cic_weights(fc[:, 1])
        k0, wz = _cic_weights(fc[:, 2])
    else:
        idx = jnp.rint(fc).astype(jnp.int32)
        if mask is not None:
            idx = jnp.clip(idx, 0, jnp.asarray([mx - 1, my - 1, mz - 1]))
        acc = acc.at[:, idx[:, 0], idx[:, 1], idx[:, 2]].add(values)
        out = _fold(acc, spec, mesh_axis_names, mesh_shape)
        return out[0] if squeeze else out
    if mask is not None:
        i0 = jnp.clip(i0, 0, mx - 3)
        j0 = jnp.clip(j0, 0, my - 3)
        k0 = jnp.clip(k0, 0, mz - 3)
    for a, wa in enumerate(wx):
        for b, wb in enumerate(wy):
            for c, wc in enumerate(wz):
                w = wa * wb * wc
                acc = acc.at[:, i0 + a, j0 + b, k0 + c].add(values * w)
    out = _fold(acc, spec, mesh_axis_names, mesh_shape)
    return out[0] if squeeze else out


def _fold(acc, spec, mesh_axis_names, mesh_shape):
    if mesh_axis_names and any(
            n is not None and s > 1
            for n, s in zip(mesh_axis_names, mesh_shape)):
        from ..parallel.halo import fold_ghosts
        return fold_ghosts(acc, spec, mesh_axis_names, mesh_shape)
    return _fold_ghosts(acc, spec)


def _fold_ghosts(acc, spec):
    """Adjoint of the periodic ghost fill: ghost-zone contributions are
    added back to their interior images, then ghosts dropped."""
    g = NGHOST
    for axis in range(3):
        ax = acc.ndim - 3 + axis
        m = acc.shape[ax]
        if not spec.periodic[axis]:
            # non-periodic: clip deposits into the edge cells
            pass
        lo_ghost = jax.lax.slice_in_dim(acc, 0, g, axis=ax)
        hi_ghost = jax.lax.slice_in_dim(acc, m - g, m, axis=ax)
        body = jax.lax.slice_in_dim(acc, g, m - g, axis=ax)
        n = m - 2 * g
        if spec.periodic[axis]:
            # lo ghosts map onto the high end of the interior, hi onto low
            hi_img = jax.lax.slice_in_dim(body, n - g, n, axis=ax) + lo_ghost
            lo_img = jax.lax.slice_in_dim(body, 0, g, axis=ax) + hi_ghost
            body = jax.lax.dynamic_update_slice_in_dim(body, hi_img, n - g, axis=ax)
            body = jax.lax.dynamic_update_slice_in_dim(body, lo_img, 0, axis=ax)
        acc = body
    return acc
