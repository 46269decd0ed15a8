"""Boundary conditions on ghost zones.

TPU-native analog of reference ``src/boundcond.f90`` (``boundconds_x/y/z``
dispatch at :735-861/:1085/:1283).  The reference has 476 BC case labels; we
implement the core set used by the acceptance samples as an extensible
registry keyed by the same mnemonics:

  'p'    periodic (realized by the halo exchange itself)
  's'    symmetric about the boundary plane (zero normal derivative)
  'a'    antisymmetric (value pinned to zero on the boundary)
  'a2'   antisymmetric about the boundary *value*
  'set'  Dirichlet: boundary pinned to val, ghosts antisymmetric about it
  'der'  fixed normal derivative = val
  'out'  zero-order extrapolation (outflow)
  'cT'   constant temperature (entropy ghosts tied to density via the EOS;
         reference bc_ss_temp_z)
  'c1'   constant heat flux through the boundary (reference bc_ss_flux)

Each code maps to ``fn(fgc, axis, side, val, ctx) -> fgc`` acting on one
component's ghosted array (mx, my, mz).  Cross-field conditions read other
components through ``ctx.fg`` (the partially-filled stack), which is why the
stacking order fills density before entropy.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from .stencil import NGHOST


@dataclass(frozen=True)
class BC:
    """Per-component boundary condition on one axis: ``low:high`` mnemonics
    (config syntax 'a2:cT' splits exactly like the reference namelists)."""

    comp: str
    low: str
    high: str
    lval: float = 0.0
    hval: float = 0.0

    @staticmethod
    def parse(comp: str, code: str, lval: float = 0.0, hval: float = 0.0) -> "BC":
        if ":" in code:
            lo, hi = code.split(":")
        else:
            lo = hi = code
        return BC(comp, lo, hi, lval, hval)


class BCContext:
    """Everything a BC formula may need (read-only)."""

    def __init__(self, fg, reg, grid, cfg, eos=None):
        self.fg = fg
        self.reg = reg
        self.grid = grid
        self.cfg = cfg
        self.eos = eos  # EosConstants or None


def _plane_idx(m: int, side: int, j: int) -> tuple:
    """(ghost_index, mirror_index, boundary_index) for ghost layer j=1..3."""
    g = NGHOST
    if side == 0:
        return g - j, g + j, g
    return m - g - 1 + j, m - g - 1 - j, m - g - 1


def _ax(fgc, axis):
    return fgc.ndim - 3 + axis


def _take(fgc, axis, idx):
    return jax.lax.slice_in_dim(fgc, idx, idx + 1, axis=_ax(fgc, axis))


def _put(fgc, axis, idx, plane):
    return jax.lax.dynamic_update_slice_in_dim(fgc, plane, idx, axis=_ax(fgc, axis))


def _spacing(ctx, axis):
    """Boundary-adjacent grid spacing (scalar from the metric vectors)."""
    d1 = (ctx.grid.dx_1, ctx.grid.dy_1, ctx.grid.dz_1)[axis]
    return 1.0 / d1[NGHOST]


def bc_sym(fgc, axis, side, val, ctx, sign=1.0, about_value=False):
    m = fgc.shape[_ax(fgc, axis)]
    for j in (1, 2, 3):
        gi, mi, bi = _plane_idx(m, side, j)
        mirror = _take(fgc, axis, mi)
        if about_value:
            plane = 2.0 * _take(fgc, axis, bi) - mirror
        else:
            plane = sign * mirror
        fgc = _put(fgc, axis, gi, plane)
    return fgc


def bc_set(fgc, axis, side, val, ctx):
    m = fgc.shape[_ax(fgc, axis)]
    _, _, bi = _plane_idx(m, side, 1)
    bnd = jnp.full_like(_take(fgc, axis, bi), val)
    fgc = _put(fgc, axis, bi, bnd)
    for j in (1, 2, 3):
        gi, mi, _ = _plane_idx(m, side, j)
        fgc = _put(fgc, axis, gi, 2.0 * val - _take(fgc, axis, mi))
    return fgc


def bc_der(fgc, axis, side, val, ctx):
    m = fgc.shape[_ax(fgc, axis)]
    d = _spacing(ctx, axis)
    sgn = -1.0 if side == 0 else 1.0
    for j in (1, 2, 3):
        gi, mi, _ = _plane_idx(m, side, j)
        fgc = _put(fgc, axis, gi, _take(fgc, axis, mi) + sgn * 2.0 * j * d * val)
    return fgc


def bc_out(fgc, axis, side, val, ctx):
    m = fgc.shape[_ax(fgc, axis)]
    _, _, bi = _plane_idx(m, side, 1)
    bnd = _take(fgc, axis, bi)
    for j in (1, 2, 3):
        gi, _, _ = _plane_idx(m, side, j)
        fgc = _put(fgc, axis, gi, bnd)
    return fgc


def _lnrho_comp(ctx):
    return ctx.fg[ctx.reg.comp_index("lnrho")]


def bc_ss_temp(fgc, axis, side, val, ctx):
    """'cT': constant temperature.  With the ideal-gas EOS
    (cs² = cs₀²·exp(γ s/cp + (γ−1)(lnρ−lnρ₀)), reference
    src/eos_idealgas.f90), T = const on the boundary plane and ghosts means
    γ s/cp + (γ−1) lnρ is held at its boundary value there.
    ``val`` > 0 is interpreted as the target cs² (cs2top/cs2bot); val == 0
    pins T to its instantaneous boundary-plane value."""
    eos = ctx.eos
    lnrho = _lnrho_comp(ctx)
    m = fgc.shape[_ax(fgc, axis)]
    _, _, bi = _plane_idx(m, side, 1)
    g1 = (eos.gamma - 1.0) / eos.gamma
    if val > 0.0:
        # ss on any plane with lnrho there such that cs2 == val
        def ss_of(lnr):
            return eos.cp * (jnp.log(val / eos.cs20) / eos.gamma
                             - g1 * (lnr - eos.lnrho0))
        fgc = _put(fgc, axis, bi, ss_of(_take(lnrho, axis, bi)))
        for j in (1, 2, 3):
            gi, _, _ = _plane_idx(m, side, j)
            fgc = _put(fgc, axis, gi, ss_of(_take(lnrho, axis, gi)))
    else:
        ss_b = _take(fgc, axis, bi)
        lnrho_b = _take(lnrho, axis, bi)
        for j in (1, 2, 3):
            gi, _, _ = _plane_idx(m, side, j)
            dlnrho = _take(lnrho, axis, gi) - lnrho_b
            fgc = _put(fgc, axis, gi, ss_b - eos.cp * g1 * dlnrho)
    return fgc


def bc_ss_flux(fgc, axis, side, val, ctx):
    """'c1': constant heat flux F = −K ∇T through the boundary (reference
    bc_ss_flux).  ``val`` = F/K (sign: positive = flux in +axis direction).
    Ghost entropy chosen so the one-sided lnTT gradient matches −(F/K)/T."""
    eos = ctx.eos
    lnrho = _lnrho_comp(ctx)
    m = fgc.shape[_ax(fgc, axis)]
    _, _, bi = _plane_idx(m, side, 1)
    d = _spacing(ctx, axis)
    ss_b = _take(fgc, axis, bi)
    lnrho_b = _take(lnrho, axis, bi)
    # T on the boundary plane
    lnTT_b = eos.lnTT0 + eos.gamma / eos.cp * ss_b + (eos.gamma - 1.0) * (lnrho_b - eos.lnrho0)
    TT_b = jnp.exp(lnTT_b)
    dlnTT = -val / TT_b  # d lnTT / dn with n the outward... fixed-axis slope
    sgn = -1.0 if side == 0 else 1.0
    for j in (1, 2, 3):
        gi, mi, _ = _plane_idx(m, side, j)
        # mirror lnTT then impose slope: lnTT[gi] = lnTT[mi] - sgn*2j*d*dlnTT
        ss_m = _take(fgc, axis, mi)
        lnrho_m = _take(lnrho, axis, mi)
        lnTT_m = eos.lnTT0 + eos.gamma / eos.cp * ss_m + (eos.gamma - 1.0) * (lnrho_m - eos.lnrho0)
        lnTT_g = lnTT_m + sgn * 2.0 * j * d * dlnTT
        lnrho_g = _take(lnrho, axis, gi)
        ss_g = eos.cp / eos.gamma * (
            (lnTT_g - eos.lnTT0) - (eos.gamma - 1.0) * (lnrho_g - eos.lnrho0)
        )
        fgc = _put(fgc, axis, gi, ss_g)
    return fgc


BC_REGISTRY: Dict[str, Callable] = {
    "s": lambda f, a, s, v, c: bc_sym(f, a, s, v, c, sign=1.0),
    "a": lambda f, a, s, v, c: bc_sym(f, a, s, v, c, sign=-1.0),
    "a2": lambda f, a, s, v, c: bc_sym(f, a, s, v, c, about_value=True),
    "set": bc_set,
    "der": bc_der,
    "out": bc_out,
    "cT": bc_ss_temp,
    "c1": bc_ss_flux,
}


def register_bc(code: str, fn: Callable):
    BC_REGISTRY[code] = fn


def apply_axis_bcs(fg, axis, bcs, reg, grid, cfg, eos=None,
                   edge_mask=(True, True)):
    """Apply the physical BCs for one non-periodic axis on both faces.

    ``edge_mask`` — (is_low_edge, is_high_edge): python bools or traced
    scalars; under sharding only domain-edge shards keep the BC result.
    """
    ctx = BCContext(fg, reg, grid, cfg, eos)
    for bc in bcs:
        ci = reg.comp_index(bc.comp)
        fgc = fg[ci]
        for side, code, val in ((0, bc.low, bc.lval), (1, bc.high, bc.hval)):
            if code in ("p", "", "none"):
                continue
            fn = BC_REGISTRY.get(code)
            if fn is None:
                raise KeyError(f"unknown BC mnemonic {code!r} (axis {axis})")
            new = fn(fgc, axis, side, val, ctx)
            mask = edge_mask[side]
            if mask is True:
                fgc = new
            elif mask is False:
                pass
            else:
                fgc = jnp.where(mask, new, fgc)
        fg = fg.at[ci].set(fgc)
        ctx.fg = fg
    return fg
