"""WENO5 flux-form transport (reference ``src/weno_transport.f90``:
5th-order weighted-ENO fluxes, gated by ``lweno_transport`` in
src/equ.f90; consumers: density 'rho' continuity, thermal_energy eth).

∂q/∂t = −∇·(u q) with face fluxes reconstructed by WENO5 over a
Lax–Friedrichs splitting whose signal speed is the reference's LOCAL
running max of |u_a| over ±3 cells along the transport axis
(weno_transport.f90:85-88 ``vsig=max(cshift(...))``) — NOT a global max.
The running max is evaluated on the ghosted local block, which under
shard_map reproduces the reference's per-processor cshift semantics
exactly (including its wrap of the outermost face's window into the
opposite ghost zone on the x axis).

Axis quirk faithfully kept: along x the flux at x+1/2 is the x−1/2
reconstruction shifted by one cell, so it uses vsig centered at x+1;
along y/z the reference computes left AND right faces of each cell with
the SAME vsig centered at that cell (weno_transport.f90:115-160), making
the y/z fluxes non-conservative at the last digit — we mirror that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _weno5_plus(f1, f2, f3, f4, f5):
    """Left-biased WENO5 reconstruction (Jiang & Shu 1996; reference
    weno5_1d with WENO_EPS=1e-6, WENO_POW=2, g=(0.1,0.6,0.3))."""
    eps = 1e-6
    b1 = (13.0 / 12.0) * (f1 - 2 * f2 + f3) ** 2 \
        + 0.25 * (f1 - 4 * f2 + 3 * f3) ** 2
    b2 = (13.0 / 12.0) * (f2 - 2 * f3 + f4) ** 2 + 0.25 * (f2 - f4) ** 2
    b3 = (13.0 / 12.0) * (f3 - 2 * f4 + f5) ** 2 \
        + 0.25 * (3 * f3 - 4 * f4 + f5) ** 2
    a1 = 0.1 / (eps + b1) ** 2
    a2 = 0.6 / (eps + b2) ** 2
    a3 = 0.3 / (eps + b3) ** 2
    s = a1 + a2 + a3
    q1 = (2 * f1 - 7 * f2 + 11 * f3) / 6.0
    q2 = (-f2 + 5 * f3 + 2 * f4) / 6.0
    q3 = (2 * f3 + 5 * f4 - f5) / 6.0
    return (a1 * q1 + a2 * q2 + a3 * q3) / s


def _lf_face(qg, uq, vsig, o, nf, ax):
    """LF-split WENO5 flux at the x−1/2 faces of base cells x=o..o+nf−1.

    vsig: the splitting speed slice for those base cells (length nf along
    ax).  Plus part uses cells x−3..x+1, minus part x−2..x+2 (reference
    weno5 slot layout df(i+1,:)=vsig*cshift(tmp,i), i=−3..2)."""
    def sl(arr, off):
        return jax.lax.slice_in_dim(arr, off, off + nf, axis=ax)

    def q(off):
        return jax.lax.slice_in_dim(qg, off, off + nf, axis=ax)

    fp = [0.5 * sl(uq, o + i) + 0.5 * vsig * q(o + i)
          for i in (-3, -2, -1, 0, 1)]
    fm = [0.5 * sl(uq, o + i) - 0.5 * vsig * q(o + i)
          for i in (2, 1, 0, -1, -2)]
    return _weno5_plus(*fp) + _weno5_plus(*fm)


def weno5_div_flux(qg, ug, axis, inv_d, g=3):
    """−∂_a(u_a q) on the interior along one axis.

    qg, ug: ghosted scalar and velocity component (full mx|my|mz extent
    along ``axis``, other axes unchanged); returns the interior-along-axis
    contribution with the reference's sign convention (df −= transpeth)."""
    ax = qg.ndim - 3 + axis
    m = qg.shape[ax]
    n = m - 2 * g
    o = g

    # vsig(x) = max |u| over x−3..x+3 — jnp.roll matches the reference's
    # circular cshift on the local (ghosted) array
    au = jnp.abs(ug)
    vs_full = au
    for s in (-3, -2, -1, 1, 2, 3):
        vs_full = jnp.maximum(vs_full, jnp.roll(au, -s, axis=ax))
    uq = qg * ug

    if axis == 0:
        # x style: evaluate F(x−1/2) for x=o..o+n, vsig centered at base x
        nf = n + 1
        vs = jax.lax.slice_in_dim(vs_full, o, o + nf, axis=ax)
        fl = _lf_face(qg, uq, vs, o, nf, ax)
        lo = jax.lax.slice_in_dim(fl, 0, n, axis=ax)
        hi = jax.lax.slice_in_dim(fl, 1, n + 1, axis=ax)
    else:
        # y/z style: both faces of cell x use vsig centered at x
        vs = jax.lax.slice_in_dim(vs_full, o, o + n, axis=ax)
        lo = _lf_face(qg, uq, vs, o, n, ax)          # F(x−1/2)
        hi = _lf_face(qg, uq, vs, o + 1, n, ax)      # F(x+1/2), same vsig
    return -(hi - lo) * inv_d
