"""WENO5 flux-form transport (reference ``src/weno_transport.f90``:
5th-order weighted-ENO fluxes for dust/chemistry advection, gated by
``lweno_transport`` in src/equ.f90:145).

∂q/∂t = −∇·(u q) with component fluxes F_a = u_a q reconstructed at faces
by WENO5 with local Lax–Friedrichs splitting.  Fits exactly in the 3-ghost
stencil (3 upwind cells per side)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .stencil import NGHOST


def _weno5_plus(f1, f2, f3, f4, f5):
    """Left-biased WENO5 reconstruction at the i+1/2 face."""
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


def weno5_div_flux(qg, ug, axis, inv_d):
    """−∂_a(u_a q) on the interior along one axis.

    qg, ug: ghosted scalar and velocity component (mx|my|mz along axis);
    returns the interior-along-axis contribution (other axes unchanged)."""
    ax = qg.ndim - 3 + axis
    m = qg.shape[ax]
    n = m - 2 * NGHOST

    def sl(arr, off, ln):
        return jax.lax.slice_in_dim(arr, off, off + ln, axis=ax)

    flux = qg * ug
    alpha = jnp.max(jnp.abs(ug))  # global LF splitting speed
    fp = 0.5 * (flux + alpha * qg)   # right-going
    fm = 0.5 * (flux - alpha * qg)   # left-going
    # face i+1/2 for interior cells i = g..g+n-1 needs faces g-1/2..g+n-1/2
    nf = n + 1
    o = NGHOST - 1  # leftmost face center index base
    fhat_p = _weno5_plus(sl(fp, o - 2, nf), sl(fp, o - 1, nf), sl(fp, o, nf),
                         sl(fp, o + 1, nf), sl(fp, o + 2, nf))
    # right-biased for the left-going part: mirror the stencil
    fhat_m = _weno5_plus(sl(fm, o + 3, nf), sl(fm, o + 2, nf),
                         sl(fm, o + 1, nf), sl(fm, o, nf), sl(fm, o - 1, nf))
    fhat = fhat_p + fhat_m                       # faces at i−1/2 .. i+n−1/2
    lo = jax.lax.slice_in_dim(fhat, 0, n, axis=ax)
    hi = jax.lax.slice_in_dim(fhat, 1, n + 1, axis=ax)
    return -(hi - lo) * inv_d
