"""Piecewise-polytropic hydrostatic stratification (reference
``initlnrho='piecew-poly'`` / ``initss='piecew-poly'`` in src/density.f90 /
src/entropy.f90 — the conv-slab convection-zone setup).

Three layers in z under constant gravity g = gravz ẑ (gravz < 0):
    [z0, z1]  stable underlayer, polytropic index mpoly1
    [z1, z2]  convectively unstable bulk, index mpoly0
    [z2, ztop] upper layer, index mpoly2 (isothermal if isothtop)
Within a polytropic layer cs² is linear in z with slope
    dcs²/dz = γ·gravz/(mpoly+1)
and ρ ∝ (cs²)^mpoly; an isothermal layer has cs² = const and
dlnρ/dz = γ·gravz/cs².  Profiles are anchored at the top: cs²(ztop) = cs20.
Entropy then follows from the ideal-gas EOS inversion.  Layer interfaces
are smoothed over ``width`` with a smooth step.
"""
from __future__ import annotations

import jax.numpy as jnp


def _sstep(z, z0, w):
    """Smooth step 0→1 at z0 over width w."""
    if w <= 0:
        return jnp.where(z > z0, 1.0, 0.0)
    return 0.5 * (1.0 + jnp.tanh((z - z0) / w))


def piecew_poly_profiles(z, spec, eos, gravz, z1, z2, mpoly0=1.0, mpoly1=3.0,
                         mpoly2=0.0, isothtop=1, width=0.05):
    """Returns (lnrho(z), ss(z)) 1-D profiles on the given z points."""
    gamma = eos.gamma
    cs20 = eos.cs20
    ztop = spec.z0 + spec.Lz

    def layer_down(cs2_top, lnrho_top, z_top, zpts, mpoly, isoth):
        """cs2, lnrho at zpts integrating downward from the layer top."""
        if isoth:
            cs2 = cs2_top * jnp.ones_like(zpts)
            lnrho = lnrho_top + gamma * gravz * (zpts - z_top) / cs2_top
        else:
            beta = gamma * gravz / (mpoly + 1.0)
            cs2 = cs2_top + beta * (zpts - z_top)
            cs2 = jnp.maximum(cs2, 1e-12)
            lnrho = lnrho_top + mpoly * jnp.log(cs2 / cs2_top)
        return cs2, lnrho

    # evaluate each layer's profile over ALL z, then blend with smooth steps
    # top layer anchored at ztop with cs2 = cs20, lnrho = lnrho0
    cs2_t, lnrho_t = layer_down(cs20, eos.lnrho0, ztop, z, mpoly2,
                                bool(isothtop))
    # interface values at z2 from the top layer
    cs2_z2, lnrho_z2 = layer_down(cs20, eos.lnrho0, ztop,
                                  jnp.asarray([z2]), mpoly2, bool(isothtop))
    cs2_m, lnrho_m = layer_down(cs2_z2[0], lnrho_z2[0], z2, z, mpoly0, False)
    cs2_z1, lnrho_z1 = layer_down(cs2_z2[0], lnrho_z2[0], z2,
                                  jnp.asarray([z1]), mpoly0, False)
    cs2_b, lnrho_b = layer_down(cs2_z1[0], lnrho_z1[0], z1, z, mpoly1, False)

    s_lo = _sstep(z, z1, width)   # 0 below z1, 1 above
    s_hi = _sstep(z, z2, width)   # 0 below z2, 1 above
    cs2 = cs2_b * (1 - s_lo) + cs2_m * s_lo * (1 - s_hi) + cs2_t * s_hi
    lnrho = (lnrho_b * (1 - s_lo) + lnrho_m * s_lo * (1 - s_hi)
             + lnrho_t * s_hi)
    # entropy from the EOS inversion
    g1 = (gamma - 1.0) / gamma
    ss = eos.cp * (jnp.log(cs2 / cs20) / gamma - g1 * (lnrho - eos.lnrho0))
    return lnrho, ss


def hcond_profile(z, z1, z2, mpoly0, mpoly1, mpoly2, hcond0, width=0.05):
    """K(z) piecewise-constant per layer with ratios (m_i+1)/(m0+1)
    (reference entropy.f90 'K-profile': flux continuity across polytropes
    requires K ∝ (m+1))."""
    k_bot = hcond0 * (mpoly1 + 1.0) / (mpoly0 + 1.0)
    k_mid = hcond0
    k_top = hcond0 * (mpoly2 + 1.0) / (mpoly0 + 1.0)
    s_lo = _sstep(z, z1, width)
    s_hi = _sstep(z, z2, width)
    return k_bot * (1 - s_lo) + k_mid * s_lo * (1 - s_hi) + k_top * s_hi
