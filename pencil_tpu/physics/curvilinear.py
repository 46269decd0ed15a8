"""Curvilinear-coordinate vector calculus (reference convention,
``src/grid.f90`` / ``src/deriv.f90:141-160``: coordinate factors applied
inline):

  * cylindrical: (x, y, z) = (r, φ, z);  h = (1, r, 1)
  * spherical:   (x, y, z) = (r, θ, φ);  h = (1, r, r·sinθ)

``Pencils.d`` returns *physical* component derivatives (1/h_i)∂_i; the
functions here add the curvature terms that turn those into the true
divergence, curl, Laplacians, and advection.  h_i is constant along its own
axis in both systems, so (1/h_i²)∂_i² is the clean second derivative.

Standard identities used (any vector-calculus reference):
  ∇²f|sph  = Σ (1/h_i²)∂_i²f + (2/r)∂_r f + (cotθ/r²)∂_θ f
  ∇·u|sph  = Σ (1/h_i)∂_i u_i + 2u_r/r + u_θ cotθ/r
  ((u·∇)u)_r|sph = … − (u_θ² + u_φ²)/r, etc.
"""
from __future__ import annotations

import jax.numpy as jnp


def metric(pen):
    """(inv_r, cot_over_r, inv_rsin) broadcastable factors; cartesian→None."""
    coords = pen.cfg.grid.coords
    if coords == "cartesian":
        return None
    g = pen.grid
    r = g.xg
    # r=0 on the cylindrical/spherical axis: the reference zeroes 1/r at
    # the axis point instead of dividing (grid.f90:1582-1583 r1_mn(1)=0)
    inv_r = jnp.where(jnp.abs(r) < 1e-12, 0.0, 1.0 / r)
    if coords == "cylindrical":
        return {"inv_r": inv_r, "cot_r": None, "inv_rsin": None}
    if coords == "spherical":
        th = g.yg
        sin = jnp.sin(th)
        inv_sin = 1.0 / jnp.maximum(jnp.abs(sin), 1e-12) * jnp.sign(
            jnp.where(sin == 0, 1.0, sin))
        return {"inv_r": inv_r, "cot_r": jnp.cos(th) * inv_sin * inv_r,
                "inv_rsin": inv_r * inv_sin}
    raise NotImplementedError(coords)


def del2s_curv(pen, name):
    """Scalar Laplacian with curvature terms."""
    m = metric(pen)
    out = sum(pen.d2(name, a)[0] for a in range(3))
    coords = pen.cfg.grid.coords
    if coords == "cylindrical":
        out = out + m["inv_r"] * pen.d(name, 0)[0]
    else:  # spherical
        out = out + 2.0 * m["inv_r"] * pen.d(name, 0)[0]
        out = out + m["cot_r"] * pen.d(name, 1)[0]
    return out


def divu_curv(pen, uu, uij):
    m = metric(pen)
    out = uij[0, 0] + uij[1, 1] + uij[2, 2]
    coords = pen.cfg.grid.coords
    if coords == "cylindrical":
        return out + uu[0] * m["inv_r"]
    return out + 2.0 * uu[0] * m["inv_r"] + uu[1] * m["cot_r"]


def curl_curv(pen, vv, vij):
    """Curl from physical component derivatives vij[i,j] = (1/h_j)∂_j v_i
    plus curvature terms."""
    m = metric(pen)
    coords = pen.cfg.grid.coords
    if coords == "cylindrical":
        # (r, φ, z)
        cr = vij[2, 1] - vij[1, 2]
        cp = vij[0, 2] - vij[2, 0]
        cz = vij[1, 0] + vv[1] * m["inv_r"] - vij[0, 1]
        return jnp.stack([cr, cp, cz])
    # spherical (r, θ, φ)
    cr = vij[2, 1] + vv[2] * m["cot_r"] - vij[1, 2]
    ct = vij[0, 2] - vij[2, 0] - vv[2] * m["inv_r"]
    cp = vij[1, 0] + vv[1] * m["inv_r"] - vij[0, 1]
    return jnp.stack([cr, ct, cp])


def ugu_curv(pen, uu, uij, uadv=None):
    """(u·∇)u including the curvature (Christoffel) terms.  ``uadv``
    (FARGO residual velocity) drives the directional derivative; the
    curvature terms always use the full uu (hydro.f90:3193-3197)."""
    m = metric(pen)
    ua = uu if uadv is None else uadv
    base = jnp.stack([
        sum(ua[j] * uij[a, j] for j in range(3)) for a in range(3)
    ])
    coords = pen.cfg.grid.coords
    inv_r = m["inv_r"]
    if coords == "cylindrical":
        extra = jnp.stack([
            -uu[1] * uu[1] * inv_r,
            uu[0] * uu[1] * inv_r,
            jnp.zeros_like(uu[0]),
        ])
    else:
        cot_r = m["cot_r"]
        extra = jnp.stack([
            -(uu[1] ** 2 + uu[2] ** 2) * inv_r,
            uu[0] * uu[1] * inv_r - uu[2] ** 2 * cot_r,
            uu[0] * uu[2] * inv_r + uu[1] * uu[2] * cot_r,
        ])
    return base + extra


def del2v_curv(pen, name):
    """Vector Laplacian: componentwise scalar Laplacian + the standard
    curvilinear coupling terms."""
    m = metric(pen)
    coords = pen.cfg.grid.coords
    vv = pen.field(name)
    # componentwise scalar Laplacians
    base = sum(pen.d2(name, a) for a in range(3))
    if coords == "cylindrical":
        base = base + m["inv_r"] * pen.d(name, 0)
    else:
        base = base + 2.0 * m["inv_r"] * pen.d(name, 0) \
            + m["cot_r"] * pen.d(name, 1)
    inv_r = m["inv_r"]
    inv_r2 = inv_r * inv_r
    dv = [pen.d(name, a) for a in range(3)]  # physical derivs (3comp, ...)
    if coords == "cylindrical":
        lr = base[0] - vv[0] * inv_r2 - 2.0 * inv_r * dv[1][1]
        lp = base[1] - vv[1] * inv_r2 + 2.0 * inv_r * dv[1][0]
        lz = base[2]
        return jnp.stack([lr, lp, lz])
    cot_r = m["cot_r"]
    inv_rsin = m["inv_rsin"]
    # standard spherical vector-Laplacian components, with every coordinate
    # derivative expressed through the physical derivatives dv[j][i]:
    #   (∇²u)_r = ∇²u_r − 2u_r/r² − (2/r²)∂_θu_θ − 2cotθ·u_θ/r²
    #             − (2/(r²sinθ))∂_φu_φ
    #   (∇²u)_θ = ∇²u_θ − u_θ/(r²sin²θ) + (2/r²)∂_θu_r
    #             − (2cotθ/(r²sinθ))∂_φu_φ
    #   (∇²u)_φ = ∇²u_φ − u_φ/(r²sin²θ) + (2/(r²sinθ))∂_φu_r
    #             + (2cotθ/(r²sinθ))∂_φu_θ
    lr = (base[0] - 2.0 * vv[0] * inv_r2
          - 2.0 * inv_r * (dv[1][1] + dv[2][2])
          - 2.0 * inv_r * cot_r * vv[1])
    lt = (base[1] - vv[1] * inv_rsin ** 2
          + 2.0 * inv_r * dv[1][0]
          - 2.0 * cot_r * dv[2][2])
    lp = (base[2] - vv[2] * inv_rsin ** 2
          + 2.0 * inv_r * dv[2][0]
          + 2.0 * cot_r * dv[2][1])
    return jnp.stack([lr, lt, lp])


def dline_1_curv(pen):
    """Metric-scaled inverse line elements (for the advective CFL)."""
    m = metric(pen)
    g = pen.grid
    if m is None:
        return (g.dx1, g.dy1, g.dz1)
    coords = pen.cfg.grid.coords
    if coords == "cylindrical":
        return (g.dx1, g.dy1 * m["inv_r"], g.dz1)
    return (g.dx1, g.dy1 * m["inv_r"], g.dz1 * m["inv_rsin"])


def graddiv_curv(pen, name):
    """∇(∇·A) in curvilinear coordinates, expanded into the physical
    first/second derivatives plus metric terms (derivation: apply the
    gradient to the curvilinear divergence term-by-term; all mixed
    derivatives come from the ghosted stack via pen.dij)."""
    m = metric(pen)
    coords = pen.cfg.grid.coords
    inv_r = m["inv_r"]
    inv_r2 = inv_r * inv_r
    A = pen.field(name)
    da = [pen.d(name, a) for a in range(3)]      # da[j][i] = (1/h_j)∂_j A_i
    d2 = [pen.d2(name, a) for a in range(3)]
    dij01 = pen.dij(name, 0, 1)
    dij02 = pen.dij(name, 0, 2)
    dij12 = pen.dij(name, 1, 2)
    if coords == "cylindrical":
        gr = (d2[0][0] + inv_r * da[0][0] - inv_r2 * A[0]
              + dij01[1] - inv_r * da[1][1] + dij02[2])
        gp = (dij01[0] + inv_r * da[1][0] + d2[1][1] + dij12[2])
        gz = (dij02[0] + inv_r * da[2][0] + dij12[1] + d2[2][2])
        return jnp.stack([gr, gp, gz])
    # spherical
    cot_r = m["cot_r"]
    inv_rsin = m["inv_rsin"]
    gr = (d2[0][0] + 2.0 * inv_r * da[0][0] - 2.0 * inv_r2 * A[0]
          + dij01[1] - inv_r * da[1][1]
          + cot_r * da[0][1] - inv_r * cot_r * A[1]
          + dij02[2] - inv_r * da[2][2])
    gt = (dij01[0] + 2.0 * inv_r * da[1][0]
          + d2[1][1] - A[1] * inv_rsin ** 2 + cot_r * da[1][1]
          - cot_r * da[2][2] + dij12[2])
    gp = (dij02[0] + 2.0 * inv_r * da[2][0]
          + dij12[1] + cot_r * da[2][1]
          + d2[2][2])
    return jnp.stack([gr, gt, gp])
