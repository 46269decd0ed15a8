"""Static numerically-differenced gravity (reference
``src/special/set_gravity.f90``): a fixed acceleration field

    g = −∇Φ,   Φ = −1/r_cyl + (cs₀²/σ_z)·(z − 1)²

is evaluated once from the 6th-order finite-difference gradient of the
analytic potential (initialize_special, set_gravity.f90:22-55) and added
to du/dt every step (special_calc_hydro, :80).  In spherical coordinates
r_cyl = r·sinθ, z = r·cosθ and the (r, θ) gradient components act; in
cylindrical coordinates the (r, z) components.  Used by the
2d-tests/spherical_viscous_ring sample with the viscous_ring IC."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ...ops import stencil as st
from ..base import accumulate
from . import Special, register_special


@register_special("set_gravity")
@dataclass(frozen=True)
class SetGravity(Special):
    name: ClassVar[str] = "set_gravity"

    sigmaz: float = 0.3

    def _gravity(self, pen):
        g = pen.grid
        coords = pen.cfg.grid.coords if pen.cfg is not None else "cartesian"
        # ghosted analytic potential (the reference evaluates Φ on the
        # full mx×my×mz block, so the stencil sees analytic ghost values)
        x = g.x[:, None, None]
        y = g.y[None, :, None]
        z = g.z[None, None, :]
        cs20 = pen.eos.cs20 if pen.eos is not None else 1.0
        if coords == "spherical":
            r_cyl = x * jnp.sin(y)
            z_mn = x * jnp.cos(y)
        else:   # cylindrical (the module supports only curvilinear boxes)
            r_cyl = x + 0.0 * y + 0.0 * z
            z_mn = z + 0.0 * x + 0.0 * y
        pot = -1.0 / r_cyl + cs20 / self.sigmaz * (z_mn - 1.0) ** 2
        pot = jnp.broadcast_to(pot, (g.x.size, g.y.size, g.z.size))
        gx = -st.i(st.der(pot, 0), axes=(1, 2)) * g.dx1
        zero = jnp.zeros_like(gx)
        if coords == "spherical":
            # (1/r)·∂Φ/∂θ
            gy = -st.i(st.der(pot, 1), axes=(0, 2)) * g.dy1 / g.xg
            return jnp.stack([gx, gy, zero])
        gz = -st.i(st.der(pot, 2), axes=(0, 1)) * g.dz1
        return jnp.stack([gx, zero, gz])

    def rhs(self, pen, df, ts):
        if "uu" not in pen.reg.slots:
            return
        accumulate(df, "uu", self._gravity(pen))
