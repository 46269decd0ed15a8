"""Self-gravity (reference ``src/selfgravity.f90``: ``calc_selfpotential``
called at src/equ.f90:178 → Poisson solve → gradient force in the mn-loop).

∇²φ = 4πG(ρ − <ρ>)   (the mean is subtracted — Jeans swindle — exactly as
the periodic Poisson solve requires), force −∇φ added to duu/dt.  The
potential is a communicated auxiliary so its gradient uses the standard
ghosted stencils."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp

from ..ops.poisson import inverse_laplacian_sharded
from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class SelfGravity(ModuleBase):
    name: ClassVar[str] = "selfgravity"

    gravitational_const: float = 1.0   # G in code units (rhs_poisson_const/4π)

    def register(self, reg):
        reg.register("gpotself", 1, "comm_aux")

    def compute_aux(self, pen, halo1):
        rho = pen.rho()
        # GLOBAL mean over the mesh (Jeans swindle): a local jnp.mean inside
        # shard_map would subtract per-shard means and decouple the shards.
        mean = jnp.mean(rho)
        names = pen.mesh_axis_names or (None, None, None)
        for n in names:
            if n is not None:
                mean = jax.lax.pmean(mean, n)
        src = 4.0 * jnp.pi * self.gravitational_const * (rho - mean)
        phi = inverse_laplacian_sharded(src, pen.cfg.grid, names,
                                        pen.mesh_shape)
        return {"gpotself": phi}

    def rhs(self, pen, df, ts):
        accumulate(df, "uu", -pen.grad("gpotself"))
