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
    # contribution selection (selfgravity.f90:38 namelist defaults);
    # particle density enters whenever PARTICLES_SELFGRAVITY is compiled
    # (particles_calc_selfpotential, selfgravity.f90:404)
    lselfgravity_gas: bool = True
    lselfgravity_dust: bool = False
    lparticles_selfgravity: bool = False
    # epicyclic frequency for the Toomre-Q diagnostic (selfgravity.f90:36,
    # :223 default Omega)
    kappa: float = 0.0

    def register(self, reg):
        reg.register("gpotself", 1, "comm_aux")

    def compute_aux(self, pen, halo1):
        rho = 0.0
        if self.lselfgravity_gas:
            rho = rho + pen.rho()
        if self.lselfgravity_dust:
            dmod = pen.cfg.module("dust")
            if dmod is not None and "nd" in pen.reg.slots:
                # fluid-dust mass density ρ_d = n_d·m_d
                rho = rho + pen.field("nd") * getattr(dmod, "md", 1.0)
            elif dmod is not None and "lnnd" in pen.reg.slots:
                rho = rho + jnp.exp(pen.field("lnnd")) \
                    * getattr(dmod, "md", 1.0)
        if self.lparticles_selfgravity:
            pstate = pen._cache.get("_pstate")
            pmod = pen.cfg.module("particles")
            if pstate is not None and pmod is not None:
                # particle mass density joins the Poisson source
                # (particles_selfgravity.f90 calc_selfpotential_particles;
                # unsharded deposit — replicated-particle mode)
                rho = rho + pmod.rhop(pstate, pen, pen.cfg.grid)
        if isinstance(rho, float):
            rho = jnp.zeros(pen.cfg.grid.shape, pen.fg.dtype)
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
        if self.lselfgravity_gas and "uu" in pen.reg.slots:
            accumulate(df, "uu", -pen.grad("gpotself"))
        if self.lselfgravity_dust and "uud" in pen.reg.slots:
            accumulate(df, "uud", -pen.grad("gpotself"))
