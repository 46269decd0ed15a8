"""Incompressible (Boussinesq) hydrodynamics via the projection method
(reference ``src/experimental/boussinesq.f90`` — the DENSITY slot variant
with ``lboussinesq=T``: no density evolution, ρ ≡ ρ₀, and a pressure-like
potential ``pp`` kept as a communicated auxiliary).

Scheme (reference ``run.f90:719`` calls ``boussinesq(f)`` once per full
timestep, AFTER the RK substeps):

    1. RK substeps advance u with buoyancy Ra·Pr·T ẑ (hydro.f90:3848),
       ν∇²u ('simplified' viscosity — the only ivisc Boussinesq permits,
       viscosity.f90:668), and dT/dt gains the background-gradient term
       −β·u_z (temperature_idealgas.f90:1412) — but NO pressure gradient
       (lpressuregradient_gas=F when ldensity=F, hydro.f90:915).
    2. Projection: solve ∇²φ = ∇·u (boussinesq.f90:354-436), then
       u ← u − ∇φ, leaving u divergence-free.  Periodic box → spectral
       inverse; non-periodic z → ``inverse_laplacian_z`` (4th-order
       pentadiagonal per (kx,ky) mode, Neumann closure).

The potential is stored in the ``pp`` slot so its gradient uses the
standard ghosted stencils and its boundary conditions come from the run
dir's bcz entry (e.g. 's' in samples/2d-tests/boussinesq_convection)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp

from ..ops.poisson import inverse_laplacian, inverse_laplacian_z
from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Boussinesq(ModuleBase):
    name: ClassVar[str] = "boussinesq"

    Ra: float = 0.0          # Rayleigh number (hydro_run_pars, hydro.f90:245)
    Pr: float = 0.0          # Prandtl number (buoyancy scaled by Ra·Pr)
    beta_bouss: float = -1.0  # background dT/dz (entropy_run_pars)

    def register(self, reg):
        # farray_register_auxiliary('pp', communicated=.true.)
        # (boussinesq.f90:64)
        reg.register("pp", 1, "comm_aux")

    def init_fields(self, grid, spec, eos, key, cfg=None):
        # init_lnrho: f(:,:,:,ipp)=1 (boussinesq.f90:114)
        return {"pp": jnp.ones(spec.shape, grid.z.dtype)}

    def rhs(self, pen, df, ts):
        if "uu" not in pen.reg.slots:
            return
        uu = pen.uu()
        if "TT" in pen.reg.slots:
            # buoyancy: duz/dt += Ra·Pr·T (hydro.f90:3848, Cartesian) —
            # gravity antiparallel to the background gradient direction
            if self.Ra != 0.0:
                TT = pen.field("TT")
                zero = jnp.zeros_like(TT)
                accumulate(df, "uu", jnp.stack(
                    [zero, zero, self.Ra * self.Pr * TT]))
            # −u·∇T₀ background-gradient advection
            # (temperature_idealgas.f90:1412)
            accumulate(df, "TT", -self.beta_bouss * uu[2])

    # ------------------------------------------------------------------
    def project(self, fa, model, grid, mesh_axis_names=None,
                mesh_shape=(1, 1, 1)):
        """u ← u − ∇φ with ∇²φ = ∇·u (boussinesq.f90:354-436: div into
        the pp slot, Poisson solve, ghost refresh, gradient correction).
        Called by the model once per full step, after the RK substeps and
        the boundary write-back."""
        from ..parallel.halo import fill_ghosts
        from .pencils import Pencils
        cfg, reg = model.cfg, model.reg
        names = mesh_axis_names or (None, None, None)

        fg = fill_ghosts(fa[: reg.ncom], cfg.grid, model.bc_axes, reg,
                         grid, cfg, model.eos, mesh_axis_names, mesh_shape)
        pen = Pencils(fg, grid, reg, cfg, model.eos,
                      mesh_axis_names, mesh_shape)
        src = pen.divu()

        # global solve: gather sharded axes (the reference's transp-based
        # parallel FFT is global by construction, poisson.f90:85)
        full = src
        for axis in range(3):
            if names[axis] is not None and mesh_shape[axis] > 1:
                full = jax.lax.all_gather(full, names[axis], axis=axis,
                                          tiled=True)
        if cfg.grid.periodic[2]:
            phi = inverse_laplacian(full, cfg.grid)
        else:
            phi = inverse_laplacian_z(full, cfg.grid, cfg.grid.dz)
        for axis in range(3):
            if names[axis] is not None and mesh_shape[axis] > 1:
                n_loc = phi.shape[axis] // mesh_shape[axis]
                idx = jax.lax.axis_index(names[axis])
                phi = jax.lax.dynamic_slice_in_dim(phi, idx * n_loc, n_loc,
                                                   axis=axis)

        fa = fa.at[reg.slice("pp")].set(phi[None])
        # refresh pp ghosts with its own BCs, then correct the velocity
        fg2 = fill_ghosts(fa[: reg.ncom], cfg.grid, model.bc_axes, reg,
                          grid, cfg, model.eos, mesh_axis_names, mesh_shape)
        pen2 = Pencils(fg2, grid, reg, cfg, model.eos,
                       mesh_axis_names, mesh_shape)
        return fa.at[reg.slice("uu")].add(-pen2.grad("pp"))


@dataclass(frozen=True)
class DensityAnelastic(ModuleBase):
    """Anelastic density slot (reference
    ``src/experimental/anelastic.f90`` / obsolete density_anelastic):
    lnrho is a static auxiliary diagnosed at start — the continuity
    equation is replaced by the solenoidal projection (shared with
    Boussinesq, anelastic.f90 pressure Poisson solve).  Inits ported:
    '-ln(1+u2/2cs02)' (:344) and 'anelastic' base state
    ρ_b = ρ0·exp(γ g z/cs²) (:349)."""
    name: ClassVar[str] = "density_anelastic"

    init: str = ""
    gravz: float = 0.0

    def register(self, reg):
        reg.register("lnrho", 1, "comm_aux")

    def init_fields(self, grid, spec, eos, key, cfg=None, fields=None):
        zero = jnp.zeros(spec.shape, grid.z.dtype)
        if self.init == "-ln(1+u2/2cs02)":
            uu = (fields or {}).get("uu")
            u2 = sum(uu[a] ** 2 for a in range(3)) if uu is not None \
                else zero
            return {"lnrho": -jnp.log(1.0 + u2 / (2.0 * eos.cs20)) + zero}
        if self.init == "anelastic":
            return {"lnrho": (jnp.log(eos.rho0) + eos.gamma * self.gravz
                              * grid.zg / eos.cs20) + zero}
        return {"lnrho": zero}
