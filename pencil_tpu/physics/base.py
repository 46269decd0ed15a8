"""Physics-module protocol.

The reference declares a uniform per-module interface in ``src/*.h``
(register_X, init_X, calc_pencils_X, dX_dt, ... — SURVEY.md §1 L4).  Here a
module is a frozen dataclass (hashable → static under jit) with optional
hooks; an absent module is simply not composed in (replacing the ~100
``no<module>`` stub files of ``src/Makefile.src:11-138``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Dict

import jax.numpy as jnp


class TimestepAccum:
    """Per-point CFL accumulators (reference advec_*/maxdiffus*,
    ``src/equ.f90:916-931``).  Modules add; the integrator reduces."""

    def __init__(self):
        self.maxadvec = 0.0    # Σ_a |u_a|·dline_1_a  (linear advection terms)
        self.advec_cs2 = 0.0   # (cs² + vA²)·Σ_a Δ_a⁻²  (wave speeds, squared)
        self.maxdiffus = 0.0   # max(ν, η, χ, D) — scaled by dxyz_2 at the end
        self.maxdiffus3 = 0.0  # hyper-diffusivities — scaled by dxyz_6

    def advec(self, val):
        self.maxadvec = self.maxadvec + val

    def advec_mesh(self, val):
        """Mesh-hyperdiffusion stability rate: the Nyquist damping rate of
        the ν₃ᵐ·δ⁶/(60Δ) term is ν₃ᵐ·(64/60)·Σ1/Δ; explicit RK3 tolerates
        dt·rate ≲ 2.5, so it enters dt1 directly as rate/2.5 (independent
        of cdt)."""
        self.maxadvec_mesh = jnp.maximum(
            getattr(self, "maxadvec_mesh", 0.0), val)

    def advec2(self, val):
        """Squared wave-speed CFL term (reference advec_cs2/advec_va2:
        combined as dt1_advec = sqrt(advec_uu² + advec_cs2)/cdt,
        src/equ.f90:916-931)."""
        self.advec_cs2 = self.advec_cs2 + val

    def diffus(self, val):
        self.maxdiffus = jnp.maximum(self.maxdiffus, val)

    def diffus3(self, val):
        self.maxdiffus3 = jnp.maximum(self.maxdiffus3, val)


def accumulate(df: Dict[str, jnp.ndarray], name: str, val: jnp.ndarray):
    if name in df:
        df[name] = df[name] + val
    else:
        df[name] = val


@dataclass(frozen=True)
class ModuleBase:
    """Base with no-op hooks; subclasses override what they provide."""

    name: ClassVar[str] = "base"

    def register(self, reg):
        """Claim f-array slots (reference register_X / farray.f90:99)."""

    def rhs(self, pen, df, ts):
        """Accumulate RHS contributions into df and CFL terms into ts
        (reference dX_dt inside the mn-loop, src/equ.f90:940-1058)."""

    def init_fields(self, grid, spec, eos, key, cfg=None):
        """Initial condition for this module's fields (reference init_X)."""
        return {}

    def after_timestep(self, state, grid, cfg, reg, eos, dt, t, key):
        """Applied once per full step outside the RK substeps (reference
        run.f90:729 addforce and X_after_timestep hooks)."""
        return state
