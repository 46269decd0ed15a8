"""Multi-species drag-equilibrium deviation diagnostics (reference
``src/special/multisp_drag_eq.f90``): stores the NSH equilibrium
velocities of the gas (ux0, uy0) and each particle species (vpx0, vpy0)
computed at initialization (initialize_special :70-100 calls
dragforce_equi_multispecies) and reports mean-square DEVIATIONS from
them — ρ·(u−u₀)² moments on the gas side (dspecial_dt :151-175) and
ρp_swarm·(vp−vp₀)² moments on the particle side
(special_calc_particles :193-237).

The module has no RHS — it is diagnostics-only; the equilibria are
injected by the run-dir loader (which performs the same linear solve,
physics/initial_condition.nsh_multispecies)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

from ..base import ModuleBase
from . import register_special


@register_special("multisp_drag_eq")
@dataclass(frozen=True)
class MultispDragEq(ModuleBase):
    name: ClassVar[str] = "multisp_drag_eq"

    ux0: float = 0.0
    uy0: float = 0.0
    eps_dtog: float = 0.0
