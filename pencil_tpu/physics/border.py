"""Border quenching (reference ``src/border_profiles.f90`` +
``border_quenching`` at src/timestep.f90:158): drive the evolved fields
toward a reference state in buffer zones near non-periodic boundaries to
absorb outgoing waves."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase


@dataclass(frozen=True)
class BorderProfiles(ModuleBase):
    name: ClassVar[str] = "border"

    border_frac_z: float = 0.1   # fraction of the z extent per side
    tborder: float = 0.1         # relaxation timescale
    fields: Tuple[str, ...] = ("uu",)

    def rhs(self, pen, df, ts):
        from .base import accumulate
        gs = pen.cfg.grid
        if gs.periodic[2] or self.border_frac_z <= 0:
            return
        z = pen.grid.zg
        zbot, ztop = gs.z0, gs.z0 + gs.Lz
        w = self.border_frac_z * gs.Lz
        prof = (jnp.exp(-((z - zbot) / w) ** 2)
                + jnp.exp(-((z - ztop) / w) ** 2))
        rate = prof / self.tborder
        for name in self.fields:
            if name not in pen.reg.slots:
                continue
            val = pen.field(name)
            accumulate(df, name, -rate * val)
