"""Dynamical alpha quenching (reference
``src/special/meanfield_alpm.f90``): evolves the magnetic contribution
``alpm`` to the mean-field alpha effect,

    dα_m/dt = −2 η_t k_f² (E·B̄) − 2 η k_f² α_m
              [+ advection, + α_m diffusion]

where E = (α_K + α_m)·B̄ − η_t µ₀ J̄ is the mean EMF (the magnetic module
adds α_m to its alpha when this slot exists — magnetic.py meanfield
closure) and η is the microscopic resistivity.  The decay constant is the
Vishniac-Cho flux / catastrophic-quenching closure with Rm = η_t/η.
Sample: samples/2d-tests/dynamical_alpha (reference.out golden)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("meanfield_alpm")
@dataclass(frozen=True)
class MeanfieldAlpm(Special):
    name: ClassVar[str] = "meanfield_alpm"

    kf_alpm: float = 1.0
    initalpm: str = "zero"
    amplalpm: float = 0.0
    ladvect_alpm: bool = False
    alpmdiff: float = 0.0
    # VC_Omega flux divergence is only active with lflux_from_Omega
    # (meanfield_alpm.f90:162 warns but does not enable it otherwise)
    lflux_from_omega: bool = False
    vc_omega_profile: str = "nothing"
    vc_omega_ampl: float = 0.0

    def register(self, reg):
        reg.register("alpm", 1, "pde")

    def init_fields(self, grid, spec, eos, key, cfg=None):
        # 'constant'/'zero' initial α_m
        val = self.amplalpm if self.initalpm == "constant" else 0.0
        return {"alpm": jnp.full(spec.shape, val, grid.z.dtype)}

    def rhs(self, pen, df, ts):
        mag = pen.cfg.module("magnetic")
        if mag is None:
            return
        alpm = pen.field("alpm")
        bb = pen.bb()
        alpha = mag.meanfield_alpha + alpm
        # EMF in the reference's default resistive gauge: η_t∇²A (NOT
        # −η_t µ0 J — meanfield.f90:1276-1279; the gauge term changes E·B)
        emf = alpha * bb + mag.meanfield_etat * pen.del2a()
        edotb = jnp.sum(emf * bb, axis=0)
        kf2 = self.kf_alpm ** 2
        out = (-2.0 * mag.meanfield_etat * kf2 * edotb
               - 2.0 * mag.eta * kf2 * alpm)
        if self.ladvect_alpm and "uu" in pen.reg.slots:
            out = out - pen.ugrad("alpm") - alpm * pen.divu()
        if self.alpmdiff != 0.0:
            out = out + self.alpmdiff * pen.del2s("alpm")
            ts.diffus(self.alpmdiff)
        if self.lflux_from_omega and self.vc_omega_ampl != 0.0:
            out = out - mag.meanfield_etat * self._divflux(pen)
        accumulate(df, "alpm", out)

    def _divflux(self, pen):
        """Vishniac-Cho flux divergence (meanfield_alpm.f90:558-592)."""
        if self.vc_omega_profile == "nothing":
            return 0.0
        bb = pen.bb()
        bij = pen.bij()
        g = pen.grid
        S = self.vc_omega_ampl
        if self.vc_omega_profile == "(0,Sx,0)":
            return S * (bb[0] * bij[0, 2] - bb[1] * bij[1, 2])
        if self.vc_omega_profile == "(0,cosx*cosz,0)":
            sx, cx = jnp.sin(g.xg), jnp.cos(g.xg)
            sz, cz = jnp.sin(g.zg), jnp.cos(g.zg)
            return S * (
                (bb[1] * bij[1, 0] - bb[2] * bij[2, 0]
                 + 0.5 * bb[2] * bij[0, 2] + 0.5 * bb[0] * bij[2, 2])
                * cx * sz
                - (bb[1] * bij[1, 2] - bb[0] * bij[0, 2]
                   + 0.5 * bb[2] * bij[0, 0] + 0.5 * bb[0] * bij[2, 0])
                * sx * cz
                + (bb[0] ** 2 - bb[2] ** 2) * sx * sz)
        raise NotImplementedError(self.vc_omega_profile)
