"""Pressure-bump special (reference ``src/special/pressure_bump.f90``):
superimposes an x-dependent pressure-gradient profile on the global
sub-Keplerian β_glnrho force in a shearing box, to seed dust trapping.

Profile (f90:80-100 pb_special_setup):
    'gauss-x'  : pb(x) = −A·exp(−x²/(Lx/2)²)
    'sinwave-x': pb(x) = −A·sin(2π x/Lx)
(the reference's Ω/cs0 rescaling line sits in the ``case default`` branch
of its select-case, so the shipped profiles are used UNSCALED — behavior,
not intent, is what we match).

Init (f90:139-158): uy += 1/(2Ω)·cs0²·β_scaled_x·pb(x), with
β_scaled_j = β_glnrho_global_j·Ω/cs0 (noentropy.f90:124).
RHS (f90:228-247 dspecial_dt): du_j/dt −= cs²·β_scaled_j·pb(x) for every
axis with β_glnrho_global_j ≠ 0.  Sample: samples/2d-tests/pressure_bump.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("pressure_bump")
@dataclass(frozen=True)
class PressureBump(Special):
    name: ClassVar[str] = "pressure_bump"

    pb_type: str = "none"
    pb_amplitude: float = 1.0

    def _profile(self, grid, Lx):
        x = grid.xg  # broadcastable (nx,1,1) interior coordinate
        if self.pb_type == "gauss-x":
            return -self.pb_amplitude * jnp.exp(-x ** 2 / (Lx / 2.0) ** 2)
        if self.pb_type == "sinwave-x":
            return -self.pb_amplitude * jnp.sin(2.0 * jnp.pi / Lx * x)
        if self.pb_type == "none":
            return None
        raise NotImplementedError(f"pb_type {self.pb_type!r}")

    def _beta_scaled(self, cfg, eos):
        hyd = cfg.module("hydro")
        if hyd is None:
            return None, 0.0
        beta = tuple(getattr(hyd, "beta_glnrho_global", (0.0, 0.0, 0.0)))
        om = getattr(hyd, "Omega", 0.0) or getattr(
            hyd, "Omega_pressure", 0.0)
        cs0 = getattr(eos, "cs0", 1.0)
        return tuple(b * om / cs0 for b in beta), om

    def init_fields(self, grid, spec, eos, key, cfg=None):
        """uy shift added on top of whatever inituu produced
        (pressure_bump.f90:139-158 init_special)."""
        if cfg is None:
            return {}
        pb = self._profile(grid, float(cfg.grid.Lx))
        if pb is None:
            return {}
        bsc, om = self._beta_scaled(cfg, eos)
        if bsc is None or om == 0.0 or bsc[0] == 0.0:
            return {}
        cs20 = getattr(eos, "cs0", 1.0) ** 2
        shift = 1.0 / (2.0 * om) * cs20 * bsc[0] * pb
        shape = (spec.nx, spec.ny, spec.nz)
        uy = jnp.broadcast_to(shift, shape)
        zero = jnp.zeros(shape, uy.dtype)
        return {"+uu": jnp.stack([zero, uy, zero])}

    def rhs(self, pen, df, ts):
        pb = self._profile(pen.grid, float(pen.cfg.grid.Lx))
        if pb is None or "uu" not in pen.reg.slots:
            return
        bsc, _ = self._beta_scaled(pen.cfg, pen.eos)
        if bsc is None:
            return
        cs2 = pen.cs2()
        out = []
        for j in range(3):
            if bsc[j] != 0.0:
                out.append(-cs2 * bsc[j] * pb)
            else:
                out.append(jnp.zeros(()))
        dshape = pen.field("uu").shape
        force = jnp.stack([jnp.broadcast_to(o, dshape[1:]) for o in out])
        accumulate(df, "uu", force)
