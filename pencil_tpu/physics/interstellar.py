"""Interstellar-medium physics (reference ``src/interstellar.f90``, 4564
LoC): optically-thin radiative cooling from a piecewise-power-law curve
(Sánchez-Salcedo/SD93-style), uniform UV heating, and supernova energy
injection at random sites on a mean interval — the SN clock is part of the
persistent state (reference record_types ids 250-260; here it lives in the
PRNG key + t, so restarts stay bit-exact)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax
import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Interstellar(ModuleBase):
    name: ClassVar[str] = "interstellar"

    # cooling Λ(T) = Λ0·T^β between T ranges (piecewise power law):
    cool_T: Tuple[float, ...] = (0.0, 0.1, 1.0)   # range edges (code units)
    cool_L: Tuple[float, ...] = (0.0, 1.0)        # Λ0 per segment
    cool_beta: Tuple[float, ...] = (2.0, 1.5)     # exponents per segment
    heat_uv: float = 0.0                          # uniform heating Γ
    # supernovae
    sn_interval: float = 0.0      # mean time between SNe (0 = off)
    sn_energy: float = 1.0        # thermal energy per SN
    sn_radius: float = 0.1        # gaussian injection radius

    def rhs(self, pen, df, ts):
        if "ss" not in pen.reg.slots:
            return
        TT = pen.TT()
        rho = pen.rho()
        lam = jnp.zeros_like(TT)
        for i in range(len(self.cool_L)):
            lo, hi = self.cool_T[i], self.cool_T[i + 1]
            seg = (TT >= lo) & (TT < hi)
            lam = jnp.where(seg, self.cool_L[i] * TT ** self.cool_beta[i],
                            lam)
        # ds/dt = (Γ − ρΛ(T)) / (ρT)  (net heating per unit mass over T)
        net = self.heat_uv - rho * lam
        accumulate(df, "ss", net * pen.rho1() * pen.TT1())

    def after_timestep(self, fields, grid, cfg, reg, eos, dt, t, key, it=None):
        # NOTE: the hook receives the FIELDS dict (see Model._local_step)
        if self.sn_interval <= 0.0 or "ss" not in fields:
            return fields
        k1, k2, k3 = jax.random.split(key, 3)
        # Poisson firing: probability dt/interval per step
        fire = jax.random.uniform(k1, ()) < dt / self.sn_interval
        gs = cfg.grid
        dtype = fields["ss"].dtype
        lo = jnp.asarray([gs.x0, gs.y0, gs.z0], dtype)
        L = jnp.asarray([gs.Lx, gs.Ly, gs.Lz], dtype)
        pos = lo + L * jax.random.uniform(k2, (3,), dtype)
        x, y, z = grid.xg, grid.yg, grid.zg
        r2 = ((x - pos[0]) ** 2 + (y - pos[1]) ** 2 + (z - pos[2]) ** 2)
        w = self.sn_radius
        blob = jnp.exp(-0.5 * r2 / (w * w))
        norm = self.sn_energy / ((2 * jnp.pi) ** 1.5 * w ** 3)
        # deposit as entropy increase: ds = dE/(ρT)
        fields = dict(fields)
        lnrho = fields.get("lnrho")
        rho1 = jnp.exp(-lnrho) if lnrho is not None else 1.0
        e = eos
        ss = fields["ss"]
        lnTT = (e.lnTT0 + e.gamma / e.cp * ss
                + (e.gamma - 1.0) * ((lnrho if lnrho is not None else 0.0)
                                     - e.lnrho0))
        dss = norm * blob * rho1 * jnp.exp(-lnTT)
        fields["ss"] = ss + jnp.where(fire, dss, 0.0)
        return fields
