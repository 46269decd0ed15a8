"""Shallow-water equations on the 2-D gamma plane (reference
``src/special/shallow_water.f90``; Brueshaber et al. 2019 / Showman 2007
polar-vortex setup).

The DENSITY slot carries ρ ≡ g·η (the geopotential deviation,
ldensity_nolog) and HYDRO runs without a gas pressure gradient
(lpressuregradient_gas=F).  This special adds

    du/dt += −∇(gη) + f_c (u_y, −u_x) − γr² (u_y, −u_x)   (Coriolis + γ-plane)
    d(gη)/dt += −(u·∇)gh₀ − gh₀ ∇·u − (gη − η₀)/τ_relax + storms

with gh₀ the polynomial base height (c0 + cx1·x + …), and the gravity-wave
CFL advec_cg2 (shallow_water.f90:372-481).  Storms follow the reference's
Showman storm function: nstorm gaussians with parameters drawn ONCE at
start (update_storms/get_storm — replayed from the same deterministic RNG
stream via ``storm_table``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


@register_special("shallow_water")
@dataclass(frozen=True)
class ShallowWater(Special):
    name: ClassVar[str] = "shallow_water"

    Omega_SB: float = 1.0
    gamma_parameter: float = 1.0
    # polynomial base height gh0(x, y)
    c0: float = 0.0
    cx1: float = 0.0
    cx2: float = 0.0
    cy1: float = 0.0
    cy2: float = 0.0
    cx1y1: float = 0.0
    cx1y2: float = 0.0
    cx2y1: float = 0.0
    cx2y2: float = 0.0
    lcoriolis_force: bool = True
    lgamma_plane: bool = True
    lmass_relaxation: bool = True
    ladvection_base_height: bool = True
    lcompression_base_height: bool = True
    tmass_relaxation: float = 176.0
    eta0: float = 0.0           # relaxation target for gη
    # storms (Showman 2007): tuple of (xc, yc, rstorm, tstorm, tpeak, smax)
    # rows — precomputed host-side (reference get_storm draws)
    lcalc_storm: bool = True
    lsubsidence: bool = True
    lautotest_mode: bool = False
    storm_strength: float = 0.0
    tduration: float = 17.0
    rsize_storm: float = 0.03
    interval_between_storms: float = 17.0
    storm_table: tuple = ()
    storm_truncation_factor: float = 2.2
    r_ext: float = 0.0          # cylinder radius for subsidence norm

    def _h0(self, x, y):
        return (self.c0 + self.cx1 * x + self.cx2 * x ** 2
                + self.cy1 * y + self.cy2 * y ** 2
                + self.cx1y1 * x * y + self.cx1y2 * x * y ** 2
                + self.cx2y1 * x ** 2 * y + self.cx2y2 * x ** 2 * y ** 2)

    def rhs(self, pen, df, ts):
        uu = pen.uu()
        rho = pen.field("rho")     # gη
        x, y = pen.grid.xg, pen.grid.yg

        # momentum: −∇(gη) (the shallow-water pressure term; gas pressure
        # is off) + Coriolis + γ-plane
        grho = pen.grad("rho")
        du = -grho
        if self.lcoriolis_force:
            fc = 2.0 * self.Omega_SB
            du = du.at[0].add(fc * uu[1])
            du = du.at[1].add(-fc * uu[0])
        if self.lgamma_plane:
            gr2 = self.gamma_parameter * (x ** 2 + y ** 2)
            du = du.at[0].add(-gr2 * uu[1])
            du = du.at[1].add(gr2 * uu[0])
        accumulate(df, "uu", du)

        # continuity extras for the base height + relaxation + storms
        drho = 0.0
        h0 = self._h0(x, y)
        if self.ladvection_base_height and (
                self.cx1 or self.cx2 or self.cy1 or self.cy2 or self.cx1y1
                or self.cx1y2 or self.cx2y1 or self.cx2y2):
            gh0x = (self.cx1 + 2 * self.cx2 * x + self.cx1y1 * y
                    + self.cx1y2 * y ** 2 + 2 * self.cx2y1 * x * y
                    + 2 * self.cx2y2 * x * y ** 2)
            gh0y = (self.cy1 + 2 * self.cy2 * y + self.cx1y1 * x
                    + 2 * self.cx1y2 * x * y + self.cx2y1 * x ** 2
                    + 2 * self.cx2y2 * x ** 2 * y)
            drho = drho - (uu[0] * gh0x + uu[1] * gh0y)
        if self.lcompression_base_height:
            drho = drho - h0 * pen.divu()
        if self.lmass_relaxation:
            drho = drho - (rho - self.eta0) / self.tmass_relaxation
        if self.lcalc_storm and self.storm_table:
            t = pen._cache.get("_t", None)
            if t is not None:
                drho = drho + self.storm_function(x, y, t)
        accumulate(df, "rho", drho)

        # gravity-wave CFL (reference shallow_water.f90:475:
        # advec_cg2 = (ρ + gh₀)²·dxyz_2 joins the squared-wave-speed class)
        d1 = pen.dline_1()
        dxyz2 = d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2
        ts.advec2((rho + h0) ** 2 * dxyz2)

    def storm_function(self, x, y, t):
        """Σ_i s_i with s_i = smax·exp(−r²/rstorm² − ((t−tpeak)/tstorm)²),
        truncated at storm_truncation_factor in both radius and age;
        subsidence removes the injected mass outside the storm boundary
        (reference calc_storm_function, shallow_water.f90:530-566)."""
        out = 0.0
        trunc = self.storm_truncation_factor
        for (xc, yc, rstorm, tstorm, tpeak, smax) in self.storm_table:
            rr2 = (x - xc) ** 2 + (y - yc) ** 2
            expt = jnp.exp(-((t - tpeak) / tstorm) ** 2)
            amp = smax * expt
            active = jnp.abs(t - tpeak) < trunc * tstorm
            inside = rr2 < (trunc * rstorm) ** 2
            sf = jnp.where(active & inside,
                           amp * jnp.exp(-rr2 / rstorm ** 2), 0.0)
            out = out + sf
            if self.lsubsidence and self.r_ext > 0.0:
                import math
                sub_fact = (rstorm ** 2 * (1.0 - math.exp(-trunc ** 2))
                            / (self.r_ext ** 2 - (trunc * rstorm) ** 2))
                out = out - jnp.where(active & ~inside, amp * sub_fact, 0.0)
        return out


def make_storm_table(rng, nstorm, tduration, rsize_storm, storm_strength,
                     r_int, r_ext, wborder_ext, t0=0.0):
    """Replicate the reference's start-time storm draws (update_storms →
    get_storm, shallow_water.f90:568-745): per storm 4 draws (r, p, trand,
    srand) from the channel-1 stream."""
    import numpy as np
    smax_values = np.array([-5.0, -2.5, -1.0, 1.0, 2.5, 5.0])
    rows = []
    for _ in range(nstorm):
        r = float(rng.next())
        p = float(rng.next())
        trand = float(rng.next())
        srand = float(rng.next())
        rr = r_int + np.sqrt(r) * ((r_ext - wborder_ext) - r_int)
        phi = 2.0 * np.pi * p
        tpeak = t0 + (1.1 + trand) * tduration
        ismax = int(np.rint(srand * 5 + 1))     # Fortran nint, 1-based
        smax = smax_values[ismax - 1] * storm_strength
        rows.append((rr * np.cos(phi), rr * np.sin(phi), rsize_storm,
                     tduration, tpeak, smax))
    return tuple(rows)
