"""Navier-Stokes characteristic boundary conditions (reference
``src/NSCBC.f90``): after the full RHS is assembled, the df values on
non-periodic boundary planes are REPLACED by characteristic-wave
expressions (equ.f90:605 — "after the mn-loop, before the Runge-Kutta
solver adds to f").

Implemented cases (x boundaries, as used by the 1-D flame samples):

* ``subsonic_inflow`` (bc_nscbc_subin_x :1774): u and T are held by the
  'set' boundary values; only dlnρ/dt is recomputed from the incoming/
  outgoing acoustic amplitudes L₁ = (u−c)(∂p/∂x − ρc ∂u/∂x),
  L₅ = L₁ − 2ρc·df(u), L₂ = ½(γ−1)(L₅+L₁) + ρc²·df(lnT).

* ``subson_nref_outflow`` (bc_nscbc_nref_subout_x :2121): partially
  reflecting outflow — the incoming amplitude relaxes the boundary
  pressure to p_infty with strength K = σ(1−M²)c/Lx; dρ, du, dT and the
  species (pure advection + reaction/diffusion RHS) are all recomputed.

One-sided 4th-order boundary derivatives (deriv.f90
der_onesided_4_slice).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase
from .chemistry_chemkin import RGAS


def _onesided_x(arr, side):
    """4th-order one-sided ∂/∂x at the x-boundary plane of an interior
    (nx, ny, nz) array (deriv.f90:5236-5242), WITHOUT the 1/dx factor."""
    if side == 0:
        c = arr[0:5]
        sgn = 1.0
    else:
        c = arr[-1:-6:-1]
        sgn = -1.0
    return sgn / 12.0 * (-25.0 * c[0] + 48.0 * c[1] - 36.0 * c[2]
                         + 16.0 * c[3] - 3.0 * c[4])


@dataclass(frozen=True)
class NSCBC(ModuleBase):
    name: ClassVar[str] = "nscbc"

    nscbc_bc_x: Tuple[str, str] = ("", "")    # (bottom, top)
    nscbc_sigma_out: float = 1.0
    p_infty: float = 1.013e6

    def adjust_df(self, pen, df, ts):
        cfg = pen.cfg
        if cfg.grid.periodic[0]:
            return
        dx1 = cfg.grid.nx - 1
        dx_1 = (cfg.grid.nx - 1) / cfg.grid.Lx
        rho = pen.rho()
        TT = pen.TT()
        cs2 = pen.cs2()
        uu = pen.uu()
        chem = cfg.module("chemistry")
        if chem is not None and getattr(chem, "mech", None) is not None:
            Y = pen.field("chem")
            mu1, cp, cv = chem.mixture(Y, TT, pen.lnTT())
            gamma = cp / cv
        else:
            gamma = jnp.full_like(rho, pen.eos.gamma)
        pp = cs2 * rho / gamma
        for side, case in enumerate(self.nscbc_bc_x):
            if not case:
                continue
            sl = 0 if side == 0 else -1
            c2 = cs2[sl]
            c = jnp.sqrt(c2)
            r0 = rho[sl]
            g0 = gamma[sl]
            ux0 = uu[0][sl]
            dpp = _onesided_x(pp, side) * dx_1
            dux = _onesided_x(uu[0], side) * dx_1
            if case == "subsonic_inflow":
                df_ux = df["uu"][0][sl]
                df_lnTT = df["lnTT"][sl]
                if side == 0:
                    L1 = (ux0 - c) * (dpp - r0 * c * dux)
                    L5 = L1 - 2.0 * r0 * c * df_ux
                else:
                    L5 = (ux0 + c) * (dpp + r0 * c * dux)
                    L1 = L5 + 2.0 * r0 * c * df_ux
                L2 = 0.5 * (g0 - 1.0) * (L5 + L1) + r0 * c2 * df_lnTT
                new = -(L2 + 0.5 * (L5 + L1)) / (r0 * c2)
                df["lnrho"] = df["lnrho"].at[sl].set(new)
            elif case == "subson_nref_outflow":
                drho = _onesided_x(rho, side) * dx_1
                duy = _onesided_x(uu[1], side) * dx_1
                duz = _onesided_x(uu[2], side) * dx_1
                Mach = jnp.max(ux0 / c)
                KK = self.nscbc_sigma_out * (1.0 - Mach * Mach) * c \
                    / cfg.grid.Lx
                if side == 0:
                    L5 = KK * (c2 / g0 * r0 - self.p_infty)
                    L1 = (ux0 - c) * (dpp - r0 * c * dux)
                else:
                    L1 = KK * (c2 / g0 * r0 - self.p_infty)
                    L5 = (ux0 + c) * (dpp + r0 * c * dux)
                L2 = ux0 * (c2 * drho - dpp)
                L3 = ux0 * duy
                L4 = ux0 * duz
                pref = -1.0 / (r0 * c2)
                df["lnrho"] = df["lnrho"].at[sl].set(
                    pref * (L2 + 0.5 * (L5 + L1)))
                df["uu"] = df["uu"].at[0, sl].set(
                    -(L5 - L1) / (2.0 * r0 * c))
                df["uu"] = df["uu"].at[1, sl].set(-L3)
                df["uu"] = df["uu"].at[2, sl].set(-L4)
                df["lnTT"] = df["lnTT"].at[sl].set(
                    pref * (-L2 + 0.5 * (g0 - 1.0) * (L5 + L1)))
                if chem is not None and "RHS_Y" in pen._cache:
                    rhs_y = pen._cache["RHS_Y"]
                    dY = jnp.stack([
                        _onesided_x(Y[k], side) * dx_1
                        for k in range(Y.shape[0])])
                    newY = -ux0[None] * dY + rhs_y[:, sl]
                    if getattr(chem, "lfilter", False) \
                            and cfg.time.dt > 0:
                        dtf = cfg.time.dt
                        newY = jnp.where(Y[:, sl] + newY * dtf < -1e-25,
                                         -1e-25 * dtf, newY)
                    df["chem"] = df["chem"].at[:, sl].set(newY)
            else:
                raise NotImplementedError(f"NSCBC case {case!r}")
