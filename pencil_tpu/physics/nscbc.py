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


def _onesided(arr, side, axis=0):
    """4th-order one-sided derivative at a boundary plane of an interior
    (nx, ny, nz) array (deriv.f90:5236-5242 der_onesided_4_slice), WITHOUT
    the 1/dx factor."""
    idx = (0, 1, 2, 3, 4) if side == 0 else (-1, -2, -3, -4, -5)
    c = [jnp.take(arr, i, axis=axis) for i in idx]
    sgn = 1.0 if side == 0 else -1.0
    return sgn / 12.0 * (-25.0 * c[0] + 48.0 * c[1] - 36.0 * c[2]
                         + 16.0 * c[3] - 3.0 * c[4])


def _onesided_x(arr, side):
    return _onesided(arr, side, axis=0)


@dataclass(frozen=True)
class NSCBC(ModuleBase):
    name: ClassVar[str] = "nscbc"

    nscbc_bc_x: Tuple[str, str] = ("", "")    # (bottom, top)
    nscbc_bc_y: Tuple[str, str] = ("", "")
    nscbc_sigma_out: float = 1.0
    nscbc_sigma_in: float = 1.0
    transversal_damping: float = 0.2
    p_infty: float = 1.013e6
    # target inlet normal velocity per axis (from fbcx/fbcy of the normal
    # velocity component, NSCBC.f90:287-296)
    u_t_x: Tuple[float, float] = (0.0, 0.0)
    u_t_y: Tuple[float, float] = (0.0, 0.0)
    # inlet target temperature + composition (from the 'set' fbcx values
    # of the lnTT/species slots, NSCBC.f90 T_t/YYk arguments)
    T_t_x: Tuple[float, float] = (0.0, 0.0)
    Y_in_x: tuple = ((), ())

    def _part_ref(self, pen, df, axis, side, inlet, u_t,
                  T_t=0.0, Y_in=()):
        """LODI partially-reflecting inlet/outlet on any axis
        (bc_nscbc_prf, NSCBC.f90:361-822): the full df row of the boundary
        plane is replaced by characteristic amplitudes L₁..L₅ plus the
        Lodato transversal terms T₁..T₅ (:1750-1763).  Isothermal/noentropy
        form (γ treated as 1, P = ρc², get_thermodynamics :1463,1521);
        with an lnTT slot the entropy wave L₂ and the species waves L_k
        are carried too (:585-724, reacting-flow form)."""
        cfg = pen.cfg
        gs = cfg.grid
        if "lnTT" in pen.reg.slots:
            return self._part_ref_thermo(pen, df, axis, side, inlet,
                                         u_t, T_t, Y_in)
        if "TT" in pen.reg.slots or "ss" in pen.reg.slots:
            raise NotImplementedError("part_ref_* with a temperature "
                                      "equation is not ported")
        a = axis
        t1, t2 = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[a]
        sl = 0 if side == 0 else -1
        sgn = 1.0 if side == 0 else -1.0
        L_a = (gs.Lx, gs.Ly, gs.Lz)[a]
        d_1 = (gs.shape[a] - 1) / L_a

        def take(arr):
            return jnp.take(arr, sl, axis=a)

        rho = pen.rho()
        uu = pen.uu()
        rho0 = take(rho)
        cs2 = take(pen.cs2() + 0.0 * rho)
        cs = jnp.sqrt(cs2)
        u_n = take(uu[a])
        u_1 = take(uu[t1])
        u_2 = take(uu[t2])
        P0 = rho0 * cs2
        # one-sided 4th normal derivatives (interior values only)
        dun_dn = _onesided(uu[a], side, axis=a) * d_1
        du1_dn = _onesided(uu[t1], side, axis=a) * d_1
        du2_dn = _onesided(uu[t2], side, axis=a) * d_1
        drho_dn = _onesided(rho, side, axis=a) * d_1
        dP_dn = cs2 * drho_dn
        # transverse centered derivatives on the plane (ghost-filled, the
        # reference's der_pencil calls in derivate_boundary :1602-1616)
        uij = pen.uij()
        dun_d1 = take(uij[a, t1])
        dun_d2 = take(uij[a, t2])
        du1_d1 = take(uij[t1, t1])
        du1_d2 = take(uij[t1, t2])
        du2_d1 = take(uij[t2, t1])
        du2_d2 = take(uij[t2, t2])
        if "rho" in pen.reg.slots:
            grho = pen.grad("rho")
        else:
            grho = pen.glnrho() * rho[None]
        dP_d1 = cs2 * take(grho[t1])
        dP_d2 = cs2 * take(grho[t2])
        T1 = (rho0 * du1_d1 + u_1 * take(grho[t1])
              + rho0 * du2_d2 + u_2 * take(grho[t2]))
        T2 = u_1 * dun_d1 + u_2 * dun_d2
        T3 = u_1 * du1_d1 + u_2 * du1_d2 + dP_d1 / rho0
        T4 = u_1 * du2_d1 + u_2 * du2_d2 + dP_d2 / rho0
        T5 = u_1 * dP_d1 + u_2 * dP_d2 + rho0 * cs2 * (du1_d1 + du2_d2)
        Mach = jnp.mean(u_n / cs)
        prefac1 = -1.0 / (2.0 * cs2)
        prefac2 = -1.0 / (2.0 * rho0 * cs)
        if inlet:
            # part_ref_inlet: non-reflecting with σ_in relaxation
            # (:582-632; u_in = (u_t, 0, 0), find_velocity_at_inlet)
            L1 = (u_n - sgn * cs) * (dP_dn - sgn * rho0 * cs * dun_dn)
            L3 = self.nscbc_sigma_in * u_1 * cs / L_a - T3
            L4 = self.nscbc_sigma_in * u_2 * cs / L_a - T4
            L5 = (self.nscbc_sigma_in * cs2 * rho0 * sgn * (u_n - u_t)
                  * (1.0 - Mach ** 2) / L_a
                  - (T5 + sgn * rho0 * cs * T2))
        else:
            # part_ref_outlet (:664-686)
            KK = (self.nscbc_sigma_out * (1.0 - Mach ** 2) * jnp.mean(cs)
                  / L_a)
            L1 = (KK * (P0 - self.p_infty)
                  - (T5 - sgn * rho0 * cs * T2)
                  * (1.0 - self.transversal_damping))
            L3 = u_n * du1_dn
            L4 = u_n * du2_dn
            L5 = (u_n - sgn * cs) * (dP_dn - sgn * rho0 * cs * dun_dn)
        # L2 = 0 without a temperature equation (:610,673)
        if (side == 0) == inlet:
            dfn = prefac2 * (L5 - L1) - T2
        else:
            dfn = prefac2 * (L1 - L5) + T2
        dfrho = prefac1 * (L1 + L5) - T1
        df1 = -L3 - T3
        df2 = -L4 - T4
        rname = "rho" if "rho" in pen.reg.slots else "lnrho"
        if rname == "lnrho":
            dfrho = dfrho / rho0
        idx = [slice(None)] * 3
        idx[a] = sl
        idx = tuple(idx)
        df[rname] = df[rname].at[idx].set(dfrho)
        df["uu"] = df["uu"].at[(a,) + idx].set(dfn)
        df["uu"] = df["uu"].at[(t1,) + idx].set(df1)
        df["uu"] = df["uu"].at[(t2,) + idx].set(df2)

    def adjust_df(self, pen, df, ts):
        cfg = pen.cfg
        for axis, cases, uts, tts, yins in (
                (0, self.nscbc_bc_x, self.u_t_x, self.T_t_x, self.Y_in_x),
                (1, self.nscbc_bc_y, self.u_t_y, (0.0, 0.0), ((), ()))):
            if cfg.grid.periodic[axis]:
                continue
            for side, case in enumerate(cases):
                if case == "part_ref_inlet":
                    self._part_ref(pen, df, axis, side, True, uts[side],
                                   tts[side], yins[side])
                elif case == "part_ref_outlet":
                    self._part_ref(pen, df, axis, side, False, uts[side],
                                   tts[side], yins[side])
                elif case and axis != 0:
                    raise NotImplementedError(
                        f"NSCBC case {case!r} on axis {axis}")
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
            if not case or case.startswith("part_ref"):
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


def _part_ref_thermo(self, pen, df, axis, side, inlet, u_t, T_t, Y_in):
    """Full-thermodynamics LODI boundary (bc_nscbc_prf with ilnTT>0 and
    chemistry, NSCBC.f90:585-744): carries the entropy wave
    L₂ and per-species waves L_k, with mixture γ/cs/µ⁻¹ and the ideal-gas
    pressure P = ρ·R·µ⁻¹·T; dlnT/dt and dY_k/dt rows are replaced along
    with dρ and du.  Mean-inlet form (inlet_from_file turbulence
    fluctuations are not replayed — u_in = (u_t, 0, 0))."""
    cfg = pen.cfg
    gs = cfg.grid
    a = axis
    t1, t2 = {0: (1, 2), 1: (0, 2), 2: (0, 1)}[a]
    sl = 0 if side == 0 else -1
    sgn = 1.0 if side == 0 else -1.0
    L_a = (gs.Lx, gs.Ly, gs.Lz)[a]
    d_1 = (gs.shape[a] - 1) / L_a

    def take(arr):
        return jnp.take(arr, sl, axis=a)

    rho = pen.rho()
    uu = pen.uu()
    TTf = pen.TT()
    lnTTf = pen.lnTT()
    chem = cfg.module("chemistry")
    nolog_rho = "rho" in pen.reg.slots
    if chem is not None and getattr(chem, "mech", None) is not None:
        Y = pen.field("chem")
        mu1f, cpf, cvf = chem.mixture(Y, TTf, lnTTf)
        gammaf = cpf / cvf
        W = jnp.asarray(chem.mech.mass)           # (nspec,) g/mol
    else:
        Y = None
        mu1f = jnp.ones_like(rho)
        gammaf = jnp.full_like(rho, pen.eos.gamma)
        W = None
    cs2f = pen.cs2() + 0.0 * rho
    Pf = rho * cs2f / gammaf
    rho0 = take(rho)
    TT0 = take(TTf)
    mu1 = take(mu1f)
    gam0 = take(gammaf)
    cs2 = take(cs2f)
    cs = jnp.sqrt(cs2)
    P0 = take(Pf)
    u_n = take(uu[a])
    u_1 = take(uu[t1])
    u_2 = take(uu[t2])
    # one-sided normal derivatives
    dun_dn = _onesided(uu[a], side, axis=a) * d_1
    du1_dn = _onesided(uu[t1], side, axis=a) * d_1
    du2_dn = _onesided(uu[t2], side, axis=a) * d_1
    drho_dn = _onesided(rho, side, axis=a) * d_1
    dP_dn = _onesided(Pf, side, axis=a) * d_1
    # transverse centered derivatives on the plane
    uij = pen.uij()
    dun_d1 = take(uij[a, t1])
    dun_d2 = take(uij[a, t2])
    du1_d1 = take(uij[t1, t1])
    du1_d2 = take(uij[t1, t2])
    du2_d1 = take(uij[t2, t1])
    du2_d2 = take(uij[t2, t2])
    if nolog_rho:
        grho = pen.grad("rho")
    else:
        grho = pen.glnrho() * rho[None]
    # transverse pressure gradient via the chain rule P = ρRµ⁻¹T:
    # ∇P = P(∇lnρ + ∇lnT + ∇µ⁻¹/µ⁻¹)
    glnTT = pen.glnTT()
    if Y is not None and W is not None:
        gmu1_t1 = sum(pen.d("chem", t1)[k] / W[k]
                      for k in range(Y.shape[0]))
        gmu1_t2 = sum(pen.d("chem", t2)[k] / W[k]
                      for k in range(Y.shape[0]))
        gmu1_t1 = take(gmu1_t1) / mu1
        gmu1_t2 = take(gmu1_t2) / mu1
    else:
        gmu1_t1 = gmu1_t2 = 0.0
    dP_d1 = P0 * (take(grho[t1]) / rho0 + take(glnTT[t1]) + gmu1_t1)
    dP_d2 = P0 * (take(grho[t2]) / rho0 + take(glnTT[t2]) + gmu1_t2)
    T1 = (rho0 * du1_d1 + u_1 * take(grho[t1])
          + rho0 * du2_d2 + u_2 * take(grho[t2]))
    T2 = u_1 * dun_d1 + u_2 * dun_d2
    T3 = u_1 * du1_d1 + u_2 * du1_d2 + dP_d1 / rho0
    T4 = u_1 * du2_d1 + u_2 * du2_d2 + dP_d2 / rho0
    T5 = u_1 * dP_d1 + u_2 * dP_d2 + gam0 * P0 * (du1_d1 + du2_d2)
    Mach = jnp.mean(u_n / cs)
    prefac1 = -1.0 / (2.0 * cs2)
    prefac2 = -1.0 / (2.0 * rho0 * cs)
    nspec = Y.shape[0] if Y is not None else 0
    if inlet:
        L1 = (u_n - sgn * cs) * (dP_dn - sgn * rho0 * cs * dun_dn)
        # Julien's corrected entropy-wave relaxation (:604-608)
        L2 = (self.nscbc_sigma_in * cs * rho0 * RGAS * mu1
              * (gam0 - 1.0) * (1.0 - Mach ** 2) * (TT0 - T_t) / L_a
              - (cs2 * T1 - T5))
        L3 = self.nscbc_sigma_in * u_1 * cs / L_a - T3
        L4 = self.nscbc_sigma_in * u_2 * cs / L_a - T4
        L5 = (self.nscbc_sigma_in * cs2 * rho0 * sgn * (u_n - u_t)
              * (1.0 - Mach ** 2) / L_a
              - (T5 + sgn * rho0 * cs * T2))
        Lk = [self.nscbc_sigma_in
              * (take(Y[k]) - (Y_in[k] if k < len(Y_in) else 0.0))
              * cs / L_a for k in range(nspec)]
    else:
        KK = (self.nscbc_sigma_out * (1.0 - Mach ** 2) * jnp.mean(cs)
              / L_a)
        L1 = (KK * (P0 - self.p_infty)
              - (T5 - sgn * rho0 * cs * T2)
              * (1.0 - self.transversal_damping))
        L2 = u_n * (cs2 * drho_dn - dP_dn)
        L3 = u_n * du1_dn
        L4 = u_n * du2_dn
        L5 = (u_n - sgn * cs) * (dP_dn - sgn * rho0 * cs * dun_dn)
        Lk = [u_n * _onesided(Y[k], side, axis=a) * d_1
              for k in range(nspec)]
    if (side == 0) == inlet:
        dfn = prefac2 * (L5 - L1) - T2
    else:
        dfn = prefac2 * (L1 - L5) + T2
    dfrho = prefac1 * (2.0 * L2 + L1 + L5) - T1
    sum_Lk = 0.0
    for k in range(nspec):
        sum_Lk = sum_Lk + (rho0 * cs2) / (W[k] * mu1) * Lk[k]
    # dT/dt (:719-721), then /T for the log form (:739-740)
    dflnTT = (prefac1 / rho0 * (-2.0 * L2 + (gam0 - 1.0) * (L5 + L1)
                                - sum_Lk)
              + (T1 / rho0 - T5 / P0))
    df1 = -L3 - T3
    df2 = -L4 - T4
    rname = "rho" if nolog_rho else "lnrho"
    if rname == "lnrho":
        dfrho = dfrho / rho0
    idx = [slice(None)] * 3
    idx[a] = sl
    idx = tuple(idx)
    df[rname] = df[rname].at[idx].set(dfrho)
    df["uu"] = df["uu"].at[(a,) + idx].set(dfn)
    df["uu"] = df["uu"].at[(t1,) + idx].set(df1)
    df["uu"] = df["uu"].at[(t2,) + idx].set(df2)
    df["lnTT"] = df["lnTT"].at[idx].set(dflnTT)
    for k in range(nspec):
        df["chem"] = df["chem"].at[(k,) + idx].set(-Lk[k])


NSCBC._part_ref_thermo = _part_ref_thermo
del _part_ref_thermo
