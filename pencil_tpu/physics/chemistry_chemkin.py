"""CHEMKIN-driven multispecies chemistry (reference ``src/chemistry.f90``
with ``lcheminp``: get_reaction_rate :4150-4386, calc_reaction_term
:4494-4610, thermochemistry pencils :842-930, heat release into the lnTT
equation :3040-3125; EOS closures from ``src/eos_chemistry.f90``).

The mechanism (species, NASA-7 thermo, stoichiometry, Arrhenius, third
bodies, Lindemann/Troe falloff) is parsed by ``compat/chemkin.py`` into
numpy arrays; this module evaluates the whole reaction network as a few
batched einsum/where expressions over the grid — one fused XLA kernel
instead of the reference's per-reaction pencil loop.

Units: the chem.inp convention is cm³·mol·s·cal·K (chemistry.f90:4-8);
the reference's quirky Rcal = Rgas/4.14e7 (NOT 4.184; chemistry.f90:4194)
is reproduced for parity.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import ClassVar, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .base import ModuleBase, accumulate

# k_B/m_u in cgs (reference cparam.f90:184-185)
RGAS = 1.3806505e-16 / 1.66053886e-24     # erg/(mol K)
RCAL1 = 1.0 / (RGAS / 4.14 * 1e-7)        # 1/Rcal (chemistry.f90:4194)
LN_P_ATM = float(np.log(1e6))             # ln(1 bar in dyn/cm²), cgs units


def _nasa_eval(nasa, T_mid, TT, lnTT, kind):
    """Evaluate NASA-7 per species: cp/R, H0/RT or S0/R.
    nasa: (ns,2,7) [low, high]; returns (ns, ...) broadcast over TT."""
    TT = TT[None]
    lnTT = lnTT[None]
    lo, hi = nasa[:, 0], nasa[:, 1]
    use_lo = TT <= T_mid[:, None, None, None]

    def poly(a):
        a = [c[:, None, None, None] for c in a.T]
        T2, T3, T4 = TT * TT, TT ** 3, TT ** 4
        if kind == "cp":
            return a[0] + a[1] * TT + a[2] * T2 + a[3] * T3 + a[4] * T4
        if kind == "h":
            return (a[0] + a[1] * TT / 2 + a[2] * T2 / 3 + a[3] * T3 / 4
                    + a[4] * T4 / 5 + a[5] / TT)
        return (a[0] * lnTT + a[1] * TT + a[2] * T2 / 2 + a[3] * T3 / 3
                + a[4] * T4 / 4 + a[6])

    return jnp.where(use_lo, poly(lo), poly(hi))


@dataclass(frozen=True, eq=False)
class ChemistryChemkin(ModuleBase):
    name: ClassVar[str] = "chemistry"

    mech: object = None            # compat.chemkin.Mechanism
    init: str = "air"
    T_init: float = 300.0
    P_init: float = 1.013e6        # dyn/cm²
    Y_init: Tuple[Tuple[str, float], ...] = ()
    lreactions: bool = True
    ldiffusion: bool = False
    lheatc_chemistry: bool = False

    def register(self, reg):
        reg.register("chem", self.mech.ns, "pde",
                     comps=tuple(self.mech.species))

    # ---- mixture thermo helpers ---------------------------------------
    def mixture(self, Y, TT, lnTT):
        m = self.mech
        W1 = (1.0 / m.mass)[:, None, None, None]
        mu1 = jnp.sum(Y * W1, axis=0)                      # Σ Y_k/W_k
        cpR = _nasa_eval(m.nasa, m.T_ranges[:, 1], TT, lnTT, "cp")
        cv = jnp.sum(Y * (cpR - 1.0) * RGAS * W1, axis=0)  # erg/(g K)
        cp = jnp.sum(Y * cpR * RGAS * W1, axis=0)
        return mu1, cp, cv

    def rhs(self, pen, df, ts):
        if not self.lreactions:
            return
        m = self.mech
        Y = pen.field("chem")                   # (ns, nx, ny, nz)
        TT = pen.TT()
        lnTT = pen.lnTT()
        rho = pen.rho()
        TT1 = 1.0 / TT

        W = m.mass[:, None, None, None]
        conc = Y * rho[None] / W                # mol/cm³
        mu1, cp, cv = self.mixture(Y, TT, lnTT)

        # ln kf = ln A + b lnT − E/(Rcal T)   (chemistry.f90:4253)
        lnkf = (m.lnA[:, None, None, None]
                + m.b[:, None, None, None] * lnTT[None]
                - (m.E_cal * RCAL1)[:, None, None, None] * TT1[None])

        # equilibrium: ln Kc = ΔS/R − ΔH/RT + Δν(ln p_atm − lnT − lnR)
        S0R = _nasa_eval(m.nasa, m.T_ranges[:, 1], TT, lnTT, "s")
        H0RT = _nasa_eval(m.nasa, m.T_ranges[:, 1], TT, lnTT, "h")
        dnu = m.Sijm - m.Sijp                   # (ns, nr)
        dSR = jnp.einsum("kj,k...->j...", dnu, S0R)
        dHRT = jnp.einsum("kj,k...->j...", dnu, H0RT)
        sum_nu = dnu.sum(axis=0)[:, None, None, None]
        lnKc = dSR - dHRT + sum_nu * (LN_P_ATM - lnTT[None]
                                      - float(np.log(RGAS)))

        # concentration products over reactant/product stoichiometry
        def cprod(S):
            p = jnp.where(S[:, :, None, None, None] > 0,
                          conc[:, None] ** S[:, :, None, None, None], 1.0)
            return jnp.prod(p, axis=0)          # (nr, ...)
        prod1 = cprod(m.Sijp)
        prod2 = cprod(m.Sijm)

        # third bodies: Σ a_k4·c_k where efficiencies exist, else total
        # molar concentration (used only by falloff)   chemistry.f90:4276
        eff = np.nan_to_num(m.a_k4, nan=0.0)
        has_eff = ~np.isnan(m.a_k4).all(axis=0)
        sum_sp_tb = jnp.einsum("kj,k...->j...", eff, conc)
        total_c = (rho * mu1)[None]
        mix_conc = jnp.where(has_eff[:, None, None, None],
                             sum_sp_tb, total_c)
        sum_sp = jnp.where(has_eff[:, None, None, None], sum_sp_tb, 1.0)

        # Lindemann falloff + Troe broadening      chemistry.f90:4288-4320
        if m.has_low.any():
            lnkf0 = (m.low[:, 0, None, None, None]
                     + m.low[:, 1, None, None, None] * lnTT[None]
                     - (m.low[:, 2] * RCAL1)[:, None, None, None]
                     * TT1[None])
            Pr = jnp.exp(lnkf0 - lnkf) * mix_conc
            lnkf_fall = lnkf + jnp.log(Pr / (1.0 + Pr))
            lnkf = jnp.where(m.has_low[:, None, None, None],
                             lnkf_fall, lnkf)
            if m.has_troe.any():
                a = m.troe[:, 0, None, None, None]
                T3 = m.troe[:, 1, None, None, None]
                T1 = m.troe[:, 2, None, None, None]
                Fcent = ((1.0 - a) * jnp.exp(-TT[None] / T3)
                         + a * jnp.exp(-TT[None] / T1))
                l10Fc = jnp.log10(jnp.maximum(Fcent, 1e-300))
                ccc = -0.4 - 0.67 * l10Fc
                nnn = 0.75 - 1.27 * l10Fc
                l10Pr = jnp.log10(jnp.maximum(Pr, 1e-300))
                tmpF = ((l10Pr + ccc) / (nnn - 0.14 * (l10Pr + ccc))) ** 2
                FF = l10Fc / (1.0 + tmpF) * float(np.log(10.0))
                lnkf = jnp.where(m.has_troe[:, None, None, None],
                                 lnkf + FF, lnkf)

        lnkr = lnkf - lnKc
        # ('(+M)' falloff reactions are NOT multiplied by Σa·c, plain +M
        # third-body reactions are — chemistry.f90:4330-4350)
        fac = jnp.where(m.mplus[:, None, None, None], 1.0, sum_sp)
        vp = jnp.where(prod1 > 0, prod1 * jnp.exp(lnkf), 0.0) * fac
        vm = jnp.where(prod2 > 0, prod2 * jnp.exp(lnkr), 0.0) * fac
        vm = jnp.where(m.back[:, None, None, None], vm, 0.0)
        v = vp - vm                              # mol/cm³/s, (nr, ...)

        # ω̇_k → DYDt (chemistry.f90:4563; stoichio = Sijp − Sijm)
        stoichio = m.Sijp - m.Sijm
        DYDt = -jnp.einsum("kj,j...->k...", stoichio, v) * (W / rho[None])
        accumulate(df, "chem", DYDt)

        # heat release into the temperature equation (chemistry.f90:3048-
        # 3115, divu and diffusion terms contributed elsewhere):
        #   dlnTT/dt += cv1·[Σ_k (R/W_k)·DYDt_k − Σ_k h_k·DYDt_k / T]
        hk = H0RT * RGAS * TT[None] / W          # erg/g
        sum_DYDt = jnp.sum(RGAS / W * DYDt, axis=0)
        sum_hhk = -jnp.sum(hk * DYDt, axis=0)
        if "lnTT" in pen.reg.slots:
            accumulate(df, "lnTT", (sum_DYDt + sum_hhk * TT1) / cv)
        elif "TT" in pen.reg.slots:
            accumulate(df, "TT", (sum_DYDt * TT + sum_hhk) / cv)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        """Reference air_field (chemistry.f90): mass fractions from the
        composition table, ρ = P·μ/(R T), lnTT = ln T.  Overrides the
        density/temperature module inits (module order puts chemistry
        after them, exactly like the reference's init_chemistry)."""
        m = self.mech
        shape = (grid.x.shape[0], grid.y.shape[0], grid.z.shape[0])
        Y = np.zeros((m.ns,) + shape)
        for name, frac in self.Y_init:
            if name in m.species:
                Y[m.species.index(name)] = frac
        mu1 = sum(f / m.mass[m.species.index(n)]
                  for n, f in self.Y_init if n in m.species)
        rho0 = self.P_init / (RGAS * mu1 * self.T_init)
        out: Dict[str, np.ndarray] = {
            "chem": jnp.asarray(Y),
            "lnTT": jnp.full(shape, float(np.log(self.T_init))),
            "lnrho": jnp.full(shape, float(np.log(rho0))),
        }
        return out


@dataclass(frozen=True)
class TemperatureIonization(ModuleBase):
    """ENERGY slot holder for chemistry runs (reference
    ``src/temperature_ionization.f90``): registers lnTT; its advection
    term −u·∇lnTT applies only when hydro is present — the chemistry
    module contributes the reactive heating directly."""
    name: ClassVar[str] = "entropy"

    def register(self, reg):
        reg.register("lnTT", 1, "pde")

    def rhs(self, pen, df, ts):
        if "uu" in pen.reg.slots:
            accumulate(df, "lnTT", -pen.ugrad("lnTT"))
