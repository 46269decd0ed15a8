"""Smaller reference module slots, one class each (SURVEY.md §2.5):

* Chiral       — ``src/chiral.f90``: chiral chemical potentials X, Y with
                 advection-diffusion and the λ-coupling to magnetic helicity
                 overlap (chiral magnetic effect term in induction).
* Polymer      — ``src/polymer.f90``: Oldroyd-B conformation tensor C_ij
                 (symmetric, 6 components) with upper-convected derivative
                 and relaxation; elastic force on the flow.
* HeatFlux     — ``src/heatflux.f90``: non-Fourier evolving heat-flux
                 vector q (telegraph/Cattaneo): τ ∂q/∂t = −q − K∇T.
* LorenzGauge  — ``src/lorenz_gauge.f90``: electromagnetic gauge scalar φ
                 with ∂φ/∂t = −c²∇·A; feeds −∇φ into ∂A/∂t.
* ActiveScalar — ``src/ascalar.f90``: supersaturation-like scalar with a
                 condensation sink coupling.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Chiral(ModuleBase):
    """Chirality equations in reduced form (reference ``src/chiral.f90``
    ``dXY_chiral_dt`` :253-435, q-bio/0401036): enantiomer concentrations
    X, Y advected and diffused, with the BAHN autocatalysis reaction

        RR_X = X + ci·Y,  RR_Y = Y + ci·X
        X₂ = ½X²/RR_X,    Y₂ = ½Y²/RR_Y,   R21 = 1/(X₂+Y₂)
        dX += (p·X₂ + q·Y₂)·R21 − X·RR_X,  p = ½(1+f), q = ½(1−f)
        dY += (p·Y₂ + q·X₂)·R21 − Y·RR_Y

    (f = chiral_fidelity, ci = chiral_crossinhibition)."""

    name: ClassVar[str] = "chiral"

    chiral_diff: float = 0.0          # YY diffusion
    chiral_diffXX: float = -1.0       # XX diffusion (<0 → use chiral_diff)
    crossinhibition: float = 1.0
    fidelity: float = 1.0
    reaction: str = "BAHN_model"
    initX: str = "zero"
    initY: str = "zero"
    amplX: float = 0.0
    amplY: float = 0.0
    radiusX: float = 1.0
    radiusY: float = 1.0
    xposX: float = 0.0
    xposY: float = 0.0

    def register(self, reg):
        reg.register("XX_chiral", 1, "pde")
        reg.register("YY_chiral", 1, "pde")

    def rhs(self, pen, df, ts):
        tini = 1e-30
        XX = pen.field("XX_chiral")
        YY = pen.field("YY_chiral")
        diffXX = self.chiral_diffXX if self.chiral_diffXX >= 0.0 \
            else self.chiral_diff
        outX = self.chiral_diff * 0.0
        outX = -pen.ugrad("XX_chiral") + diffXX * pen.del2s("XX_chiral")
        outY = -pen.ugrad("YY_chiral") \
            + self.chiral_diff * pen.del2s("YY_chiral")
        if self.reaction == "BAHN_model":
            RRX = XX + YY * self.crossinhibition
            RRY = YY + XX * self.crossinhibition
            X2 = 0.5 * XX ** 2 / jnp.maximum(RRX, tini)
            Y2 = 0.5 * YY ** 2 / jnp.maximum(RRY, tini)
            R21 = 1.0 / jnp.maximum(X2 + Y2, tini)
            pp = 0.5 * (1.0 + self.fidelity)
            qq = 0.5 * (1.0 - self.fidelity)
            outX = outX + (pp * X2 + qq * Y2) * R21 - XX * RRX
            outY = outY + (pp * Y2 + qq * X2) * R21 - YY * RRY
        ts.diffus(max(diffXX, self.chiral_diff))
        accumulate(df, "XX_chiral", outX)
        accumulate(df, "YY_chiral", outY)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        def blob(ampl, radius, xpos):
            # reference sub.f90:5450 blob: ampl·exp(−(r−r0)²/radius²)
            fact = 1.0 / radius ** 2
            return ampl * (jnp.exp(-fact * (grid.xg - xpos) ** 2)
                           * jnp.exp(-fact * grid.yg ** 2)
                           * jnp.exp(-fact * grid.zg ** 2)
                           ) * jnp.ones(spec.shape, grid.x.dtype)

        z = jnp.zeros(spec.shape, grid.x.dtype)
        out = {"XX_chiral": z, "YY_chiral": z}
        if self.initX == "blob":
            out["XX_chiral"] = blob(self.amplX, self.radiusX, self.xposX)
        elif self.initX == "const":
            out["XX_chiral"] = z + self.amplX
        if self.initY == "blob":
            out["YY_chiral"] = blob(self.amplY, self.radiusY, self.xposY)
        elif self.initY == "const":
            out["YY_chiral"] = z + self.amplY
        return out


@dataclass(frozen=True)
class Polymer(ModuleBase):
    name: ClassVar[str] = "polymer"

    tau_poly: float = 1.0       # relaxation time
    mu_poly: float = 0.0        # elastic coupling to the flow
    diff_poly: float = 1e-4     # numerical diffusion of C
    # FENE-P closure (polymer.f90:306-340): f(r) = (L²−3)/(L²−tr C),
    # relaxation −(f·C − I)/τ, elastic force ∇·(f C); 'oldroyd-B' ⇒ f=1
    poly_model: str = "oldroyd-B"
    fenep_L: float = 0.0

    def fr(self, C):
        if self.poly_model != "FENE-P" or self.fenep_L <= 0.0:
            return None
        L2 = self.fenep_L ** 2
        return (L2 - 3.0) / (L2 - (C[0] + C[3] + C[5]))
    _comps: ClassVar[tuple] = ("cxx", "cxy", "cxz", "cyy", "cyz", "czz")
    _idx: ClassVar[dict] = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2,
                            (2, 0): 2, (1, 1): 3, (1, 2): 4, (2, 1): 4,
                            (2, 2): 5}

    def register(self, reg):
        reg.register("poly", 6, "pde", comps=self._comps)

    def rhs(self, pen, df, ts):
        C = pen.field("poly")          # (6, ...)
        uij = pen.uij()

        def c(i, j):
            return C[self._idx[(i, j)]]

        fr = self.fr(C)
        out = []
        for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            # upper-convected: dC/dt = C·∇u + (∇u)ᵀ·C − (fC − I)/τ − u·∇C
            # (FENE-P multiplies the relaxed conformation by f(r),
            # polymer.f90:505)
            stretch = sum(c(i, m) * uij[j, m] + c(j, m) * uij[i, m]
                          for m in range(3))
            fc = c(i, j) if fr is None else fr * c(i, j)
            relax = -(fc - (1.0 if i == j else 0.0)) / self.tau_poly
            out.append(stretch + relax)
        out = jnp.stack(out)
        # advection of all components
        uu = pen.uu()
        dC = [pen.d("poly", a) for a in range(3)]
        out = out - sum(uu[a][None] * dC[a] for a in range(3))
        if self.diff_poly > 0.0:
            out = out + self.diff_poly * pen.del2v("poly")
            ts.diffus(self.diff_poly)
        accumulate(df, "poly", out)
        if self.mu_poly != 0.0 and "uu" in pen.reg.slots:
            # elastic force f_i = (μ/τ) ∂_j (f·C_ij); for FENE-P
            # ∂_j f = f²/(L²−3)·∂_j tr C (chain rule on the closure)
            dpoly = [pen.d("poly", j) for j in range(3)]
            force = []
            for i in range(3):
                divC = sum(dpoly[j][self._idx[(i, j)]] for j in range(3))
                if fr is None:
                    force.append(divC)
                else:
                    gfr = [fr * fr / (self.fenep_L ** 2 - 3.0)
                           * (dpoly[j][0] + dpoly[j][3] + dpoly[j][5])
                           for j in range(3)]
                    force.append(fr * divC + sum(
                        gfr[j] * c(i, j) for j in range(3)))
            accumulate(df, "uu",
                       (self.mu_poly / self.tau_poly) * jnp.stack(force))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        C = jnp.zeros((6,) + spec.shape, grid.x.dtype)
        # identity conformation at equilibrium
        C = C.at[0].set(1.0).at[3].set(1.0).at[5].set(1.0)
        return {"poly": C}


@dataclass(frozen=True)
class HeatFlux(ModuleBase):
    name: ClassVar[str] = "heatflux"

    tau_q: float = 0.1          # relaxation (telegraph) time
    Kq: float = 1e-2            # conductivity

    def register(self, reg):
        reg.register("qq", 3, "pde", comps=("qx", "qy", "qz"))

    def rhs(self, pen, df, ts):
        qq = pen.field("qq")
        gTT = pen.glnTT() * pen.TT()
        out = -(qq + self.Kq * gTT) / self.tau_q
        accumulate(df, "qq", out)
        if "ss" in pen.reg.slots:
            divq = sum(pen.d("qq", a)[a] for a in range(3))
            accumulate(df, "ss", -divq * pen.rho1() * pen.TT1())
        ts.diffus(self.Kq / max(self.tau_q, 1e-10))


@dataclass(frozen=True)
class LorenzGauge(ModuleBase):
    name: ClassVar[str] = "lorenz_gauge"

    cgauge2: float = 1.0        # gauge wave speed squared

    def register(self, reg):
        reg.register("phi_lg", 1, "pde")

    def rhs(self, pen, df, ts):
        accumulate(df, "phi_lg", -self.cgauge2 * pen.diva())
        if "aa" in pen.reg.slots:
            accumulate(df, "aa", -pen.grad("phi_lg"))
        d1 = pen.dline_1()
        ts.advec2(self.cgauge2 * (d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2))


@dataclass(frozen=True)
class ActiveScalar(ModuleBase):
    name: ClassVar[str] = "ascalar"

    diffacc: float = 1e-3
    tau_cond: float = 1.0       # condensation relaxation
    acc_eq: float = 0.0         # equilibrium value
    init: str = "zero"
    ampl: float = 0.0
    kx: float = 1.0

    def register(self, reg):
        reg.register("acc", 1, "pde")

    def rhs(self, pen, df, ts):
        acc = pen.field("acc")
        out = (-pen.ugrad("acc") + self.diffacc * pen.del2s("acc")
               - (acc - self.acc_eq) / self.tau_cond)
        ts.diffus(self.diffacc)
        accumulate(df, "acc", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar
        return {"acc": init_scalar(self.init, grid, spec, eos, key,
                                   ampl=self.ampl, kx=self.kx, field="acc")}


@dataclass(frozen=True)
class CondensingScalar(ModuleBase):
    """Cloud-microphysics active scalar (reference ``src/ascalar.f90``
    with lcondensation_rate): evolves the water-vapor mixing ratio
    ``acc`` and (lttc) the condensation temperature ``ttc``:

      ssat = acc/q_vs(T) − 1,  q_vs = c₁·e^{−c₂/T}/(R_v·ρ_a·T)   (:449-451)
      C(x) = ssat·Σ_cell 4π(ρ_mat/ρ_a)·a_k·n_k·G                 (:4860)
      dacc/dt = −u·∇acc + D∇²acc − C                             (:381-386,442)
      dttc/dt = −u·∇ttc + D_T∇²ttc + C·L/c_p                     (:390-392,445)
      du_z/dt += g[(ttc−T_env)/ttc + (R_v/R_d−1)(acc−q_env)/acc − q_w]
                                                                  (:456-460)
      q_w = Σ_cell (4π/3)(ρ_mat/ρ_a)·a³·n                        (particles_
                                                        dust.f90:4862-4864)

    The particle deposits come from the pstate stashed in the pencil
    cache; the particle radius growth da/dt = G·ssat/a is applied by the
    particles module (particles_radius.f90:818)."""

    name: ClassVar[str] = "ascalar"

    ascalar_diff: float = 0.0
    thermal_diff: float = 0.0
    lttc: bool = False
    lttc_mean: bool = False
    lbuoyancy: bool = False
    lcondensation_rate: bool = False
    acc_const: float = 0.0
    ttc_const: float = 0.0
    latent_heat: float = 2.5e6
    cp_constant: float = 1005.0
    const1_qvs: float = 2.53e11
    const2_qvs: float = 5420.0
    Rv: float = 461.5
    rhoa: float = 1.0
    gravity_acceleration: float = 9.81
    Rv_over_Rd_minus_one: float = 0.608
    T_env: float = 293.0
    qv_env: float = 1e-2
    G_condensation: float = 0.0
    rhopmat: float = 1.0
    lupw: bool = False

    def register(self, reg):
        reg.register("acc", 1, "pde")
        if self.lttc:
            reg.register("ttc", 1, "pde")

    def init_fields(self, grid, spec, eos, key, cfg=None):
        import jax.numpy as jnp
        ones = jnp.ones(spec.shape, grid.x.dtype)
        out = {"acc": self.acc_const * ones}
        if self.lttc:
            out["ttc"] = self.ttc_const * ones
        return out

    # -- shared derived fields -------------------------------------------
    def qvs(self, ttc):
        import jax.numpy as jnp
        es = self.const1_qvs * jnp.exp(-self.const2_qvs
                                       / jnp.maximum(ttc, 1e-30))
        return es / (self.Rv * self.rhoa * jnp.maximum(ttc, 1e-30))

    def ssat_field(self, pen):
        import jax.numpy as jnp
        acc = pen.field("acc")
        ttc = pen.field("ttc") if "ttc" in pen.reg.slots \
            else jnp.full_like(acc, self.T_env)
        return acc / self.qvs(ttc) - 1.0

    def particle_deposits(self, pen, pstate):
        """(Σ 4π(ρmat/ρa)·a·n, Σ (4π/3)(ρmat/ρa)·a³·n) per cell — the
        NGP tauascalar / waterMixingRatio deposits
        (particles_dust.f90:4850-4880, ascalar_ngp)."""
        import jax.numpy as jnp
        from ..particles.interp import deposit
        gs = pen.cfg.grid
        ap = pstate["ap"]
        nsw = pstate.get("npswarm", jnp.ones_like(ap))
        pi4 = 4.0 * 3.141592653589793
        fac = pi4 * self.rhopmat / self.rhoa
        itau = deposit(fac * ap * nsw, pstate["xp"], gs, gs.shape, "ngp",
                       dtype=ap.dtype)
        qw = deposit((fac / 3.0) * ap ** 3 * nsw, pstate["xp"], gs,
                     gs.shape, "ngp", dtype=ap.dtype)
        return itau, qw

    def rhs(self, pen, df, ts):
        import jax.numpy as jnp
        acc = pen.field("acc")
        out = -pen.ugrad("acc", upwind=self.lupw)
        if self.ascalar_diff != 0.0:
            out = out + self.ascalar_diff * pen.del2s("acc")
            ts.diffus(self.ascalar_diff)
        dttc = None
        if "ttc" in pen.reg.slots:
            dttc = -pen.ugrad("ttc", upwind=self.lupw)
            if self.thermal_diff != 0.0:
                dttc = dttc + self.thermal_diff * pen.del2s("ttc")
                ts.diffus(self.thermal_diff)
        if self.lcondensation_rate:
            ssat = self.ssat_field(pen)
            pen._cache["ascalar_ssat"] = ssat
            pstate = pen._cache.get("_pstate")
            if pstate is not None and "ap" in pstate:
                itau, qw = self.particle_deposits(pen, pstate)
                crate = ssat * self.G_condensation * itau
                pen._cache["ascalar_crate"] = crate
                pen._cache["ascalar_qw"] = qw
                out = out - crate
                if dttc is not None:
                    dttc = dttc + crate * self.latent_heat \
                        / self.cp_constant
                if self.lbuoyancy and "uu" in pen.reg.slots \
                        and dttc is not None:
                    ttc = pen.field("ttc")
                    buoy = self.gravity_acceleration * (
                        (ttc - self.T_env) / jnp.maximum(ttc, 1e-30)
                        + self.Rv_over_Rd_minus_one
                        * (acc - self.qv_env) / jnp.maximum(acc, 1e-30)
                        - qw)
                    pen._cache["ascalar_buoy"] = buoy
                    duu = jnp.zeros((3,) + buoy.shape, buoy.dtype)
                    accumulate(df, "uu", duu.at[2].set(buoy))
        accumulate(df, "acc", out)
        if dttc is not None:
            accumulate(df, "ttc", dttc)
