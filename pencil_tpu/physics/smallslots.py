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
    name: ClassVar[str] = "chiral"

    diffXX: float = 1e-3
    lambda5: float = 1.0      # chiral feedback coupling
    init: str = "const"
    ampl: float = 1e-2

    def register(self, reg):
        reg.register("XX_chiral", 1, "pde")
        reg.register("YY_chiral", 1, "pde")

    def rhs(self, pen, df, ts):
        XX = pen.field("XX_chiral")
        YY = pen.field("YY_chiral")
        outX = -pen.ugrad("XX_chiral") + self.diffXX * pen.del2s("XX_chiral")
        outY = -pen.ugrad("YY_chiral") + self.diffXX * pen.del2s("YY_chiral")
        if "aa" in pen.reg.slots:
            # chiral magnetic effect: E += −μ5 B (total chirality conserved:
            # transfer between X−Y and magnetic helicity)
            mu5 = XX - YY
            accumulate(df, "aa", self.lambda5 * mu5 * pen.bb())
            # back-reaction on μ5 via <J·B>-like overlap
            jb = sum(pen.jj()[a] * pen.bb()[a] for a in range(3))
            outX = outX - self.lambda5 * jb
            outY = outY + self.lambda5 * jb
        ts.diffus(self.diffXX)
        accumulate(df, "XX_chiral", outX)
        accumulate(df, "YY_chiral", outY)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        z = jnp.zeros(spec.shape, grid.x.dtype)
        return {"XX_chiral": z + self.ampl, "YY_chiral": z}


@dataclass(frozen=True)
class Polymer(ModuleBase):
    name: ClassVar[str] = "polymer"

    tau_poly: float = 1.0       # relaxation time
    mu_poly: float = 0.0        # elastic coupling to the flow
    diff_poly: float = 1e-4     # numerical diffusion of C
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

        out = []
        for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            # upper-convected: dC/dt = C·∇u + (∇u)ᵀ·C − (C − I)/τ − u·∇C
            stretch = sum(c(i, m) * uij[j, m] + c(j, m) * uij[i, m]
                          for m in range(3))
            relax = -(c(i, j) - (1.0 if i == j else 0.0)) / self.tau_poly
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
            # elastic force f_i = (μ/τ) ∂_j C_ij
            force = []
            for i in range(3):
                force.append(sum(
                    pen.d("poly", j)[self._idx[(i, j)]] for j in range(3)))
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
