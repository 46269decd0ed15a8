"""Fluid dust (reference ``src/dustvelocity.f90`` + ``src/dustdensity.f90``:
per-bin dust velocity uud and number density nd as a pressureless second
fluid with Epstein drag, optionally back-reacting on the gas):

    ∂uud/∂t = −(uud·∇)uud − (uud − u)/τ_s + g + ν_d ∇²uud
    ∂lnnd/∂t = −uud·∇lnnd − ∇·uud + D_d(∇²lnnd + |∇lnnd|²)

One bin in this version (ndustspec=1); the reference's multi-bin
coagulation network (Smoluchowski) is planned."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class DustFluid(ModuleBase):
    name: ClassVar[str] = "dust"

    tausd: float = 1.0         # stopping time
    nud: float = 0.0           # dust viscosity (numerical)
    nud_hyper3: float = 0.0    # iviscd='hyper3-simplified'
    diffnd: float = 0.0        # number-density diffusion
    diffnd_hyper3: float = 0.0          # idiffd='hyper3lnnd'
    diffnd_anisotropic: tuple = (0.0, 0.0, 0.0)  # 'simplified-anisotropic'
    eps_dtog: float = 0.0      # mean dust-to-gas ratio (back-reaction)
    ldragforce_gas: bool = False  # momentum-conserving drag on the gas
    # short-stopping-time approximation (reference
    # ldustvelocity_shorttausd, dustvelocity.f90:1071-1097): uud is
    # algebraically slaved to its terminal value u + τ·(cs²∇lnρ − J×B/ρ)
    # instead of being evolved — no uud PDE slot, no τ CFL constraint
    lshorttausd: bool = False
    lnolog_nd: bool = False
    nd_const: float = 1.0   # initnd='const_nd' value
    lgravz: bool = False
    gravz: float = 0.0
    init: str = "zero"
    ampl: float = 0.0
    ampluud: float = 0.0       # inituud amplitude (e.g. 'linear-z')
    inituud: str = "zero"
    kx: float = 1.0

    def register(self, reg):
        if not self.lshorttausd:
            reg.register("uud", 3, "pde", comps=("udx", "udy", "udz"))
        reg.register("nd" if self.lnolog_nd else "lnnd", 1, "pde")

    def _slaved_uud(self, pen):
        uu = pen.uu()
        acc = 0.0
        if "lnrho" in pen.reg.slots or "rho" in pen.reg.slots:
            acc = acc + pen.cs2() * pen.glnrho()
        if "aa" in pen.reg.slots:
            acc = acc - pen.jxbr()
        if self.lgravz and self.gravz != 0.0:
            z3 = jnp.zeros_like(uu)
            acc = acc + z3.at[2].add(self.gravz)
        return uu + self.tausd * acc

    def rhs(self, pen, df, ts):
        if self.lshorttausd:
            uud = self._slaved_uud(pen)
            self._rhs_nd(pen, df, ts, uud, divud=None)
            d1 = pen.dline_1()
            ts.advec(sum(jnp.abs(uud[a]) * d1[a] for a in range(3)))
            return
        uud = pen.field("uud")
        # dust advection (pressureless)
        uijd = jnp.stack([pen.d("uud", j) for j in range(3)], axis=1)
        ugud = jnp.stack([
            sum(uud[j] * uijd[a, j] for j in range(3)) for a in range(3)
        ])
        out_u = -ugud
        tausd1 = 1.0 / self.tausd
        if "uu" in pen.reg.slots:
            uu = pen.uu()
            out_u = out_u - (uud - uu) * tausd1
            if self.ldragforce_gas:
                # mass-weighted drag on the gas: (m_d·n_d/ρ)(ud−u)/τ_s
                # (dustvelocity.f90 ldragforce_gas, md=1)
                epsl = jnp.exp(pen.field("lnnd")) * pen.rho1()
                accumulate(df, "uu", epsl * (uud - uu) * tausd1)
            elif self.eps_dtog > 0.0:
                # momentum-conserving back-reaction on the gas:
                # ρ_d = ε·ρ̄·exp(lnnd); force/mass on gas = ε_local·(ud−u)/τ
                epsl = self.eps_dtog * jnp.exp(pen.field("lnnd")) \
                    * pen.rho1() * jnp.exp(pen.eos.lnrho0 if pen.eos else 0.0)
                accumulate(df, "uu", epsl * (uud - uu) * tausd1)
        grav = pen.cfg.module("gravity") if pen.cfg is not None else None
        if grav is not None and hasattr(grav, "gvec"):
            # external gravity acts on the dust too (dustvelocity.f90
            # duud_dt gravity block)
            out_u = out_u + grav.gvec(pen)
        elif self.lgravz and self.gravz != 0.0:
            zero = jnp.zeros_like(uud[0])
            out_u = out_u + jnp.stack([zero, zero, self.gravz + zero])
        if self.nud > 0.0:
            out_u = out_u + self.nud * pen.del2v("uud")
            ts.diffus(self.nud)
        if self.nud_hyper3 > 0.0:
            out_u = out_u + self.nud_hyper3 * pen.del6v_scaled("uud")
            ts.diffus3(self.nud_hyper3)
        accumulate(df, "uud", out_u)

        divud = uijd[0, 0] + uijd[1, 1] + uijd[2, 2]
        self._rhs_nd(pen, df, ts, uud, divud)

        d1 = pen.dline_1()
        ts.advec(sum(jnp.abs(uud[a]) * d1[a] for a in range(3)))

    def _rhs_nd(self, pen, df, ts, uud, divud=None):
        if self.lnolog_nd:
            # conservative continuity for nd itself (ldustdensity_log=F):
            # dnd/dt = −∇·(nd·uud); slaved uud has no stored derivatives,
            # so build div(nd·ud) from product-rule pencils
            nd = pen.field("nd")
            gnd = pen.grad("nd")
            if divud is None:
                # slaved mode: ud = u + τ·a_rel → div ud ≈ div u + τ·(...)
                # with τ ≤ 1e-6 the correction to DIVERGENCE is O(τ·∇a),
                # far below f32 resolution — use div u (reference computes
                # the full derivative of the slaved field numerically)
                divud = pen.divu()
            out_n = -sum(uud[a] * gnd[a] for a in range(3)) - nd * divud
            if self.diffnd_hyper3 > 0.0:
                out_n = out_n + self.diffnd_hyper3 * pen.del6s_scaled("nd")
                ts.diffus3(self.diffnd_hyper3)
            if self.diffnd > 0.0:
                out_n = out_n + self.diffnd * pen.del2s("nd")
                ts.diffus(self.diffnd)
            accumulate(df, "nd", out_n)
            return
        if divud is None:
            divud = pen.divu()
        glnnd = pen.grad("lnnd")
        out_n = -sum(uud[a] * glnnd[a] for a in range(3)) - divud
        if self.diffnd > 0.0:
            g2 = sum(glnnd[a] ** 2 for a in range(3))
            out_n = out_n + self.diffnd * (pen.del2s("lnnd") + g2)
            ts.diffus(self.diffnd)
        if self.diffnd_hyper3 > 0.0:
            # idiffd='hyper3lnnd': D₃∇⁶lnnd (dustdensity.f90)
            out_n = out_n + self.diffnd_hyper3 * pen.del6s_scaled("lnnd")
            ts.diffus3(self.diffnd_hyper3)
        if any(c != 0.0 for c in self.diffnd_anisotropic):
            # 'simplified-anisotropic' Fickian per-axis on lnnd:
            # Σ_j D_j(∂²_j lnnd + (∂_j lnnd)²)
            out_n = out_n + sum(
                self.diffnd_anisotropic[a]
                * (pen.d2("lnnd", a)[0] + glnnd[a] ** 2) for a in range(3))
            d1 = pen.dline_1()
            dxyz2 = sum(d1[a] ** 2 for a in range(3))
            ts.diffus(sum(self.diffnd_anisotropic[a] * d1[a] ** 2
                          for a in range(3)) / dxyz2)
        accumulate(df, "lnnd", out_n)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar, init_vector
        zero = jnp.zeros(spec.shape, grid.z.dtype)
        if self.inituud == "linear-z":
            uud = jnp.stack([zero, zero, self.ampluud * grid.zg + zero])
        elif self.inituud in ("zero", "nothing"):
            uud = jnp.stack([zero, zero, zero])
        else:
            uud = init_vector(self.inituud, grid, spec, eos, key,
                              ampl=self.ampluud, kx=self.kx)
        if self.init == "const_nd":
            # nd = nd_const (dustdensity.f90 'const_nd')
            lnnd = zero + jnp.log(jnp.maximum(self.nd_const, 1e-300))
        elif self.init in ("zero", "nothing", "gaussian_nd"):
            # gaussian_nd is installed by the IC plug-in (dust-equilibrium)
            # or left at lnnd = 0 / nd = 1
            lnnd = zero
        else:
            lnnd = init_scalar(self.init, grid, spec, eos, key,
                               ampl=self.ampl, kx=self.kx)
        out = {}
        if not self.lshorttausd:
            out["uud"] = uud
        if self.lnolog_nd:
            out["nd"] = jnp.exp(lnnd)
        else:
            out["lnnd"] = lnnd
        return out
