"""Temperature-based energy equation (reference
``src/temperature_idealgas.f90``, 3223 LoC — the ENERGY slot variant that
evolves lnTT instead of entropy):

    DlnT/Dt = −(γ−1)∇·u + (1/cv T)[∇·(K∇T) + 2νρS² + ...]  /ρ

The EOS closure switches automatically: with an 'lnTT' slot present,
cs² = (γ−1)·cp·T directly (see Pencils.cs2/lnTT overrides below)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


def heatcond_hole(TT, Kmax, Kmin, Tbump, slope, width):
    """Radiative conductivity "hole" profile K(T) (reference
    src/implicit_physics.f90 heatcond_TT :820-840, kappa-mechanism setup):
    K dips from Kmax to Kmin in a band of ``width`` around Tbump.
    Returns (K, dK/dT)."""
    import jax.numpy as jnp
    import math
    alpha = (Kmax - Kmin) / (math.pi / 2.0 + math.atan(slope * width ** 2))
    tmp = slope * (TT - Tbump - width) * (TT - Tbump + width)
    K = Kmax + alpha * (-math.pi / 2.0 + jnp.arctan(tmp))
    dK = 2.0 * alpha / (1.0 + tmp * tmp) * slope * (TT - Tbump)
    return K, dK


@dataclass(frozen=True)
class TemperatureIdealGas(ModuleBase):
    name: ClassVar[str] = "temperature"

    chi: float = 0.0            # χ = K/(ρcp) constant heat diffusivity
    hcond0: float = 0.0         # constant conductivity K (iheatcond='K-const')
    chi_hyper3: float = 0.0
    lviscosity_heat: bool = True
    lupw_lnTT: bool = False
    TT_const: float = 0.0       # 'const_TT' init value
    heat_const: float = 0.0     # uniform volumetric heating per unit mass
    lnolog: bool = False        # evolve TT itself (ltemperature_nolog)
    # radiative-conduction hole profile + ADI implicit solve (the
    # kappa-mechanism setup, samples/1d-tests/implicit_diffusion)
    lADI: bool = False          # conduction solved implicitly post-step
    Fbot: float = 0.0
    Kmax: float = 0.0
    Kmin: float = 0.0
    Tbump: float = 0.0
    hole_slope: float = 0.0
    hole_width: float = 0.0
    init: str = "zero"
    init2: str = ""             # second stacked init (reference ninit)
    ampl: float = 0.0
    ampl2: float = 0.0
    radius: float = 0.1         # blob radius (radius_lnTT default)
    center1_z: float = 0.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    width: float = 0.05

    @property
    def _slot(self):
        return "TT" if self.lnolog else "lnTT"

    def register(self, reg):
        reg.register(self._slot, 1, "pde")
        if self.lADI:
            reg.register("TTold", 1, "aux")

    def hcond(self, TT):
        return heatcond_hole(TT, self.Kmax, self.Kmin, self.Tbump,
                             self.hole_slope, self.hole_width)

    def before_timestep(self, state, grid, cfg, reg, eos, dt, t, key,
                        it=None):
        if self.lADI:
            # stash T at step start (reference run.f90: f(iTTold)=f(iTT))
            state = dict(state)
            state["TTold"] = state[self._slot]
        return state

    def after_timestep(self, state, grid, cfg, reg, eos, dt, t, key,
                       it=None):
        """Implicit Crank–Nicolson radiative conduction (reference
        ADI_Kprof_1d, src/implicit_physics.f90:672-734; z-only 1-D case)."""
        if not self.lADI:
            return state
        import jax
        import jax.numpy as jnp
        if cfg.grid.nx != 1 or cfg.grid.ny != 1:
            raise NotImplementedError("lADI: 1-D (z) configuration only")
        nz = cfg.grid.nz
        dz = cfg.grid.Lz / max(nz - 1, 1)
        TTn = state[self._slot][0, 0, :]       # post-explicit-step T
        TTo = state["TTold"][0, 0, :]
        # the reference's boundconds WRITE f at the boundary plane each pde
        # call (cT pins the top temperature persistently); mirror that here
        TTtop = eos.cs20 / ((eos.gamma - 1.0) * eos.cp)
        TTo = TTo.at[-1].set(TTtop)
        TTn = TTn.at[-1].set(TTtop)
        rho = jnp.exp(state["lnrho"][0, 0, :]) \
            if "lnrho" in state else state["rho"][0, 0, :]
        source = (TTn - TTo) / dt
        # ghosted TT_old with the ADI boundary closure
        # (boundary_ADI: bottom c3 constant flux, top cT)
        K0, _ = self.hcond(TTo[0])
        lo = TTo[1] + 2.0 * dz * self.Fbot / K0          # dT/dz=-Fbot/K
        hi = 2.0 * TTo[-1] - TTo[-2]                     # constant T
        TTg = jnp.concatenate([lo[None], TTo, hi[None]])
        K, dK = self.hcond(TTg)
        wz = dt * (1.0 / dz ** 2) * eos.gamma / eos.cp / rho
        Kj = K[1:-1]
        Kp = K[2:] + Kj
        Km = Kj + K[:-2]
        a = -wz / 4.0 * (Km - dK[:-2] * (TTg[1:-1] - TTg[:-2]))
        b = 1.0 - wz / 4.0 * (-Kp - Km + dK[1:-1]
                              * (TTg[2:] - 2.0 * TTg[1:-1] + TTg[:-2]))
        c = -wz / 4.0 * (Kp + dK[2:] * (TTg[2:] - TTg[1:-1]))
        rhs = (wz / 2.0 * (Kp * (TTg[2:] - TTg[1:-1])
                           - Km * (TTg[1:-1] - TTg[:-2]))
               + dt * source)
        # boundary rows (reference :698-707): top row identity; bottom row
        # dWork/dz = 0 for c3 (b=1, c=-1), identity for cT
        a = a.at[0].set(0.0).at[nz - 1].set(0.0)
        b = b.at[0].set(1.0).at[nz - 1].set(1.0)
        c = c.at[0].set(-1.0).at[nz - 1].set(0.0)
        rhs = rhs.at[0].set(0.0).at[nz - 1].set(0.0)
        work = jax.lax.linalg.tridiagonal_solve(
            a.astype(jnp.float32), b.astype(jnp.float32),
            c.astype(jnp.float32), rhs.astype(jnp.float32)[:, None])[:, 0]
        TT_new = TTo + work.astype(TTo.dtype)
        state = dict(state)
        state[self._slot] = TT_new[None, None, :]
        return state

    def rhs(self, pen, df, ts):
        eos = pen.eos
        if self.lnolog:
            # DT/Dt = −u·∇T − (γ−1)T∇·u + heats/cv (conduction via ADI)
            TT = pen.field("TT")
            out = -pen.ugrad("TT", upwind=self.lupw_lnTT)
            if "lnrho" in pen.reg.slots or "rho" in pen.reg.slots:
                # PdV work gated on ldensity like the reference
                # (temperature_idealgas.f90:1299 — Boussinesq carries none)
                out = out - (eos.gamma - 1.0) * TT * pen.divu()
            heat = pen._cache.get("visc_heat")
            if heat is not None and self.lviscosity_heat:
                out = out + heat / eos.cv
            if self.chi > 0.0:
                # TT version of chi-const: γχ(∇lnρ·∇T + ∇²T)
                # (temperature_idealgas.f90:2078-2122)
                gT = pen.grad("TT")
                glnrho = pen.glnrho()
                gdot = sum(gT[a] * glnrho[a] for a in range(3))
                out = out + eos.gamma * self.chi * (pen.del2s("TT") + gdot)
                ts.diffus(self.chi * eos.gamma)
            if self.hcond0 > 0.0:
                # K-const TT version: γK/(ρcp)·∇²T
                # (temperature_idealgas.f90:2179-2226)
                chix = eos.gamma * self.hcond0 * pen.rho1() / eos.cp
                out = out + chix * pen.del2s("TT")
                ts.diffus(chix)
            if not self.lADI and self.Kmax > 0.0:
                # explicit hole-profile conduction ∇·(K∇T)/(ρ cv)
                K, dK = self.hcond(TT)
                gT = pen.grad("TT")
                gT2 = gT[0] ** 2 + gT[1] ** 2 + gT[2] ** 2
                div = K * pen.del2s("TT") + dK * gT2
                out = out + div * pen.rho1() / eos.cv
                ts.diffus(jnp.max(K) * pen.rho1() / eos.cv)
            accumulate(df, "TT", out)
            return
        out = -pen.ugrad("lnTT", upwind=self.lupw_lnTT)
        out = out - (eos.gamma - 1.0) * pen.divu()
        if self.chi > 0.0:
            glnTT = pen.grad("lnTT")
            glnrho = pen.glnrho()
            gdot = sum(glnTT[a] * (glnTT[a] + glnrho[a]) for a in range(3))
            out = out + eos.gamma * self.chi * (pen.del2s("lnTT") + gdot)
            ts.diffus(self.chi * eos.gamma)
        if self.hcond0 > 0.0:
            # K-const lnTT version: γK/(ρcp)·(∇lnT·∇lnT + ∇²lnT)
            # (temperature_idealgas.f90:2211-2214)
            glnTT = pen.grad("lnTT")
            g2 = sum(glnTT[a] ** 2 for a in range(3))
            chix = eos.gamma * self.hcond0 * pen.rho1() / eos.cp
            out = out + chix * (g2 + pen.del2s("lnTT"))
            ts.diffus(chix)
        if self.chi_hyper3 > 0.0:
            out = out + self.chi_hyper3 * pen.del6s_scaled("lnTT")
            ts.diffus3(self.chi_hyper3)
        heat = pen._cache.get("visc_heat")
        if heat is not None and self.lviscosity_heat:
            out = out + heat / eos.cv * pen.TT1()
        ohm = pen._cache.get("ohmic_heat")
        if ohm is not None:
            out = out + ohm / eos.cv * pen.rho1() * pen.TT1()
        if self.heat_const != 0.0:
            out = out + self.heat_const / eos.cv * pen.TT1()
        accumulate(df, "lnTT", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        import jax.numpy as jnp
        import numpy as np
        if self.init == "rad_equil":
            # radiative+hydrostatic equilibrium, integrated top→bottom
            # (reference temperature_idealgas.f90:1926-1990 rad_equil)
            grav = cfg.module("gravity") if cfg else None
            gravz = grav.gravz if grav else -1.0
            nz = spec.nz
            dz = spec.Lz / max(nz - 1, 1)
            gm1 = eos.gamma - 1.0
            temp = np.empty(nz)
            lnrho = np.empty(nz)
            temp[nz - 1] = eos.cs20 / gm1
            lnrho[nz - 1] = eos.lnrho0

            def K_of(T):
                K, _ = heatcond_hole(np.asarray(T), self.Kmax, self.Kmin,
                                     self.Tbump, self.hole_slope,
                                     self.hole_width)
                return float(K)

            dtemp = self.Fbot / K_of(temp[nz - 1])
            temp[nz - 2] = temp[nz - 1] + dz * dtemp
            dlnrho = (-eos.gamma / gm1 * gravz - dtemp) / temp[nz - 1]
            lnrho[nz - 2] = lnrho[nz - 1] + dz * dlnrho
            for i in range(nz - 2, 0, -1):        # 0-based: fills i-1
                dtemp = self.Fbot / K_of(temp[i])
                temp[i - 1] = temp[i + 1] + 2.0 * dz * dtemp
                dlnrho = (-eos.gamma / gm1 * gravz - dtemp) / temp[i]
                lnrho[i - 1] = lnrho[i + 1] + 2.0 * dz * dlnrho
            ones = jnp.ones(spec.shape, grid.z.dtype)
            TT = jnp.asarray(temp, grid.z.dtype)[None, None, :] * ones
            lnr = jnp.asarray(lnrho, grid.z.dtype)[None, None, :] * ones
            if self.init2 == "blob_hs":
                # hydrostatic blob: +blob on T, −blob on lnrho (reference
                # temperature_idealgas.f90:745-751)
                fact = 1.0 / self.radius ** 2
                blob = self.ampl2 * (
                    jnp.exp(-fact * grid.xg ** 2)
                    * jnp.exp(-fact * grid.yg ** 2)
                    * jnp.exp(-fact * (grid.zg - self.center1_z) ** 2))
                TT = TT + blob
                lnr = lnr - blob
            out = {"lnrho": lnr}
            out["TT" if self.lnolog else "lnTT"] = \
                TT if self.lnolog else jnp.log(TT)
            return out
        if self.init == "nothing":
            # reference initlnTT default: f stays 0 (for Boussinesq the TT
            # slot is the deviation from the background, which starts 0)
            return {self._slot: jnp.zeros(spec.shape, grid.z.dtype)}
        if self.init == "const_TT":
            # uniform T = TT_const (temperature_idealgas.f90 init 'const_TT')
            TT = jnp.full(spec.shape, self.TT_const, grid.z.dtype)
            if self.lnolog:
                return {"TT": TT}
            return {"lnTT": jnp.log(jnp.maximum(TT, 1e-30))}
        from .initcond import init_scalar
        base = init_scalar(self.init, grid, spec, eos, key, ampl=self.ampl,
                           kx=self.kx, ky=self.ky, kz=self.kz,
                           width=self.width, field="lnTT")
        if self.lnolog:
            return {"TT": jnp.exp(base + eos.lnTT0)}
        return {"lnTT": base + eos.lnTT0}
