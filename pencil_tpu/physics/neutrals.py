"""Two-fluid partially ionized plasma (reference ``src/neutralvelocity.f90``
``duun_dt`` + ``src/neutraldensity.f90`` ``dlnrhon_dt``): a neutral fluid
(uun, ρ_n or lnρ_n) coupled to the ion/plasma fluid by collisional drag and
ionization/recombination:

    ionization    = ζ/ρ            recombination = α·ρ/ρ_n
    c_ions = colldrag + ζ/ρ        c_neut = colldrag + α·ρ/ρ_n
    ∂uun/∂t +=  c_neut·ρ  ·(u − u_n)        (neutralvelocity.f90:515-532)
    ∂u/∂t   −=  c_ions·ρ_n·(u − u_n)
    ∂ρ_n/∂t += −ζ·ρ_n + α·ρ²                (neutraldensity.f90:658-664)
    ∂ρ/∂t   += +ζ·ρ_n − α·ρ²

plus isothermal neutral pressure −csn₀²∇lnρ_n, advection, and optional
neutral viscosity.  This is the ambipolar-diffusion configuration of
``samples/1d-tests/ambipolar_diffusion``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Neutrals(ModuleBase):
    name: ClassVar[str] = "neutrals"

    csn0: float = 1.0          # isothermal neutral sound speed
    colldrag: float = 0.0      # collisional drag coefficient
    zeta: float = 0.0          # ionization rate
    alpha: float = 0.0         # recombination rate
    nun: float = 0.0           # neutral viscosity
    electron_pressure: float = 0.0  # ion momentum gains this multiple of
                                    # the pressure force (lelectron_pressure)
    lnolog: bool = False       # evolve rhon (lneutraldensity_nolog)
    rhon0: float = 1.0         # initial constant neutral density
    init: str = "zero"
    initn: str = "const_rhon"  # neutral density init
    ampl: float = 0.0
    kx: float = 1.0

    def register(self, reg):
        reg.register("uun", 3, "pde", comps=("unx", "uny", "unz"))
        reg.register("rhon" if self.lnolog else "lnrhon", 1, "pde")

    def _rhon(self, pen):
        if self.lnolog:
            return pen.field("rhon")
        return jnp.exp(pen.field("lnrhon"))

    def rhs(self, pen, df, ts):
        uun = pen.field("uun")
        uijn = jnp.stack([pen.d("uun", j) for j in range(3)], axis=1)
        ugun = jnp.stack([
            sum(uun[j] * uijn[a, j] for j in range(3)) for a in range(3)
        ])
        rhon = self._rhon(pen)
        if self.lnolog:
            grhon = pen.grad("rhon")
            glnrhon = grhon / jnp.maximum(rhon, 1e-30)
        else:
            glnrhon = pen.grad("lnrhon")
        out_u = -ugun - self.csn0 ** 2 * glnrhon

        # drag + ionization/recombination momentum coupling
        if "uu" in pen.reg.slots and (self.colldrag > 0.0 or self.zeta > 0.0
                                      or self.alpha > 0.0):
            uu = pen.uu()
            rho = pen.rho()
            rho1 = pen.rho1()
            c_neut = self.colldrag + self.alpha * rho / jnp.maximum(
                rhon, 1e-30)
            c_ions = self.colldrag + self.zeta * rho1
            du = uu - uun
            out_u = out_u + c_neut * rho * du
            accumulate(df, "uu", -c_ions * rhon * du)
            if self.electron_pressure != 0.0 and pen.eos is not None:
                # +electron_pressure·fpres (neutralvelocity.f90:528-531)
                fpres = -pen.cs2() * pen.glnrho()
                accumulate(df, "uu", self.electron_pressure * fpres)
            # (the reference adds no explicit CFL term for the coupling
            # frequency — neutralvelocity.f90 only accumulates advec/visc)
        if self.nun > 0.0:
            out_u = out_u + self.nun * pen.del2v("uun")
            ts.diffus(self.nun)
        accumulate(df, "uun", out_u)

        divun = uijn[0, 0] + uijn[1, 1] + uijn[2, 2]
        # continuity + mass exchange
        if self.lnolog:
            out_n = (-sum(uun[a] * grhon[a] for a in range(3))
                     - rhon * divun)
        else:
            out_n = -sum(uun[a] * glnrhon[a] for a in range(3)) - divun
        if self.zeta > 0.0 or self.alpha > 0.0:
            rho = pen.rho()
            gas = self.zeta * rhon - self.alpha * rho * rho
            if self.lnolog:
                out_n = out_n - gas
            else:
                out_n = out_n - gas / jnp.maximum(rhon, 1e-30)
            if "rho" in pen.reg.slots:
                accumulate(df, "rho", gas)
            elif "lnrho" in pen.reg.slots:
                accumulate(df, "lnrho", gas * pen.rho1())
        accumulate(df, "rhon" if self.lnolog else "lnrhon", out_n)

        d1 = pen.dline_1()
        ts.advec(sum(jnp.abs(uun[a]) * d1[a] for a in range(3)))
        ts.advec2(self.csn0 ** 2 * (d1[0] ** 2 + d1[1] ** 2 + d1[2] ** 2))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_scalar, init_vector
        out = {"uun": init_vector(self.init, grid, spec, eos, key,
                                  ampl=self.ampl, kx=self.kx)}
        const = init_scalar("zero", grid, spec, eos, key)
        if self.lnolog:
            out["rhon"] = const + self.rhon0
        else:
            import math
            out["lnrhon"] = const + math.log(self.rhon0)
        return out
