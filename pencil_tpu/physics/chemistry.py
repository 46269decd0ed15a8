"""Reacting multispecies chemistry (reference ``src/chemistry.f90``, 6394
LoC: CHEMKIN-format Arrhenius networks, species advection-diffusion; the
acceptance sample ``samples/2d-tests/chemistry_GrayScott`` exercises a
2-species autocatalytic network).

Core implemented here: N species fields Y_k (mass fractions / concentrations)
with advection, Fickian diffusion, and a mass-action reaction network

    rate_r = A_r · T^β_r · exp(−Ea_r/T) · Π_k Y_k^{ν_k,r}
    dY_k/dt += Σ_r (ν'_k,r − ν_k,r) · rate_r

plus the Gray-Scott feed/kill preset (reaction='gray-scott': U + 2V → 3V
with feed F and kill k) used by the reference 2-D test.  Stiff-network
operator splitting (reference lsode_for_chemistry) is planned; the RK3
explicit path covers moderate stiffness."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Chemistry(ModuleBase):
    name: ClassVar[str] = "chemistry"

    species: Tuple[str, ...] = ("YU", "YV")
    # reactions: ((reactants), (products), A, beta, Ea) with
    # (name, stoich) pairs; empty tuple + preset for Gray-Scott
    reactions: tuple = ()
    preset: str = ""              # '' | 'gray-scott'
    feed: float = 0.04            # Gray-Scott F
    kill: float = 0.06            # Gray-Scott k
    diff: Tuple[float, ...] = (2e-5, 1e-5)
    ladvect: bool = True
    init: str = "zero"
    ampl: float = 0.0
    width: float = 0.1
    # 'innerbox' init (reference initcond.f90 innerbox): background
    # amplchemk(k), box value amplchemk2(k) inside |x|,|y|,|z| <= width
    ampl_k: Tuple[float, ...] = ()
    ampl2_k: Tuple[float, ...] = ()

    def register(self, reg):
        reg.register("chem", len(self.species), "pde", comps=self.species)

    def _Y(self, pen, k):
        return pen.field("chem")[k]

    def rhs(self, pen, df, ts):
        nsp = len(self.species)
        YY = pen.field("chem")
        out = [jnp.zeros_like(YY[0]) for _ in range(nsp)]
        if self.ladvect and "uu" in pen.reg.slots:
            uu = pen.uu()
            dY = [pen.d("chem", a) for a in range(3)]
            for k in range(nsp):
                out[k] = out[k] - sum(uu[a] * dY[a][k] for a in range(3))
        for k, Dk in enumerate(self.diff[:nsp]):
            if Dk > 0.0:
                out[k] = out[k] + Dk * sum(
                    pen.d2("chem", a)[k] for a in range(3))
                ts.diffus(Dk)
        if self.preset == "gray-scott":
            U, V = YY[0], YY[1]
            r = U * V * V
            out[0] = out[0] - r + self.feed * (1.0 - U)
            out[1] = out[1] + r - (self.feed + self.kill) * V
        for (reac, prod, A, beta, Ea) in self.reactions:
            rate = jnp.asarray(A, YY.dtype)
            if beta != 0.0 or Ea != 0.0:
                TT = pen.TT()
                rate = rate * TT ** beta * jnp.exp(-Ea / TT)
            net = {}
            for nm, st in reac:
                k = self.species.index(nm)
                # raw powers as in the reference (f**Sijm, no clamping —
                # integer exponents are safe for transiently negative Y)
                ist = int(st)
                rate = rate * (YY[k] ** ist if ist == st
                               else jnp.maximum(YY[k], 0.0) ** st)
                net[k] = net.get(k, 0.0) - st
            for nm, st in prod:
                k = self.species.index(nm)
                net[k] = net.get(k, 0.0) + st
            for k, coeff in net.items():
                out[k] = out[k] + coeff * rate
        accumulate(df, "chem", jnp.stack(out))

    def init_fields(self, grid, spec, eos, key, cfg=None):
        import jax
        nsp = len(self.species)
        shape = (nsp,) + spec.shape
        if self.init == "constant":
            # per-species uniform values amplchemk(k) (reference
            # chemistry.f90 init_chemistry 'constant')
            out = [jnp.full(spec.shape,
                            self.ampl_k[k] if k < len(self.ampl_k) else 0.0,
                            grid.x.dtype) for k in range(nsp)]
            return {"chem": jnp.stack(out)}
        if self.init == "innerbox":
            # reference sub innerbox: value ampl outside, ampl2 inside the
            # |x|,|y|,|z| <= width box (degenerate axes always inside)
            x, y, z = grid.xg, grid.yg, grid.zg
            inside = jnp.ones(spec.shape, bool)
            for c, n in ((x, spec.nx), (y, spec.ny), (z, spec.nz)):
                if n > 1:
                    inside = inside & (jnp.abs(c) <= self.width)
            out = []
            for k in range(nsp):
                a = self.ampl_k[k] if k < len(self.ampl_k) else 0.0
                a2 = self.ampl2_k[k] if k < len(self.ampl2_k) else 0.0
                out.append(jnp.where(inside, a2, a))
            return {"chem": jnp.stack(out).astype(grid.x.dtype)}
        if self.preset == "gray-scott" or self.init == "gray-scott-spot":
            # uniform U=1, V=0 with a perturbed central spot (the classic
            # Gray-Scott seeding, as in the reference 2-D test)
            x, y, z = grid.xg, grid.yg, grid.zg
            xc = spec.x0 + 0.5 * spec.Lx
            yc = spec.y0 + 0.5 * spec.Ly
            w = max(self.width, 1e-6)
            blob = jnp.exp(-((x - xc) ** 2 + (y - yc) ** 2) / (2 * w * w))
            blob = blob * jnp.ones(spec.shape, grid.x.dtype)
            U = 1.0 - 0.5 * blob
            V = 0.25 * blob
            return {"chem": jnp.stack([U, V])}
        return {"chem": self.ampl * jax.random.normal(key, shape,
                                                      grid.x.dtype)}
