"""Test-flow method (reference ``src/testflow_z.f90``, 2584 LoC — the
momentum-equation analog of the test-field method): extra LINEAR
momentum+enthalpy equations driven by prescribed mean flows Ū^q(z)
measure the turbulent (eddy) viscosity ν_t and the Λ (AKA) effect of a
given turbulence.

W11-W22 quartet (set_U0test_W11_W22):
    Ū¹ = W(cos kz, 0, 0)   Ū² = W(sin kz, 0, 0)
    Ū³ = W(0, cos kz, 0)   Ū⁴ = W(0, sin kz, 0)
Test equations (duutest_dt :610-900, SOCA: the quadratic test terms are
dropped; lsoca=False adds u·∇u^q + u^q·∇u minus its horizontal mean):
    ∂u^q/∂t = −∇h^q − u_z ∂_z Ū^q − (Ū^q·∇)u + ν_t∇²u^q  [+ fluct terms]
    ∂h^q/∂t = −cs²∇·u^q − (Ū^q·∇)h
The xy-averaged Reynolds-stress responses
    Q^q_ij(z) = <u_i u^q_j + u^q_i u_j>_xy
yield ν_t by the same sine/cosine quadrature the test-field method uses
for η_t: for Ū¹ ∝ cos kz, Q_xz ∝ ν_t·Wk·sin kz at leading order
(sign convention fixed empirically against the Roberts flow)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate

NTEST = 4


@dataclass(frozen=True)
class TestflowZ(ModuleBase):
    name: ClassVar[str] = "testflow"

    ktestflow: float = 1.0
    wamp: float = 1.0          # amplitude W of the test flows
    nutest: float = 1e-2
    cs0test: float = 1.0
    lsoca: bool = True

    def register(self, reg):
        ucomps = tuple(f"u{q+1}test{c}" for q in range(NTEST)
                       for c in "xyz")
        reg.register("uutest", 3 * NTEST, "pde", comps=ucomps)
        reg.register("hhtest", NTEST, "pde",
                     comps=tuple(f"h{q+1}test" for q in range(NTEST)))

    def mean_flows(self, pen):
        """Ū^q(z) and ∂_z Ū^q: each (comp, 1, 1, nz)-broadcastable."""
        k = self.ktestflow
        z = pen.grid.zg
        c = self.wamp * jnp.cos(k * z)
        s = self.wamp * jnp.sin(k * z)
        zero = jnp.zeros_like(c)
        U = [(c, zero, zero), (s, zero, zero),
             (zero, c, zero), (zero, s, zero)]
        gU = [(-k * s, zero, zero), (k * c, zero, zero),
              (zero, -k * s, zero), (zero, k * c, zero)]
        return U, gU

    def rhs(self, pen, df, ts):
        uu = pen.uu()
        cs2 = self.cs0test ** 2
        U, gU = self.mean_flows(pen)
        aij = jnp.stack([pen.d("uutest", j) for j in range(3)], axis=1)
        hgrads = jnp.stack([pen.d("hhtest", j) for j in range(3)], axis=1)
        del2u = pen.del2v("uutest")
        out_u = []
        out_h = []
        for q in range(NTEST):
            sl = slice(3 * q, 3 * q + 3)
            utq = pen.field("uutest")[sl]
            uij_q = aij[sl]                     # (3, 3, ...): ∂u^q_i/∂x_j
            gh = hgrads[q]                      # (3, ...): ∇h^q
            # −∇h^q + ν∇²u^q
            du = -gh + self.nutest * del2u[sl]
            # inhomogeneity: −u_z ∂_z Ū^q − (Ū^q·∇)u  (uij of the
            # PRIMARY turbulence; kinematic flows provide it analytically)
            hk = (pen.cfg.module("hydro_kinematic")
                  if pen.cfg is not None else None)
            if "uu" in pen.reg.slots:
                uij = jnp.stack([pen.d("uu", j) for j in range(3)],
                                axis=1)
            else:
                uij = hk.flow_uij(pen)
            Ugu = jnp.stack([
                sum(U[q][a] * uij[i, a] for a in range(3))
                for i in range(3)])
            ugU = jnp.stack([uu[2] * gU[q][i] for i in range(3)])
            du = du - ugU - Ugu
            if not self.lsoca:
                # fluctuating quadratic terms minus horizontal mean
                adv = jnp.stack([
                    sum(uu[a] * uij_q[i, a] + utq[a] * uij[i, a]
                        for a in range(3))
                    for i in range(3)])
                du = du - (adv - jnp.mean(adv, axis=(1, 2),
                                          keepdims=True))
            out_u.append(du)
            divq = uij_q[0, 0] + uij_q[1, 1] + uij_q[2, 2]
            dh = -cs2 * divq
            if "lnrho" in pen.reg.slots:
                glnr = pen.glnrho()
                dh = dh - cs2 * sum(U[q][a] * glnr[a] for a in range(3))
            out_h.append(dh)
        accumulate(df, "uutest", jnp.concatenate(out_u, axis=0))
        accumulate(df, "hhtest", jnp.stack(out_h))
        ts.diffus(self.nutest)


def turbulent_viscosity(model, state):
    """Extract ν_t and the AKA (Λ) diagonal from the stress responses
    (the analog of testfield's transport_coefficients)."""
    import numpy as np

    from ..parallel.halo import fill_ghosts
    from .pencils import Pencils

    cfg = model.cfg
    tf = cfg.module("testflow")
    fa = model.reg.stack(state["fields"])
    fg = fill_ghosts(fa[: model.reg.ncom], cfg.grid,
                     (cfg.bcx, cfg.bcy, cfg.bcz), model.reg, model.grid,
                     cfg, model.eos)
    pen = Pencils(fg, model.grid, model.reg, cfg, model.eos)
    uu = np.asarray(pen.uu(), np.float64)
    ut = np.asarray(state["fields"]["uutest"], np.float64)
    k = tf.ktestflow
    W = tf.wamp
    z = np.asarray(model.grid.interior(model.grid.z))
    c, s = np.cos(k * z), np.sin(k * z)

    def Q(q, i, j):
        uq = ut[3 * q:3 * q + 3]
        return (uu[i] * uq[j] + uq[i] * uu[j]).mean(axis=(0, 1))

    out = {}
    # Ū¹=W cos kz x̂: SOCA stress Q¹_xz = +ν_t W k sin kz;
    # Ū² picks the cosine phase — quadrature over the (1,2) pair, and
    # the (3,4) pair gives the yz response
    out["nut_x"] = float(np.mean(Q(0, 0, 2) * s - Q(1, 0, 2) * c)) \
        / (W * k) * 2.0
    out["nut_y"] = float(np.mean(Q(2, 1, 2) * s - Q(3, 1, 2) * c)) \
        / (W * k) * 2.0
    # AKA: in-phase response (Λ effect) — vanishes for mirror-symmetric
    # non-helical turbulence
    out["aka_x"] = float(np.mean(Q(0, 0, 2) * c + Q(1, 0, 2) * s)) \
        / W * 2.0
    out["aka_y"] = float(np.mean(Q(2, 1, 2) * c + Q(3, 1, 2) * s)) / W * 2.0
    out["nut"] = 0.5 * (out["nut_x"] + out["nut_y"])
    return out
