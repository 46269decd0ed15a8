"""Test-field method (reference ``src/test_methods/testfield_z.f90``;
SURVEY.md §2.5 TESTFIELD): measures the turbulent transport tensors α_ij,
η_ij of a given flow by evolving extra *linear* induction equations

    ∂a^q/∂t = u × b^q + η_test ∇²a^q ,   b^q = ∇×a^q + B̄^q(z)

for a set of prescribed mean fields B̄^q.  Standard z-dependent quartet
(ktestfield = k):
    B̄¹ = B₀(cos kz, 0, 0)   B̄² = B₀(sin kz, 0, 0)
    B̄³ = B₀(0, cos kz, 0)   B̄⁴ = B₀(0, sin kz, 0)
The xy-averaged EMFs ε^q(z) = <u×b^q>_xy then yield
    α_i1 = (2/B₀)<ε^1_i cos kz + ε^2_i sin kz>_z          (i = x,y)
    η_i1 = (2/(B₀k))<−ε^1_i sin kz + ε^2_i cos kz>_z  (η-tensor contraction)
and columns 2 from the (3,4) pair.  Diagnostics: alp11, alp21, alp12,
alp22, eta11, eta21 (reference rprint_testfield names).

The test solutions are periodically rescaled (reference daainit) to stop
secular growth from contaminating the linear measurement."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp

from .base import ModuleBase, accumulate

NTEST = 4


@dataclass(frozen=True)
class TestfieldZ(ModuleBase):
    name: ClassVar[str] = "testfield"

    ktestfield: float = 1.0
    B0: float = 1.0
    etatest: float = 1e-2
    daainit: float = 0.0       # rescale interval in time units (0 = off)
    rescale_aatest: float = 0.0  # rescale factor (0 = zero out)
    # SOCA: keep only u×B̄ in the test equations; lsoca=False adds the
    # fluctuating EMF u×b − <u×b>_xy (testfield_z.f90 daatest_dt)
    lsoca: bool = True
    # η-tensor convention (testfield_general.f90:63 default .true.):
    # with leta_rank2 the eta_ij diagnostics contract against J̄ (quartet
    # swap + sign flip vs the rank-3 eta_ij3 convention,
    # testfield_z.f90:1068-1073 vs :1166-1177)
    leta_rank2: bool = True

    def register(self, reg):
        comps = tuple(f"a{q+1}test{c}" for q in range(NTEST) for c in "xyz")
        reg.register("aatest", 3 * NTEST, "pde", comps=comps)

    def mean_fields(self, pen):
        """B̄^q(z): (NTEST, 3, 1, 1, nz) broadcastable."""
        k = self.ktestfield
        z = pen.grid.zg
        c, s = self.B0 * jnp.cos(k * z), self.B0 * jnp.sin(k * z)
        zero = jnp.zeros_like(c)
        return [
            (c, zero, zero), (s, zero, zero),
            (zero, c, zero), (zero, s, zero),
        ]

    def rhs(self, pen, df, ts):
        uu = pen.uu()
        aij = jnp.stack([pen.d("aatest", j) for j in range(3)], axis=1)
        # aij: (12, 3, nx, ny, nz) → per test field q: rows 3q..3q+2
        out = []
        bmean = self.mean_fields(pen)
        del2 = pen.del2v("aatest")
        emfs = []
        for q in range(NTEST):
            sl = slice(3 * q, 3 * q + 3)
            aq = aij[sl]  # (3, 3, nx, ny, nz): ∂a_i/∂x_j
            bf = [                       # fluctuating response ∇×a^q
                aq[2, 1] - aq[1, 2],
                aq[0, 2] - aq[2, 0],
                aq[1, 0] - aq[0, 1],
            ]

            def cross(b):
                return jnp.stack([
                    uu[1] * b[2] - uu[2] * b[1],
                    uu[2] * b[0] - uu[0] * b[2],
                    uu[0] * b[1] - uu[1] * b[0],
                ])

            uxB = cross(bmean[q])        # drive by the mean test field
            uxbf = cross(bf)             # fluctuating EMF (measured)
            emfs.append(uxbf)
            if self.lsoca:
                out.append(uxB + self.etatest * del2[sl])
            else:
                # full test equation (testfield_z.f90 lsoca=F): the
                # fluctuating EMF enters minus its horizontal mean
                out.append(uxB + uxbf
                           - jnp.mean(uxbf, axis=(1, 2), keepdims=True)
                           + self.etatest * del2[sl])
        pen._cache["testfield_emf"] = emfs
        accumulate(df, "aatest", jnp.concatenate(out, axis=0))
        ts.diffus(self.etatest)

    def after_timestep(self, fields, grid, cfg, reg, eos, dt, t, key, it=None):
        if self.daainit <= 0:
            return fields
        # rescale when t crosses a multiple of daainit (traced-safe)
        phase = jnp.mod(t, self.daainit)
        trigger = phase < dt
        fac = jnp.where(trigger, self.rescale_aatest, 1.0)
        fields = dict(fields)
        fields["aatest"] = fields["aatest"] * fac
        return fields


@dataclass(frozen=True)
class TestfieldXZ(ModuleBase):
    """Test-field method with x- AND z-dependent mean fields (reference
    ``src/test_methods/testfield_xz.f90`` + the shared machinery in
    ``testfield_general.f90``).

    itestfield='1': nine test fields B^(p,q) — component p ∈ {x,y,z},
    profile q ∈ {cx·cz, sx·cz, cx·sz} with cx = cos(kx(x+xx0)) etc.
    (set_bbtest, testfield_xz.f90:295-317).  Evolution (rhs_daatest,
    testfield_general.f90:520-576):

        ∂a^q/∂t = η_t ∇²a^q + u'×B^q + (U×b^q − <U×b^q>_y)

    with u' = u − ū_xz (the y-averaged mean flow) and U the FULL
    velocity.  The y-averaged EMFs E_i^q(x,z) = <U×b^q>_y are inverted
    point-wise with the analytic matrix Minv (calc_inverse_matrix,
    testfield_general.f90:615-660) into α_ij(x,z) and η_ijk(x,z), whose
    volume means are the alp{ij} / eta{ijk} diagnostics
    (calc_coefficients :90-140)."""

    name: ClassVar[str] = "testfield_xz"

    ktestfield_x: float = 1.0
    ktestfield_z: float = 1.0
    xx0: float = 0.0
    zz0: float = 0.0
    etatest: float = 1e-2
    lsoca: bool = False

    def register(self, reg):
        comps = tuple(f"a{q+1}txz{c}" for q in range(9) for c in "xyz")
        reg.register("aatest", 27, "pde", comps=comps)

    def _trig(self, pen):
        kx, kz = self.ktestfield_x, self.ktestfield_z
        x = pen.grid.xg            # (nx,1,1)
        z = pen.grid.zg            # (1,1,nz)
        return (jnp.cos(kx * (x + self.xx0)), jnp.sin(kx * (x + self.xx0)),
                jnp.cos(kz * (z + self.zz0)), jnp.sin(kz * (z + self.zz0)))

    def bbtest(self, pen, q):
        cx, sx, cz, sz = self._trig(pen)
        prof = (cx * cz, sx * cz, cx * sz)[q % 3]
        comp = q // 3
        vec = [jnp.zeros_like(prof), jnp.zeros_like(prof),
               jnp.zeros_like(prof)]
        vec[comp] = prof
        return vec

    def emf_ymean(self, pen):
        """<U×b^q>_y: (9, 3, nx, 1, nz) with the FULL velocity
        (testfield_after_boundary, testfield_xz.f90:195-260)."""
        if "txz_emf" in pen._cache:
            return pen._cache["txz_emf"]
        uu = pen.uu()
        aij = jnp.stack([pen.d("aatest", j) for j in range(3)], axis=1)
        out = []
        for q in range(9):
            aq = aij[3 * q:3 * q + 3]
            b = (aq[2, 1] - aq[1, 2], aq[0, 2] - aq[2, 0],
                 aq[1, 0] - aq[0, 1])
            uxb = jnp.stack([
                uu[1] * b[2] - uu[2] * b[1],
                uu[2] * b[0] - uu[0] * b[2],
                uu[0] * b[1] - uu[1] * b[0],
            ])
            out.append(jnp.mean(uxb, axis=2, keepdims=True))
        res = jnp.stack(out)
        pen._cache["txz_emf"] = res
        return res

    def minv_row(self, pen, row):
        """Row of the analytic inversion matrix (itestfield='1',
        testfield_general.f90:649-656), broadcastable over (nx,1,nz)."""
        cx, sx, cz, sz = self._trig(pen)
        kx, kz = self.ktestfield_x, self.ktestfield_z
        cx1, cz1 = 1.0 / cx, 1.0 / cz
        if row == 0:
            return ((1.0 - sx ** 2 - sz ** 2) * cx1 * cz1,
                    sx * cz1, sz * cx1)
        if row == 1:
            return (-sx * cz1 / kx, cx * cz1 / kx,
                    jnp.zeros_like(sx * cz1))
        return (-sz * cx1 / kz, jnp.zeros_like(sz * cx1), cz * cx1 / kz)

    def rhs(self, pen, df, ts):
        uu = pen.uu()
        uum = jnp.mean(uu, axis=2, keepdims=True)   # ū_xz (y-average)
        ufl = uu - uum
        del2 = pen.del2v("aatest")
        aij = jnp.stack([pen.d("aatest", j) for j in range(3)], axis=1)
        emfm = self.emf_ymean(pen) if not self.lsoca else None
        out = []
        for q in range(9):
            sl = slice(3 * q, 3 * q + 3)
            aq = aij[sl]
            bf = [aq[2, 1] - aq[1, 2], aq[0, 2] - aq[2, 0],
                  aq[1, 0] - aq[0, 1]]
            B = self.bbtest(pen, q)
            uxB = jnp.stack([
                ufl[1] * B[2] - ufl[2] * B[1],
                ufl[2] * B[0] - ufl[0] * B[2],
                ufl[0] * B[1] - ufl[1] * B[0],
            ])
            term = uxB + self.etatest * del2[sl]
            if self.lsoca:
                term = term + jnp.stack([
                    uum[1] * bf[2] - uum[2] * bf[1],
                    uum[2] * bf[0] - uum[0] * bf[2],
                    uum[0] * bf[1] - uum[1] * bf[0],
                ])
            else:
                uxb = jnp.stack([
                    uu[1] * bf[2] - uu[2] * bf[1],
                    uu[2] * bf[0] - uu[0] * bf[2],
                    uu[0] * bf[1] - uu[1] * bf[0],
                ])
                term = term + uxb - emfm[q]
            out.append(term)
        accumulate(df, "aatest", jnp.concatenate(out, axis=0))
        ts.diffus(self.etatest)


def transport_coefficients(model, state):
    """Extract (alpha, eta) tensors' measured columns from the current
    state: returns dict alp11, alp21, alp12, alp22, eta11, eta21."""
    import numpy as np
    from ..parallel.halo import fill_ghosts
    from ..physics.pencils import Pencils

    cfg = model.cfg
    tf = cfg.module("testfield")
    fa = model.reg.stack(state["fields"])
    fg = fill_ghosts(fa[: model.reg.ncom], cfg.grid,
                     (cfg.bcx, cfg.bcy, cfg.bcz), model.reg, model.grid,
                     cfg, model.eos)
    pen = Pencils(fg, model.grid, model.reg, cfg, model.eos)
    df = {}
    from .base import TimestepAccum
    tf.rhs(pen, df, TimestepAccum())
    emfs = pen._cache["testfield_emf"]
    k = tf.ktestfield
    z = np.asarray(model.grid.interior(model.grid.z))
    c, s = np.cos(k * z), np.sin(k * z)
    # xy-average each emf: (3, nz)
    e = [np.asarray(jnp.mean(emf, axis=(1, 2))) for emf in emfs]
    out = {}
    B0 = tf.B0
    for i, nm in ((0, "1"), (1, "2")):
        out[f"alp{nm}1"] = 2.0 / B0 * np.mean(e[0][i] * c + e[1][i] * s)
        out[f"alp{nm}2"] = 2.0 / B0 * np.mean(e[2][i] * c + e[3][i] * s)
        out[f"eta{nm}1"] = 2.0 / (B0 * k) * np.mean(-e[0][i] * s + e[1][i] * c)
        out[f"eta{nm}2"] = 2.0 / (B0 * k) * np.mean(-e[2][i] * s + e[3][i] * c)
    # scalar turbulent coefficients in the usual E = αB̄ − η_t µ0 J̄ form:
    # the eta columns above are w.r.t. dB̄/dz, which is J̄ rotated by 90°
    # in (x,y) — for B̄∥x̂, E_y = +η_t k sin kz ⇒ eta21 = −c·η_t and the
    # y-quartet gives eta12 = +c·η_t, so η_t ∝ (eta12 − eta21)/2.
    out["alphat"] = 0.5 * (out["alp11"] + out["alp22"])
    out["etat"] = 0.5 * (out["eta12"] - out["eta21"])
    return out
