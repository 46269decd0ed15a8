"""Multi-bin dust-grain number density with Smoluchowski coagulation
(reference ``src/dustdensity.f90``: mass-binned nd(k), ``dust_coagulation``
:2877-3066; mass grid from ``src/dustvelocity.f90:248-280``:
mdminus(k) = md0·δ^(k−1), mdplus(k) = md0·δ^k, md = midpoint).

The coagulation triangle loop becomes a static pair list (i ≤ j) with a
per-pair target bin:  dn_i −= K_ij n_i n_j,  dn_j −= K_ij n_i n_j,
dn_k += K_ij n_i n_j  where md_i+md_j ∈ [mdminus_k, mdplus_k).  With
``lmdvar`` each bin also evolves its mean grain mass md(k)
(dustdensity.f90:2923-2933) and routing uses the evolved masses.

Kernels ('kernel_cst'/'kernel_lin' initnd cases, dustdensity.f90:357-365):
K = dkern_cst or K_ij = dkern_cst·(md_i+md_j) — frozen at the initial
mass grid (lcalcdkern=.false.)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp
import numpy as np

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class DustBins(ModuleBase):
    name: ClassVar[str] = "dustbins"

    ndustspec: int = 1
    md0: float = 1.0
    deltamd: float = 1.2
    dkern_cst: float = 1.0
    coag_kernel: str = "cst"      # 'cst' | 'lin' (from initnd)
    nd0: float = 1.0
    mdave0: float = 1.0
    lmdvar: bool = False
    ldustcoagulation: bool = True
    # reference ndmin_for_mdvar (dustdensity.f90): below this the bin's
    # md is SET instead of evolved; we evolve smoothly with a floor
    ndmin_for_mdvar: float = 1e-30

    def _grid(self):
        k = np.arange(self.ndustspec)
        mdminus = self.md0 * self.deltamd ** k
        mdplus = self.md0 * self.deltamd ** (k + 1)
        return mdminus, mdplus, 0.5 * (mdminus + mdplus)

    def register(self, reg):
        n = self.ndustspec
        reg.register("nd", n, "pde",
                     comps=tuple(f"nd{k+1}" for k in range(n)))
        if self.lmdvar:
            reg.register("md", n, "pde",
                         comps=tuple(f"md{k+1}" for k in range(n)))

    def _pairs(self):
        """Static (ii, jj) upper-triangle index arrays + kernel values +
        static target bin (for .not. lmdvar)."""
        n = self.ndustspec
        mdminus, mdplus, md = self._grid()
        ii, jj = np.triu_indices(n)
        if self.coag_kernel == "lin":
            K = self.dkern_cst * (md[ii] + md[jj])
        else:
            K = np.full(ii.shape, self.dkern_cst)
        mtot = md[ii] + md[jj]
        # target bin: k with mdminus_k <= mtot < mdplus_k, else -1 (mass
        # beyond the grid is dropped, like the reference's failed search)
        kk = np.searchsorted(mdminus, mtot, side="right") - 1
        valid = (kk >= 0) & (mtot < mdplus[np.clip(kk, 0, n - 1)])
        kk = np.where(valid, kk, -1)
        return ii, jj, K, kk

    def rhs(self, pen, df, ts):
        if not self.ldustcoagulation:
            return
        nd = pen.field("nd")                       # (n, nx, ny, nz)
        n = self.ndustspec
        ii, jj, K, kk_static = self._pairs()
        ii_j = jnp.asarray(ii)
        jj_j = jnp.asarray(jj)
        K_j = jnp.asarray(K, nd.dtype)
        rate = K_j[:, None, None, None] * nd[ii_j] * nd[jj_j]  # (npair,...)
        out = jnp.zeros_like(nd)
        out = out.at[ii_j].add(-rate)
        out = out.at[jj_j].add(-rate)
        mdminus, mdplus, md_static = self._grid()
        if self.lmdvar:
            mdf = pen.field("md")
            mtot = mdf[ii_j] + mdf[jj_j]           # traced (npair, ...)
            # dynamic routing over the static mdminus edges
            edges = jnp.asarray(mdminus, nd.dtype)
            kk = jnp.clip(jnp.searchsorted(edges, mtot, side="right") - 1,
                          0, n - 1)
            valid = mtot < float(mdplus[-1])
            gain = jnp.where(valid, rate, 0.0)
            out = _scatter_bins(out, kk, gain)
            # md evolution (dustdensity.f90:2923-2933):
            # dmd_k/dt += (md_i+md_j − md_k)·gain/nd_k, accumulated per
            # target bin via the same one-hot scatter
            num = _scatter_bins(jnp.zeros_like(mdf), kk,
                                jnp.where(valid, rate * mtot, 0.0))
            den = _scatter_bins(jnp.zeros_like(mdf), kk, gain)
            ndsafe = jnp.maximum(nd, self.ndmin_for_mdvar)
            dmd = (num - mdf * den) / ndsafe
            accumulate(df, "md", dmd)
        else:
            kk = jnp.asarray(np.where(kk_static < 0, 0, kk_static))
            gain = jnp.where(jnp.asarray(kk_static >= 0)[
                :, None, None, None], rate, 0.0)
            out = out.at[kk].add(gain)
        accumulate(df, "nd", out)

    def init_fields(self, grid, spec, eos, key, cfg=None):
        n = self.ndustspec
        mdminus, mdplus, md = self._grid()
        shape = (n,) + spec.shape
        nd = np.zeros(shape)
        if self.coag_kernel == "cst":
            nd[0] = self.nd0
        else:
            prof = self.nd0 * (np.exp(-mdminus / self.mdave0)
                               - np.exp(-mdplus / self.mdave0))
            nd += prof[:, None, None, None]
        out = {"nd": jnp.asarray(nd)}
        if self.lmdvar:
            out["md"] = jnp.asarray(
                md[:, None, None, None] + np.zeros(shape))
        return out


def _scatter_bins(out, kk, vals):
    """out[k] += vals[p] where kk[p, x, y, z] selects the target bin per
    pair and grid point: one-hot contraction keeps it XLA-friendly for
    modest n·npair (the 0d coag tests are 1×1×1)."""
    import jax
    n = out.shape[0]
    oh = jax.nn.one_hot(kk, n, axis=-1, dtype=vals.dtype)
    # oh: (npair, nx, ny, nz, n); vals: (npair, nx, ny, nz)
    add = jnp.einsum("pxyzn,pxyz->nxyz", oh, vals)
    return out + add
