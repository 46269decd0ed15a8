"""Mean-field EMF from precomputed transport-coefficient tensors
(reference ``src/special/meanfield_e_tensor.f90``).

The reference reads per-point tensors (alpha_ij, beta_ij, gamma_i,
delta_i, kappa_ijk, umean_i, acoef_ij, bcoef_ijk) from
``data/emftensors.h5`` (written by test-field runs or by
``samples/meanfield_special_e_tensor/create_emftensors.py``) and adds

    E = alpha·B + gamma×B − beta·J − delta×J − kappa:(∇B)_sym + Umean×B

to dA/dt (meanfield_e_tensor.f90:1226-1443 calc_pencils_special;
:1856-1885 special_calc_magnetic: ``df(iax:iaz) += emf``).  With
``lusecoefs`` the raw acoef/bcoef pair is used instead:
E = acoef·B + bcoef:∇B (f90:1877-1882).

TPU-native design: the tensors are small per-run constants, so they are
loaded once host-side (HDF5 via h5py, or built analytically for the
dataset names ``create_emftensors.py`` generates, e.g. ``isotropic``) and
closed over the jitted step as broadcastable jnp constants — XLA folds
the contraction into the fused RHS.  The 'none' time interpolation of the
reference (emf_interpolate takes the FIRST time plane, f90:2370-2378) is
the only mode the shipped samples use and the only one implemented.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import ClassVar

import numpy as np
import jax.numpy as jnp

from ..base import accumulate
from . import Special, register_special


def _analytic(coef, dataset, rank):
    """Datasets create_emftensors.py can generate without a run dir.

    'isotropic' for a rank-2 coefficient is value*delta_ij with value=1
    (samples/meanfield_special_e_tensor/create_emftensors.py
    values=np.diag([1,1,1])); rank-1/3 datasets named 'zero' are zeros.
    """
    if rank == 2 and dataset in ("isotropic", "identity"):
        return np.eye(3).reshape(3, 3, 1, 1, 1)
    if dataset in ("zero", "nothing", ""):
        shape = (3,) * rank + (1, 1, 1)
        return np.zeros(shape)
    raise NotImplementedError(
        f"meanfield_e_tensor: no emftensors.h5 and no analytic form for "
        f"{coef}/{dataset}")


@register_special("meanfield_e_tensor")
@dataclass(frozen=True, eq=False)
class MeanfieldETensor(Special):
    name: ClassVar[str] = "meanfield_e_tensor"

    lalpha: bool = False
    lbeta: bool = False
    lgamma: bool = False
    ldelta: bool = False
    lkappa: bool = False
    lumean: bool = False
    lacoef: bool = False
    lbcoef: bool = False
    lusecoefs: bool = False
    alpha_name: str = "isotropic"
    beta_name: str = "isotropic"
    gamma_name: str = "zero"
    delta_name: str = "zero"
    kappa_name: str = "zero"
    umean_name: str = "zero"
    acoef_name: str = "zero"
    bcoef_name: str = "zero"
    alpha_scale: float = 1.0
    beta_scale: float = 1.0
    gamma_scale: float = 1.0
    delta_scale: float = 1.0
    kappa_scale: float = 1.0
    umean_scale: float = 1.0
    acoef_scale: float = 1.0
    bcoef_scale: float = 1.0
    emftensors_file: str = "emftensors.h5"
    rundir: str = ""

    # ---- tensor loading --------------------------------------------------
    def _load(self, coef, dataset, scale, rank):
        """Return coefficient as (3,..,nx|1,ny|1,nz|1) numpy array."""
        path = None
        for cand in (os.path.join(self.rundir, "data", self.emftensors_file),
                     os.path.join(self.rundir, self.emftensors_file)):
            if self.rundir and os.path.exists(cand):
                path = cand
                break
        if path is None:
            data = _analytic(coef, dataset, rank)
        else:
            import h5py
            with h5py.File(path, "r") as h5:
                ds = h5[f"emftensor/{coef}/{dataset}"]
                # dims are (coef..., z, y, x, t) — create_emftensors.py
                # labelDataset; take the first time plane ('none' interp)
                data = np.asarray(ds[..., 0])
            # (..., z, y, x) -> (..., x, y, z)
            data = np.moveaxis(data, (-3, -2, -1), (-1, -2, -3))
        return scale * data

    def _coef(self, key, rank):
        cache = self.__dict__.setdefault("_coef_cache", {})
        if key not in cache:
            cache[key] = self._load(
                key, getattr(self, f"{key}_name"),
                getattr(self, f"{key}_scale"), rank)
        return cache[key]

    # ---- EMF -------------------------------------------------------------
    def emf(self, pen):
        bb = pen.bb()
        dt = bb.dtype
        emf = jnp.zeros_like(bb)
        if self.lusecoefs:
            if self.lacoef:
                a = jnp.asarray(self._coef("acoef", 2), dt)
                emf = emf + jnp.einsum("ij...,j...->i...", a, bb)
            if self.lbcoef:
                b = jnp.asarray(self._coef("bcoef", 3), dt)
                bij = pen.bij()
                emf = emf + jnp.einsum("ijk...,jk...->i...", b, bij)
            if self.lumean:
                u = jnp.asarray(self._coef("umean", 1), dt)
                emf = emf + jnp.cross(u, bb, axis=0)
            return emf
        if self.lalpha:
            a = jnp.asarray(self._coef("alpha", 2), dt)
            emf = emf + jnp.einsum("ij...,j...->i...", a, bb)
        if self.lbeta:
            b = jnp.asarray(self._coef("beta", 2), dt)
            emf = emf - jnp.einsum("ij...,j...->i...", b, pen.jj())
        if self.lgamma:
            g = jnp.asarray(self._coef("gamma", 1), dt)
            emf = emf + jnp.cross(jnp.broadcast_to(g, bb.shape), bb, axis=0)
        if self.ldelta:
            d = jnp.asarray(self._coef("delta", 1), dt)
            jj = pen.jj()
            emf = emf - jnp.cross(jnp.broadcast_to(d, bb.shape), jj, axis=0)
        if self.lkappa:
            k = jnp.asarray(self._coef("kappa", 3), dt)
            bij = pen.bij()
            bsym = 0.5 * (bij + jnp.swapaxes(bij, 0, 1))
            emf = emf - jnp.einsum("ijk...,jk...->i...", k, bsym)
        if self.lumean:
            u = jnp.asarray(self._coef("umean", 1), dt)
            emf = emf + jnp.cross(jnp.broadcast_to(u, bb.shape), bb, axis=0)
        return emf

    def rhs(self, pen, df, ts):
        if "aa" not in pen.reg.slots:
            return
        accumulate(df, "aa", self.emf(pen))
        # beta acts as extra (possibly anisotropic) diffusivity for dt
        if self.lbeta:
            b = np.asarray(self._coef("beta", 2))
            ts.diffus(float(np.max(np.abs(b))))


# ---- diagnostics ----------------------------------------------------------
from ...io.diagnostics import DIAG_REGISTRY, _vmean, _vrms  # noqa: E402


def _emf_of(pen):
    sp = pen.cfg.module("meanfield_e_tensor")
    return None if sp is None else sp.emf(pen)


def _reg_emf_diags():
    def emfrms(pen, st):
        e = _emf_of(pen)
        return _vrms(pen, jnp.sum(e * e, axis=0))

    def alpharms(pen, st):
        sp = pen.cfg.module("meanfield_e_tensor")
        a = jnp.asarray(sp._coef("alpha", 2), pen.bb().dtype)
        bb = pen.bb()
        ae = jnp.einsum("ij...,j...->i...", a, bb)
        return _vrms(pen, jnp.sum(ae * ae, axis=0))

    DIAG_REGISTRY.setdefault("emfrms", emfrms)
    DIAG_REGISTRY.setdefault("alpharms", alpharms)
    for i, c in enumerate("xyz"):
        def emfmax(pen, st, i=i):
            return jnp.max(jnp.abs(_emf_of(pen)[i]))
        DIAG_REGISTRY.setdefault(f"emf{c}max", emfmax)


_reg_emf_diags()
