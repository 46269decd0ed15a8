"""Radiative transfer by long characteristics (reference
``src/radiation_ray.f90``: ``radtransfer`` :555+ solves dI/dτ = S − I along
discrete ray directions, accumulates Q = ∫(I − S) dΩ into the heating aux
``Qrad``, and pipelines boundary intensities across ranks via
``radboundary_*`` — SURVEY.md §2.7).

TPU-native redesign: the along-ray integration is the linear recurrence
    I_n = e^{−δτ_n}·I_{n−1} + (1 − e^{−δτ_n})·S_n
evaluated with ``jax.lax.associative_scan`` over the ray axis.  Across a
SHARDED ray axis the reference's rank relay (upstream boundary intensity
received, axpy'd, sent downstream — src/mpicomm.f90:2424-2703) becomes:
per-shard prefix scan with zero inflow, all_gather of each shard's
(A, B) transfer planes, and an in-order static composition that hands
every shard its true incoming intensity — an 8-device mesh reproduces
the single-device sweep exactly.

Periodic rays use the reference's geometric closed form
(radboundary_yz_periodic_ray, src/mpicomm.f90:2655): the self-consistent
inflow of a closed loop is I = B_tot/(1 − A_tot).

Frequency bins: per-bin opacity and quadrature weight, Q = Σ_b w_b·Q_b
(reference nnu bins in radiation_ray.f90).

Source function S = arad·T⁴ (grey LTE); opacity κρ = kapparho_const or
kappa_es·ρ.  Heating enters the entropy equation as Q/(ρT)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp

from .base import ModuleBase, accumulate


def _combine(x, y):
    ax_, bx = x
    ay, by = y
    return ax_ * ay, by + ay * bx


def _face(arr, axis, last):
    n = arr.shape[axis]
    return (jax.lax.slice_in_dim(arr, n - 1, n, axis=axis) if last
            else jax.lax.slice_in_dim(arr, 0, 1, axis=axis))


def _ray_sweep(S, dtau, axis, reverse, periodic, mesh_name=None, psize=1):
    """Intensity along one signed axis direction, correct across shards.

    With ``periodic`` the inflow is the closed-loop solution
    B/(1−A); otherwise the upstream boundary is thermalized (I_in = S at
    the first upstream cell — reference bc_rad 'S')."""
    ax = axis  # caller passes the ARRAY axis
    a = jnp.exp(-dtau)
    b = (1.0 - a) * S
    a_s, b_s = jax.lax.associative_scan(_combine, (a, b), axis=ax,
                                        reverse=reverse)
    # shard transfer function: I_out = At·I_in + Bt (downstream face)
    At = _face(a_s, ax, last=not reverse)
    Bt = _face(b_s, ax, last=not reverse)
    S_up = _face(S, ax, last=reverse)    # upstream boundary cell's S

    if mesh_name is not None and psize > 1:
        # relay: gather every shard's transfer planes and compose them
        # in ray order (static loop — psize is small)
        Ag = jax.lax.all_gather(At, mesh_name)        # (psize, ..., 1, ..)
        Bg = jax.lax.all_gather(Bt, mesh_name)
        Sg = jax.lax.all_gather(S_up, mesh_name)
        idx = jax.lax.axis_index(mesh_name)
        order = list(range(psize)) if not reverse \
            else list(range(psize - 1, -1, -1))
        Acum = jnp.ones_like(Ag[0])
        Bcum = jnp.zeros_like(Bg[0])
        myA = jnp.ones_like(Ag[0])
        myB = jnp.zeros_like(Bg[0])
        for p in order:
            sel = (idx == p)
            myA = jnp.where(sel, Acum, myA)
            myB = jnp.where(sel, Bcum, myB)
            Acum, Bcum = Acum * Ag[p], Bg[p] + Ag[p] * Bcum
        if periodic:
            I_bc = Bcum / jnp.maximum(1.0 - Acum, 1e-30)
        else:
            I_bc = Sg[order[0]]
        I_in = myA * I_bc + myB
    else:
        if periodic:
            I_in = Bt / jnp.maximum(1.0 - At, 1e-30)
        else:
            I_in = S_up
    return a_s * I_in + b_s


@dataclass(frozen=True)
class RadiationRay(ModuleBase):
    name: ClassVar[str] = "radiation"

    arad: float = 1.0            # radiation constant in code units
    kapparho_const: float = 1.0  # grey opacity κρ (1/length)
    kappa_es: float = 0.0        # electron-scattering-like κ (×ρ)
    qrad_factor: float = 1.0     # coupling strength into the entropy eq
    bc_rad: str = "S"            # 'S' thermalized inflow | 'p' periodic
    # frequency bins (reference nnu): per-bin opacity multiplier and
    # quadrature weight; empty → single grey bin
    kappa_bins: tuple = ()
    weight_bins: tuple = ()

    def _bins(self):
        if not self.kappa_bins:
            return ((1.0, 1.0),)
        w = self.weight_bins or (1.0 / len(self.kappa_bins),) \
            * len(self.kappa_bins)
        return tuple(zip(self.kappa_bins, w))

    def rhs(self, pen, df, ts):
        """Compute Qrad by ray sweeps and add Q/(ρT) to entropy."""
        TT = pen.TT()
        S = self.arad * TT ** 4
        if self.kappa_es > 0.0:
            krho0 = self.kappa_es * pen.rho()
        else:
            krho0 = self.kapparho_const
        g = pen.grid
        names = pen.mesh_axis_names or (None, None, None)
        spec = pen.cfg.grid if pen.cfg is not None else None
        Q = 0.0
        krho_eff = 0.0
        for kfac, wbin in self._bins():
            krho = krho0 * kfac
            Qb = 0.0
            for axis, inv in ((0, g.dx1), (1, g.dy1), (2, g.dz1)):
                dtau = krho / inv + jnp.zeros_like(S)
                ax = S.ndim - 3 + axis
                periodic = (self.bc_rad == "p"
                            and (spec is None or spec.periodic[axis]))
                for reverse in (False, True):
                    I = _ray_sweep(S, dtau, ax, reverse, periodic,
                                   names[axis], pen.mesh_shape[axis])
                    Qb = Qb + (I - S)
            Q = Q + wbin * Qb / 6.0   # angular mean over the 6-ray set
            krho_eff = krho_eff + wbin * krho
        pen._cache["Qrad"] = Q
        if "ss" in pen.reg.slots:
            # ds/dt += 4π κρ Q/(ρT) (reference radiative_cooling)
            accumulate(df, "ss",
                       self.qrad_factor * krho_eff * Q * pen.rho1()
                       * pen.TT1())
            # radiative-diffusion-like CFL in optically thick regions:
            # χ_rad ≈ 4·arad·T³ / (κρ · ρ · cp)
            ts.diffus(self.qrad_factor * 4.0 * self.arad * TT ** 3
                      * pen.rho1() / jnp.maximum(krho_eff, 1e-30)
                      / pen.eos.cp)
