"""Radiative transfer by long characteristics (reference
``src/radiation_ray.f90``: ``radtransfer`` :555+ solves dI/dτ = S − I along
discrete ray directions, accumulates Q = ∫(I − S) dΩ into the heating aux
``Qrad``, and pipelines boundary intensities across ranks via
``radboundary_*`` — SURVEY.md §2.7).

TPU-native redesign: the along-ray integration is the linear recurrence
    I_n = e^{−δτ_n}·I_{n−1} + (1 − e^{−δτ_n})·S_n
which is evaluated with ``jax.lax.associative_scan`` over the ray axis —
the wavefront pipeline across ranks becomes a parallel scan on-chip (and,
sharded, XLA decomposes the scan with collectives).  Ray set: the six
axis-aligned directions (reference's minimal angular quadrature); weights
4π/6 each.

Source function S = arad·T⁴ (grey LTE); opacity κρ = kapparho_const or
kappa_es·ρ.  Heating enters the entropy equation as Q/(ρT)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax
import jax.numpy as jnp

from .base import ModuleBase, accumulate


def _ray_scan(S, dtau, axis, reverse=False):
    """I along one direction: associative scan of I ← a·I_prev + b with
    a = exp(−δτ), b = (1−a)·S.  Incoming boundary intensity = S at the
    first cell (thermalized boundary)."""
    a = jnp.exp(-dtau)
    b = (1.0 - a) * S

    def combine(x, y):
        ax_, bx = x
        ay, by = y
        return ax_ * ay, by + ay * bx

    a_s, b_s = jax.lax.associative_scan(combine, (a, b), axis=axis,
                                        reverse=reverse)
    # I0 = S at the upstream boundary
    if reverse:
        i0 = jax.lax.slice_in_dim(S, S.shape[axis] - 1, S.shape[axis],
                                  axis=axis)
    else:
        i0 = jax.lax.slice_in_dim(S, 0, 1, axis=axis)
    return a_s * i0 + b_s


@dataclass(frozen=True)
class RadiationRay(ModuleBase):
    name: ClassVar[str] = "radiation"

    arad: float = 1.0            # radiation constant in code units
    kapparho_const: float = 1.0  # grey opacity κρ (1/length)
    kappa_es: float = 0.0        # electron-scattering-like κ (×ρ)
    qrad_factor: float = 1.0     # coupling strength into the entropy eq

    def rhs(self, pen, df, ts):
        """Compute Qrad by ray sweeps and add Q/(ρT) to entropy."""
        TT = pen.TT()
        S = self.arad * TT ** 4
        if self.kappa_es > 0.0:
            krho = self.kappa_es * pen.rho()
        else:
            krho = self.kapparho_const
        g = pen.grid
        Q = 0.0
        for axis, inv in ((0, g.dx1), (1, g.dy1), (2, g.dz1)):
            dtau = krho / inv + jnp.zeros_like(S)
            for reverse in (False, True):
                ax = S.ndim - 3 + axis
                I = _ray_scan(S, dtau, ax, reverse)
                Q = Q + (I - S)
        Q = Q / 6.0  # angular mean over the 6-ray quadrature
        pen._cache["Qrad"] = Q
        if "ss" in pen.reg.slots:
            # ds/dt += 4π κρ Q/(ρT) (reference radiative_cooling)
            accumulate(df, "ss",
                       self.qrad_factor * krho * Q * pen.rho1() * pen.TT1())
            # radiative-diffusion-like CFL in optically thick regions:
            # χ_rad ≈ 4·arad·T³ / (κρ · ρ · cp)
            ts.diffus(self.qrad_factor * 4.0 * self.arad * TT ** 3
                      * pen.rho1() / jnp.maximum(krho, 1e-30) / pen.eos.cp)
