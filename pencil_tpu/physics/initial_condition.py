"""Initial-condition plug-in slot (reference ``src/initial_condition/``:
65 user plug-ins implementing initial_condition_uu/lnrho/ss/aa hooks,
selected by ``INITIAL_CONDITION = initial_condition/<name>`` in
Makefile.local).

The plug-in runs AFTER the per-module inits and overrides their fields.
Registry entries are ``fn(grid, spec, eos, cfg, params) -> {field: array}``.

Implemented plug-ins:
  * 'kelvin_helmholtz' — double shear layer with density contrast
    (reference src/initial_condition/kelvin_helmholtz.f90: bands at
    y ∈ [0,.25,.5,.75,1] with exponential smoothing ``lsmooth``, ux = ±0.5,
    ρ = 1↔2, seed uy = 0.01·sin(4πx); the 2d-tests/Kelvin-Helmholtz golden)
  * 'fluxring' — a circular magnetic flux ring in the (x,y) plane.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, ClassVar, Dict

import jax.numpy as jnp
import numpy as np

from .base import ModuleBase

IC_REGISTRY: Dict[str, Callable] = {}


def register_ic(name):
    def deco(fn):
        IC_REGISTRY[name] = fn
        return fn
    return deco


def _bands(y, v1, v2, lsmooth):
    """Reference kelvin_helmholtz band profile: value v1 in the outer
    quarters, v2 in the middle half, exponentially smoothed at the four
    interfaces.  y is wrapped into (0, 1] (the reference grid is half-cell
    shifted and never hits y = 0; ours isn't)."""
    ls = max(lsmooth, 1e-9)
    y = jnp.where(y <= 0.0, y + 1.0, y)
    out = jnp.where(
        (y > 0.0) & (y <= 0.25),
        v1 - 0.5 * (v1 - v2) * jnp.exp((y - 0.25) / ls),
        jnp.where(
            (y > 0.25) & (y <= 0.5),
            v2 + 0.5 * (v1 - v2) * jnp.exp((-y + 0.25) / ls),
            jnp.where(
                (y > 0.5) & (y <= 0.75),
                v2 + 0.5 * (v1 - v2) * jnp.exp(-(0.75 - y) / ls),
                v1 - 0.5 * (v1 - v2) * jnp.exp(-(y - 0.75) / ls),
            ),
        ),
    )
    return out


@register_ic("kelvin_helmholtz")
def ic_kelvin_helmholtz(grid, spec, eos, cfg, params):
    lsmooth = float(params.get("lsmooth", 0.025))
    x, y = grid.xg, grid.yg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    ux = _bands(y, 0.5, -0.5, lsmooth) * ones
    uy = 0.01 * jnp.sin(4.0 * np.pi * x) * ones
    uz = jnp.zeros_like(ux)
    rho = _bands(y, 1.0, 2.0, lsmooth) * ones
    out = {"uu": jnp.stack([ux, uy, uz])}
    den = cfg.module("density")
    if den is not None and getattr(den, "lnolog", False):
        out["rho"] = rho
    else:
        out["lnrho"] = jnp.log(rho)
    if cfg.module("entropy") is not None and eos is not None:
        # isobaric start (reference initial_condition_ss): p = p0 uniform,
        # T = p0/((cp−cv)ρ), then s from the ideal-gas inversion
        TT0 = eos.cs20 / eos.cp / (eos.gamma - 1.0)
        lnTT = jnp.log(TT0 * eos.rho0 / rho)  # T/T0 = rho0/rho at p = p0
        lnTT0 = jnp.log(TT0)
        ss = eos.cp / eos.gamma * (
            (lnTT - lnTT0) - (eos.gamma - 1.0) * (jnp.log(rho) - eos.lnrho0))
        out["ss"] = ss * jnp.ones(spec.shape, grid.x.dtype)
    return out


@register_ic("fluxring")
def ic_fluxring(grid, spec, eos, cfg, params):
    """A_z = ampl·exp(−(ϖ−R)²/w²) → a magnetic flux ring of radius R."""
    ampl = float(params.get("ampl", 1e-3))
    R = float(params.get("radius", 0.3 * min(spec.Lx, spec.Ly)))
    w = float(params.get("width", 0.1 * R))
    xc = spec.x0 + 0.5 * spec.Lx
    yc = spec.y0 + 0.5 * spec.Ly
    x, y = grid.xg, grid.yg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    varpi = jnp.sqrt((x - xc) ** 2 + (y - yc) ** 2)
    az = ampl * jnp.exp(-((varpi - R) / w) ** 2) * ones
    zero = jnp.zeros_like(az)
    return {"aa": jnp.stack([zero, zero, az])}


@dataclass(frozen=True)
class InitialCondition(ModuleBase):
    name: ClassVar[str] = "initial_condition"

    plugin: str = ""
    params: tuple = ()   # (("lsmooth", 0.025), ...) — hashable param pairs

    def init_fields(self, grid, spec, eos, key, cfg=None):
        fn = IC_REGISTRY.get(self.plugin)
        if fn is None:
            raise KeyError(f"unknown initial_condition plugin "
                           f"{self.plugin!r}; known: {sorted(IC_REGISTRY)}")
        return fn(grid, spec, eos, cfg, dict(self.params))


@register_ic("shallow_water_init")
def ic_shallow_water_init(grid, spec, eos, cfg, params):
    """Shallow-water initial states (reference
    src/initial_condition/shallow_water_init.f90): 'solid-body' rotation
    u = Ω×r (+ the balanced gh profile), 'gaussian-blob' geopotential."""
    x, y = grid.xg, grid.yg
    dtype = grid.x.dtype
    ones = jnp.ones(spec.shape, dtype)
    sw = cfg.module("shallow_water") if cfg else None
    Om = float(params.get("omega_sb", sw.Omega_SB if sw else 1.0))
    gam = float(params.get("gamma_parameter",
                           sw.gamma_parameter if sw else 1.0))
    eta0 = float(params.get("eta0", 0.0))
    out = {}
    hydro = str(params.get("init_shallow_hydro", "nothing"))
    if hydro == "solid-body":
        ux = -Om * y * ones
        uy = Om * x * ones
        out["uu"] = jnp.stack([ux, uy, jnp.zeros_like(ux)])
    dens = str(params.get("init_shallow_density", "nothing"))
    if dens == "solid-body":
        r2 = x ** 2 + y ** 2
        out["rho"] = (eta0 + Om ** 2 * r2
                      * (1.5 - 0.25 * gam / Om * r2)) * ones
    elif dens == "gaussian-blob":
        k_eta = float(params.get("k_eta", 1.0))
        x0 = float(params.get("x0_drop", 0.0))
        y0 = float(params.get("y0_drop", 0.0))
        out["rho"] = eta0 * jnp.exp(
            -k_eta * ((x - x0) ** 2 + (y - y0) ** 2)) * ones
    return out


@register_ic("Rayleigh-Taylor")
def ic_rayleigh_taylor(grid, spec, eos, cfg, params):
    """Rayleigh–Taylor setup (reference
    src/initial_condition/Rayleigh-Taylor.f90): heavy-over-light tanh
    density interface in hydrostatic + isobaric-entropy balance, seeded by
    a single uz mode."""
    import numpy as np
    ampluu = float(params.get("ampluu", 0.0))
    w = float(params.get("widthrho", 1.0))
    x, z = grid.xg, grid.zg
    ones = jnp.ones(spec.shape, grid.x.dtype)
    grav = cfg.module("gravity") if cfg else None
    gz = grav.gravz if grav else -0.1
    dz = spec.Lz / max(spec.nz - 1, 1)
    dd = 6.0 * dz
    uz = (ampluu / 4.0) * (1 + jnp.cos(2 * np.pi * x / spec.Lx)) \
        * (1 + jnp.cos(2 * np.pi * z / spec.Lz)) * ones
    rhoprof = (w / 2.0) * (jnp.tanh(z / dd) + 1.0) + eos.rho0
    P0 = eos.rho0 * eos.cs20 / eos.gamma
    Pprof = (P0 + gz * (w / 2.0 + eos.rho0) * z
             + gz * (w / 2.0) * dd * jnp.log(jnp.cosh(z / dd)))
    ss = (-jnp.log(rhoprof / eos.rho0)
          + jnp.log(Pprof / P0) / eos.gamma) * ones
    zero = jnp.zeros_like(uz)
    return {"uu": jnp.stack([zero, zero, uz]),
            "lnrho": jnp.log(rhoprof) * ones, "ss": ss}
