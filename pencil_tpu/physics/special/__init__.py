"""Special plug-in protocol — the reference's user-physics escape hatch
(``src/special/*.f90``, 62 plug-ins; interface contract ``src/special.h``,
multiple simultaneous specials via ``initialize_mult_special``,
src/run.f90:133).

A special is an ordinary physics module (``ModuleBase`` subclass): it can
claim f-array slots (``register``), add RHS terms for ANY evolved field
(``rhs`` writes into the shared ``df`` dict — the analog of
special_calc_hydro/density/energy/magnetic), provide farray-level
auxiliaries with their own halo (``compute_aux`` — special_after_boundary),
hook the full-step cadence (``before_timestep``/``after_timestep`` —
special_before_boundary/special_after_timestep), and contribute initial
conditions (``init_fields``).  Unlike the reference there is no fixed hook
list to stub out: absent hooks simply don't exist.

Usage:  subclass ``Special`` (a frozen dataclass), register it with
``@register_special("<name>")``, and either list it in ``Config.modules``
directly or select it from a run directory via ``SPECIAL =
special/<name>`` in src/Makefile.local (the loader maps namelist groups
``special_init_pars``/``special_run_pars`` to constructor fields by name).
Multiple specials may be active simultaneously; each needs a distinct
``name``.
"""
from __future__ import annotations

from typing import Dict, Type

from ..base import ModuleBase

SPECIAL_REGISTRY: Dict[str, Type[ModuleBase]] = {}


class Special(ModuleBase):
    """Marker base class for special plug-ins (see module docstring)."""

    name = "special"


def register_special(name: str):
    def deco(cls):
        SPECIAL_REGISTRY[name] = cls
        return cls
    return deco


def make_special(name: str, params: dict):
    """Instantiate a registered special from namelist-style parameters
    (unknown keys are ignored, like the reference's namelist reader)."""
    import dataclasses
    cls = SPECIAL_REGISTRY.get(name)
    if cls is None:
        raise KeyError(
            f"unknown special {name!r}; available: "
            f"{sorted(SPECIAL_REGISTRY)}")
    fields = {f.name.lower(): f.name for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in params.items():
        if k.lower() in fields:
            kw[fields[k.lower()]] = v
    return cls(**kw)


from . import shallow_water  # noqa: E402,F401  (registers plug-ins)
from . import gravitational_waves as _gw  # noqa: E402,F401
register_special("gravitational_waves_hTXk")(_gw.GravitationalWavesHTXk)
from . import meanfield_alpm  # noqa: E402,F401
from . import rtime_phiavg  # noqa: E402,F401
from . import baroclinic  # noqa: E402,F401
from . import photoelectric_dust  # noqa: E402,F401
from . import chiral_mhd  # noqa: E402,F401
from . import alphadisk  # noqa: E402,F401
from . import solar_corona  # noqa: E402,F401
from . import stubs  # noqa: E402,F401
from . import set_gravity  # noqa: E402,F401
from . import newton_cooling  # noqa: E402,F401
from . import streamfunction  # noqa: E402,F401
from . import multisp_drag_eq  # noqa: E402,F401
from . import coronae  # noqa: E402,F401
from . import meanfield_e_tensor  # noqa: E402,F401
from . import pressure_bump  # noqa: E402,F401
from . import turbpotential  # noqa: E402,F401
