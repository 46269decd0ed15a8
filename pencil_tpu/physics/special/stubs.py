"""Acceptance stubs for specials whose run-time effect is diagnostics-only
or driven by external data files we don't ship:

- multisp_drag_eq (reference ``special/multisp_drag_eq.f90``, 371 LoC):
  pure diagnostics of the deviation from a PRECOMPUTED multi-species NSH
  drag equilibrium read from data/multisp_drag_eq.dat — adds no terms to
  any equation (dspecial_dt only feeds idiag_* sums).
- meanfield_e_tensor (``special/meanfield_e_tensor.f90``, 2651 LoC):
  EMF from α/η tensor COEFFICIENT FILES (HDF5 emftensors.h5); without the
  dataset the reference aborts — here the special loads and contributes
  nothing so coefficient-free smoke runs proceed.
- turbpotential (``special/turbpotential.f90``, 816 LoC): stochastic
  turbulent-potential forcing for dead-zone disks; implemented as a
  wavelike potential sum is TODO — the stub keeps the sample loadable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

from ..base import ModuleBase
from . import register_special


@register_special("multisp_drag_eq")
@dataclass(frozen=True)
class MultispDragEq(ModuleBase):
    name: ClassVar[str] = "multisp_drag_eq"


@register_special("meanfield_e_tensor")
@dataclass(frozen=True)
class MeanfieldETensor(ModuleBase):
    name: ClassVar[str] = "meanfield_e_tensor"


@register_special("turbpotential")
@dataclass(frozen=True)
class TurbPotential(ModuleBase):
    name: ClassVar[str] = "turbpotential"
