"""Border profiles (reference ``src/border_profiles.f90``): two
mechanisms that absorb waves / pin the solution near non-periodic
boundaries.

1. **Quenching** (``border_quenching``, src/border_profiles.f90:477 called
   from src/timestep.f90:158): when any ``border_frac_[xyz]`` is nonzero,
   the accumulated df is multiplied by a smoothstep profile
   ξ²(3−2ξ) that falls to zero at the boundary over
   ``border_frac·L/2`` (initialize_border_profiles :44-196), plus a raw
   hyper-diffusion ``border_diff·(1−prof)·δ⁶f/dt_sub`` when
   ``lborder_hyper_diff`` (cdata.f90:643, default true).  Applied by the
   model after df assembly, like the reference's timestep hook.

2. **Driving** (``border_driving``, :343-405): per-variable relaxation
   toward a target (initial condition / zero) inside the radial stripes
   [r_int_border, +2·wborder_int] and [r_ext_border−2·wborder_ext,
   r_ext_border], profile ``1−cubic_step(r,rib,wint,+1)+cubic_step(r,reb,
   wext,−1)`` (get_border :407-443), at the inverse drive time
   ``1/tborder`` or ``(1/fraction_tborder)·√gsum/(2π)·r^(−3/2)`` (the
   local orbital rate, get_drive_time :445-476).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp
import numpy as np

from .base import ModuleBase, accumulate

_IMP = 9e99


def cubic_step(x, x0, width, shift=0.0):
    """Reference Sub.cubic_step (src/sub.f90:4646): smooth unit step over
    [x0−w, x0+w], shifted so shift=+1 → [x0, x0+2w], −1 → [x0−2w, x0]."""
    xi = (x - x0) / (width + 1e-30) - shift
    xi = jnp.clip(xi, -1.0, 1.0)
    return 0.5 + xi * (0.75 - xi ** 2 * 0.25)


@dataclass(frozen=True)
class BorderProfiles(ModuleBase):
    name: ClassVar[str] = "border"

    # (lower, upper) fraction of each axis extent (run_pars
    # border_frac_[xyz]; cdata.f90:634)
    border_frac_x: Tuple[float, float] = (0.0, 0.0)
    border_frac_y: Tuple[float, float] = (0.0, 0.0)
    border_frac_z: Tuple[float, float] = (0.0, 0.0)
    lborder_hyper_diff: bool = True
    border_diff: float = 0.01           # local in border_quenching :488
    # ((field, mode), ...) from the modules' borderuu/borderlnrho/…
    # namelist entries; mode ∈ {'initial-condition', 'zero'}
    driving: Tuple[Tuple[str, str], ...] = ()
    r_int_border: float = _IMP          # sentinel → r_int (grid x0)
    r_ext_border: float = _IMP
    r_int: float = 0.0
    r_ext: float = _IMP
    wborder_int: float = 0.0
    wborder_ext: float = 0.0
    tborder: float = 0.0
    fraction_tborder: float = 1.0
    # √gsum/(2π) for the Keplerian drive rate (gravity_r shared 'gsum',
    # else 1/(2π): initialize_border_profiles :172-190)
    fac_sqrt_gsum1: float = 1.0 / (2.0 * math.pi)
    lcylinder_in_a_box: bool = False
    lsphere_in_a_box: bool = False
    lmeridional_border_drive: bool = False
    theta_lower_border: float = _IMP
    wborder_theta_lower: float = 0.0
    theta_upper_border: float = _IMP
    wborder_theta_upper: float = 0.0

    @property
    def has_quench(self) -> bool:
        return any(f != 0.0 for f in (self.border_frac_x
                                      + self.border_frac_y
                                      + self.border_frac_z))

    def quench_profile(self, grid, spec):
        """Static (nx, ny, nz) product profile (numpy, built once)."""
        profs = []
        for axis, (frac, L, lo) in enumerate(
                ((self.border_frac_x, spec.Lx, spec.x0),
                 (self.border_frac_y, spec.Ly, spec.y0),
                 (self.border_frac_z, spec.Lz, spec.z0))):
            c = np.asarray((grid.x, grid.y, grid.z)[axis], np.float64)
            g = spec.nghost
            c = c[g:-g]
            prof = np.ones_like(c)
            if frac[0] > 0:
                bw = frac[0] * L / 2.0
                xi = 1.0 - np.maximum((lo + bw) - c, 0.0) / bw
                prof = np.minimum(prof, xi ** 2 * (3.0 - 2.0 * xi))
            if frac[1] > 0:
                bw = frac[1] * L / 2.0
                xi = 1.0 - np.maximum(c - ((lo + L) - bw), 0.0) / bw
                prof = np.minimum(prof, xi ** 2 * (3.0 - 2.0 * xi))
            profs.append(prof)
        out = (profs[0][:, None, None] * profs[1][None, :, None]
               * profs[2][None, None, :])
        return out

    # ------------------------------------------------------------------
    def _rlim(self, pen):
        """The border radius field (get_border: rcyl/r/x by geometry)."""
        g = pen.grid
        coords = pen.cfg.grid.coords
        zero = jnp.zeros((pen.cfg.grid.nx, pen.cfg.grid.ny,
                          pen.cfg.grid.nz), g.z.dtype)
        if coords in ("cylindrical", "spherical"):
            return g.xg + zero
        if self.lcylinder_in_a_box:
            return jnp.sqrt(g.xg ** 2 + g.yg ** 2) + zero
        if self.lsphere_in_a_box:
            return jnp.sqrt(g.xg ** 2 + g.yg ** 2 + g.zg ** 2) + zero
        return g.xg + zero      # cartesian: x_mn (shearing-box x)

    def rhs(self, pen, df, ts):
        if not self.driving:
            return
        rib = self.r_int if self.r_int_border >= 1e99 else self.r_int_border
        reb = self.r_ext if self.r_ext_border >= 1e99 else self.r_ext_border
        rlim = self._rlim(pen)
        wint, wext = self.wborder_int, self.wborder_ext
        pborder = (1.0 - cubic_step(rlim, rib, wint, 1.0)
                   + cubic_step(rlim, reb, wext, -1.0))
        mask = (rlim <= rib + 2.0 * wint) | (rlim >= reb - 2.0 * wext)
        if self.lmeridional_border_drive:
            th = pen.grid.yg + 0.0 * rlim
            tl, tu = self.theta_lower_border, self.theta_upper_border
            wl, wu = self.wborder_theta_lower, self.wborder_theta_upper
            pborder = pborder + (1.0 - cubic_step(th, tl, wl, 1.0)
                                 + cubic_step(th, tu, wu, -1.0))
            mask = mask | (th <= tl + 2.0 * wl) | (th >= tu - 2.0 * wu)
        if self.tborder != 0.0:
            idt = 1.0 / self.tborder
        else:
            idt = (self.fac_sqrt_gsum1 / self.fraction_tborder) \
                * jnp.maximum(rlim, 1e-30) ** -1.5
        targets = pen._cache.get("_border_targets", {})
        fac = jnp.where(mask, pborder * idt, 0.0)
        for field, mode in self.driving:
            if field not in pen.reg.slots:
                continue
            fv = pen.field(field)
            tgt = targets.get(field) if mode == "initial-condition" else None
            dv = fv if tgt is None else fv - tgt
            accumulate(df, field, -fac * dv)
