"""Runtime phi-averages for cylinder-in-a-box disks (reference
``src/special/rtime_phiavg.f90``): azimuthal averages of (u, B) binned in
cylindrical radius (``nrcylrun = max(nx/20, 1)`` coarse bins over
[rt_int, rt_ext], cparam.f90:75) are cubic-splined back to every point,
and the module's diagnostics are the FLUCTUATIONS relative to those
profiles, integrated over the annulus r_int ≤ r_cyl ≤ r_ext
(``sum_lim_mn_name``, diagnostics.f90:787: Σa·dV / (π(r_ext²−r_int²)·Lz)).

Implemented diagnostics: urm/upm/uzzm, ur2m/up2m/uzz2m (ρ-weighted),
urupm/uruzm/uzupm, brm/bpm/bzm, br2m/bp2m/bzz2m, brbpm.  The RHS is a
no-op (dspecial_dt is empty in the reference)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar

import jax.numpy as jnp
import numpy as np

from . import Special, register_special


def _spline_coarse(rc, yc, r):
    """Reference ``spline`` (general.f90): cubic with the d(1)=d(n)=0
    closure rows a(1)=a(2)/b(1)=b(2), clamped outside [rc[0], rc[-1]]."""
    nr = rc.shape[0]
    if nr == 1:
        return jnp.full_like(r, yc[0])
    h = np.empty(nr)
    h[: nr - 1] = rc[1:] - rc[: nr - 1]
    h[nr - 1] = h[nr - 2]
    A = np.zeros((nr, nr))
    for i in range(nr):
        b = 2.0 * (h[i - 1] + h[i]) if i >= 1 else 2.0 * (h[0] + h[1])
        A[i, i] = b
        if i >= 1:
            A[i, i - 1] = h[i - 1]
        if i + 1 < nr:
            A[i, i + 1] = h[i]
    d = jnp.zeros(nr)
    if nr > 2:
        interior = 6.0 * ((yc[2:] - yc[1:-1]) / h[1: nr - 1]
                          - (yc[1:-1] - yc[:-2]) / h[: nr - 2])
        d = d.at[1:-1].set(interior)
    sol = jnp.linalg.solve(jnp.asarray(A, yc.dtype), d[:, None])[:, 0]
    # piecewise evaluation
    idx = jnp.clip(jnp.searchsorted(jnp.asarray(rc), r) - 1, 0, nr - 2)
    hi = jnp.asarray(h)[idx]
    x0 = jnp.asarray(rc)[idx]
    x1 = jnp.asarray(rc)[idx + 1]
    s0 = sol[idx]
    s1 = sol[idx + 1]
    y0 = yc[idx]
    y1 = yc[idx + 1]
    fac = 0.1666666
    S = ((fac / hi) * (s1 * (r - x0) ** 3 + s0 * (x1 - r) ** 3)
         + (r - x0) * (y1 / hi - hi * s1 * fac)
         + (x1 - r) * (y0 / hi - hi * s0 * fac))
    S = jnp.where(r <= rc[0], yc[0], S)
    S = jnp.where(r >= rc[-1], yc[-1], S)
    return S


@register_special("rtime_phiavg")
@dataclass(frozen=True)
class RtimePhiavg(Special):
    name: ClassVar[str] = "rtime_phiavg"

    rt_int: float = 0.0
    rt_ext: float = 0.0
    b_ext: float = 0.0        # llarge_scale_Bz: added to bz before binning
    r_int: float = 0.0        # annulus bounds for the limited diagnostics
    r_ext: float = 0.0

    @property
    def _rt(self):
        rt_ext = self.rt_ext if self.rt_ext > 0.0 else self.r_ext
        return self.rt_int if self.rt_int != 0.0 else self.r_int, rt_ext

    def fluctuations(self, pen):
        """{'ur','up','uz','br','bp','bz','rcyl','cos','sin'} — velocity
        and field components projected on (r̂, φ̂, ẑ) minus the splined
        phi-average profiles (rtime_phiavg.f90:560-660 + :399-423)."""
        key = "rtime_phiavg_fluct"
        if key in pen._cache:
            return pen._cache[key]
        gs = pen.cfg.grid
        g = pen.grid
        ones = jnp.ones(gs.shape, g.z.dtype)
        rcyl = jnp.maximum(
            jnp.sqrt(g.xg ** 2 + g.yg ** 2) + 0.0 * ones, 1e-30)
        cos = g.xg / rcyl + 0.0 * ones
        sin = g.yg / rcyl + 0.0 * ones
        rt_int, rt_ext = self._rt
        nr = max(gs.nx // 20, 1)
        drc = (rt_ext - rt_int) / nr
        rc = rt_int + drc * (np.arange(nr) + 0.5)
        ibin = jnp.clip(((rcyl - rt_int) / drc).astype(jnp.int32), 0,
                        nr - 1)
        inside = (rcyl >= rt_int) & (rcyl <= rt_ext)
        flat = ibin.reshape(-1)
        w = inside.reshape(-1).astype(ones.dtype)
        cnt = jnp.zeros(nr, ones.dtype).at[flat].add(w)
        cnt1 = 1.0 / jnp.maximum(cnt, 1.0)

        def binavg(a):
            s = jnp.zeros(nr, a.dtype).at[flat].add(a.reshape(-1) * w)
            return s * cnt1

        out = {"rcyl": rcyl, "cos": cos, "sin": sin, "inside": inside}
        in_coarse = (rcyl >= rc[0]) & (rcyl <= rc[-1])
        if "uu" in pen.reg.slots:
            uu = pen.uu()
            ur = uu[0] * cos + uu[1] * sin
            up = -uu[0] * sin + uu[1] * cos
            uz = uu[2]
            comps = [ur, up] + ([uz] if gs.nz > 1 else [])
            for nme, a in zip(("ur", "up", "uz"), (ur, up, uz)):
                if nme == "uz" and gs.nz == 1:
                    out[nme] = uz    # nd=2: uz not averaged → raw value
                    continue
                avg = _spline_coarse(rc, binavg(a), rcyl)
                # outside the coarse centres: avg := local value → fluct 0
                out[nme] = jnp.where(in_coarse, a - avg, 0.0)
        if "aa" in pen.reg.slots:
            bb = pen.bb()
            bz = bb[2] + self.b_ext
            br = bb[0] * cos + bb[1] * sin
            bp = -bb[0] * sin + bb[1] * cos
            for nme, a in zip(("br", "bp", "bz"), (br, bp, bz)):
                if nme == "bz" and gs.nz == 1:
                    out[nme] = bz
                    continue
                avg = _spline_coarse(rc, binavg(a), rcyl)
                out[nme] = jnp.where(in_coarse, a - avg, 0.0)
        pen._cache[key] = out
        return out


def _sum_lim(pen, a):
    """sum_lim_mn_name: ∫a dV over r_int≤r_cyl≤r_ext, divided by the
    annulus volume (diagnostics.f90:787-793)."""
    sp = pen.cfg.module("rtime_phiavg")
    gs = pen.cfg.grid
    fl = sp.fluctuations(pen)
    mask = (fl["rcyl"] >= sp.r_int) & (fl["rcyl"] <= sp.r_ext)
    dv = 1.0
    for n, d in zip(gs.shape, (gs.dx, gs.dy, gs.dz)):
        if n > 1:
            dv = dv * d
    vol = np.pi * (sp.r_ext ** 2 - sp.r_int ** 2)
    if gs.nz > 1:
        vol = vol * gs.Lz
    return jnp.sum(jnp.where(mask, a, 0.0)) * dv / vol


def _reg_phiavg_diags():
    from ...io.diagnostics import diag

    def make(nme, fn):
        @diag(nme)
        def _d(pen, st, fn=fn):
            sp = pen.cfg.module("rtime_phiavg")
            if sp is None:
                # reference semantics: these names only parse when the
                # special is compiled in — otherwise the column prints 0
                import jax.numpy as jnp
                return jnp.zeros(())
            fl = sp.fluctuations(pen)
            return _sum_lim(pen, fn(pen, fl))
        return _d

    make("urm", lambda p, f: f["ur"])
    make("upm", lambda p, f: f["up"])
    make("uzzm", lambda p, f: f["uz"])
    make("ur2m", lambda p, f: p.rho() * f["ur"] ** 2)
    make("up2m", lambda p, f: p.rho() * f["up"] ** 2)
    make("uzz2m", lambda p, f: p.rho() * f["uz"] ** 2)
    make("urupm", lambda p, f: p.rho() * f["ur"] * f["up"])
    make("uruzm", lambda p, f: p.rho() * f["ur"] * f["uz"])
    make("uzupm", lambda p, f: p.rho() * f["uz"] * f["up"])
    make("brm", lambda p, f: f["br"])
    make("bpm", lambda p, f: f["bp"])
    make("bzm", lambda p, f: f["bz"])
    make("br2m", lambda p, f: f["br"] ** 2)
    make("bp2m", lambda p, f: f["bp"] ** 2)
    make("bzz2m", lambda p, f: f["bz"] ** 2)
    make("brbpm", lambda p, f: f["br"] * f["bp"])


_reg_phiavg_diags()
