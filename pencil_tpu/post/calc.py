"""Derived-field calculus for post-processing (reference
``python/pencil/calc/``: Div, Grad, Curl, Del2 & friends on read-back
snapshots, plus the common MHD derived quantities).

All operators are plain numpy on INTERIOR arrays (nx, ny, nz) over a
uniform grid, using the same 6th-order central coefficients as the
solver (``src/deriv.f90:89`` 45/60, −9/60, 1/60); periodic axes wrap,
non-periodic axes fall back to one-sided differences at the walls
(matching ``python/pencil/calc/Grad`` behavior)."""
from __future__ import annotations

import numpy as np

_C1 = np.array([-1.0, 9.0, -45.0, 0.0, 45.0, -9.0, 1.0]) / 60.0
_C2 = np.array([2.0, -27.0, 270.0, -490.0, 270.0, -27.0, 2.0]) / 180.0


def _der(f, axis, d, order=1, periodic=True):
    """6th-order derivative along ``axis`` with spacing ``d``."""
    c = _C1 if order == 1 else _C2
    out = np.zeros_like(f, dtype=np.float64)
    if periodic:
        for o, w in zip(range(-3, 4), c):
            if w:
                out += w * np.roll(f, -o, axis=axis)
    else:
        # interior via rolls, boundary strips by low-order one-sided
        for o, w in zip(range(-3, 4), c):
            if w:
                out += w * np.roll(f, -o, axis=axis)
        sl = [slice(None)] * f.ndim
        n = f.shape[axis]
        for i in range(3):
            for idx, sgn in ((i, 1), (n - 1 - i, -1)):
                sl_i = list(sl)
                sl_i[axis] = idx
                nb = list(sl)
                nb[axis] = idx + sgn
                nb2 = list(sl)
                nb2[axis] = idx + 2 * sgn
                if order == 1:
                    out[tuple(sl_i)] = sgn * (
                        -1.5 * f[tuple(sl_i)] + 2.0 * f[tuple(nb)]
                        - 0.5 * f[tuple(nb2)])
                else:
                    nb3 = list(sl)
                    nb3[axis] = idx + 3 * sgn
                    out[tuple(sl_i)] = (2.0 * f[tuple(sl_i)]
                                        - 5.0 * f[tuple(nb)]
                                        + 4.0 * f[tuple(nb2)]
                                        - f[tuple(nb3)])
    return out / d ** order


def grad(f, dx, dy, dz, periodic=(True, True, True)):
    """∇f of a scalar (nx, ny, nz) → (3, nx, ny, nz)."""
    return np.stack([
        _der(f, 0, dx, 1, periodic[0]),
        _der(f, 1, dy, 1, periodic[1]),
        _der(f, 2, dz, 1, periodic[2]),
    ])


def div(v, dx, dy, dz, periodic=(True, True, True)):
    """∇·v of a vector (3, nx, ny, nz) → (nx, ny, nz)."""
    return (_der(v[0], 0, dx, 1, periodic[0])
            + _der(v[1], 1, dy, 1, periodic[1])
            + _der(v[2], 2, dz, 1, periodic[2]))


def curl(v, dx, dy, dz, periodic=(True, True, True)):
    """∇×v → (3, nx, ny, nz)."""
    return np.stack([
        _der(v[2], 1, dy, 1, periodic[1]) - _der(v[1], 2, dz, 1, periodic[2]),
        _der(v[0], 2, dz, 1, periodic[2]) - _der(v[2], 0, dx, 1, periodic[0]),
        _der(v[1], 0, dx, 1, periodic[0]) - _der(v[0], 1, dy, 1, periodic[1]),
    ])


def del2(f, dx, dy, dz, periodic=(True, True, True)):
    """∇²f of a scalar."""
    return (_der(f, 0, dx, 2, periodic[0])
            + _der(f, 1, dy, 2, periodic[1])
            + _der(f, 2, dz, 2, periodic[2]))


def curl2(v, dx, dy, dz, periodic=(True, True, True)):
    """∇×(∇×v) (e.g. µ0 J from A) — as ∇(∇·v) − ∇²v on uniform grids."""
    d = div(v, dx, dy, dz, periodic)
    gd = grad(d, dx, dy, dz, periodic)
    l2 = np.stack([del2(v[i], dx, dy, dz, periodic) for i in range(3)])
    return gd - l2


def dot(a, b):
    return np.sum(a * b, axis=0)


def dot2(a):
    return np.sum(a * a, axis=0)


def cross(a, b):
    return np.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


# ---- derived MHD quantities on a read-back snapshot ----------------------
def _spacing(var, spec=None):
    if spec is not None:
        return spec.dx, spec.dy, spec.dz, spec.periodic
    # native snapshot: infer from attached grid or assume 2π box
    for attr in ("dx",):
        if hasattr(var, "dx"):
            return var.dx, var.dy, var.dz, (True, True, True)
    shp = np.asarray(var.uu).shape[-3:]
    return tuple(2 * np.pi / n for n in shp) + ((True, True, True),)


def vorticity(var, spec=None):
    """ω = ∇×u from a snapshot object with .uu."""
    dx, dy, dz, per = _spacing(var, spec)
    return curl(np.asarray(var.uu), dx, dy, dz, per)


def bb(var, spec=None):
    """B = ∇×A from .aa."""
    dx, dy, dz, per = _spacing(var, spec)
    return curl(np.asarray(var.aa), dx, dy, dz, per)


def jj(var, spec=None):
    """µ0 J = ∇×B from .aa."""
    dx, dy, dz, per = _spacing(var, spec)
    return curl2(np.asarray(var.aa), dx, dy, dz, per)


def kinetic_energy(var, spec=None):
    """<ρu²>/2 (ρ from lnrho/rho when present, else 1)."""
    uu = np.asarray(var.uu)
    if hasattr(var, "rho"):
        rho = np.asarray(var.rho)
    elif hasattr(var, "lnrho"):
        rho = np.exp(np.asarray(var.lnrho))
    else:
        rho = 1.0
    return 0.5 * np.mean(rho * dot2(uu))


def magnetic_energy(var, spec=None):
    """<B²>/2."""
    return 0.5 * np.mean(dot2(bb(var, spec)))


def kinetic_helicity(var, spec=None):
    """<u·ω>."""
    return np.mean(dot(np.asarray(var.uu), vorticity(var, spec)))


def magnetic_helicity(var, spec=None):
    """<A·B>."""
    return np.mean(dot(np.asarray(var.aa), bb(var, spec)))


def cross_helicity(var, spec=None):
    """<u·B>."""
    return np.mean(dot(np.asarray(var.uu), bb(var, spec)))


def enstrophy(var, spec=None):
    """<ω²>/2."""
    return 0.5 * np.mean(dot2(vorticity(var, spec)))
