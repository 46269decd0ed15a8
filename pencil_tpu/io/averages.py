"""1-D / 2-D averages (reference ``src/diagnostics.f90:838-1012``:
xyaverages_z, xzaverages_y, yzaverages_x, zaverages_xy…; control files
``xyaver.in``/``zaver.in`` list quantity names like ``uxmz``, ``rhomxy``).

Naming contract kept from the reference: ``<quant>m<dims>`` where the
trailing dims are what the profile *depends on* (so ``uxmz`` = <ux>_{xy}(z),
``bymxy`` = <by>_z(x, y)).  Output: ``data/xyaverages.dat`` style — a time
line followed by the profile values."""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.halo import fill_ghosts
from ..physics.pencils import Pencils

# base quantity evaluators over a Pencils container
QUANTS: Dict[str, Callable] = {
    "ux": lambda p: p.uu()[0], "uy": lambda p: p.uu()[1], "uz": lambda p: p.uu()[2],
    "ux2": lambda p: p.uu()[0] ** 2, "uy2": lambda p: p.uu()[1] ** 2,
    "uz2": lambda p: p.uu()[2] ** 2, "u2": lambda p: p.u2(),
    "uxuy": lambda p: p.uu()[0] * p.uu()[1],
    "uxuz": lambda p: p.uu()[0] * p.uu()[2],
    "uyuz": lambda p: p.uu()[1] * p.uu()[2],
    "rho": lambda p: p.rho(), "lnrho": lambda p: p.lnrho(),
    "ss": lambda p: p.ss(), "TT": lambda p: p.TT(), "cs2": lambda p: p.cs2(),
    "bx": lambda p: p.bb()[0], "by": lambda p: p.bb()[1], "bz": lambda p: p.bb()[2],
    "bx2": lambda p: p.bb()[0] ** 2, "by2": lambda p: p.bb()[1] ** 2,
    "bz2": lambda p: p.bb()[2] ** 2, "b2": lambda p: p.b2(),
    "bxby": lambda p: p.bb()[0] * p.bb()[1],
    "jb": lambda p: sum(p.jj()[a] * p.bb()[a] for a in range(3)),
    "ab": lambda p: sum(p.aa()[a] * p.bb()[a] for a in range(3)),
    "ekin": lambda p: 0.5 * p.rho() * p.u2(),
    "oum": lambda p: sum(p.oo()[a] * p.uu()[a] for a in range(3)),
}

# profile suffix → axes averaged over (axis indices of (x,y,z))
_SUFFIX_AXES = {
    "mz": (0, 1),    # xy-average, profile in z
    "my": (0, 2),    # xz-average, profile in y
    "mx": (1, 2),    # yz-average, profile in x
    "mxy": (2,),     # z-average, 2-D in (x,y)
    "mxz": (1,),     # y-average, 2-D in (x,z)
    "myz": (0,),     # x-average, 2-D in (y,z)
}


def parse_aver_name(name: str):
    for suf in ("mxy", "mxz", "myz", "mz", "my", "mx"):
        if name.endswith(suf) and name[: -len(suf)] in QUANTS:
            return name[: -len(suf)], _SUFFIX_AXES[suf]
    raise KeyError(f"unknown average name {name!r}")


def make_averages(model, names):
    """Jitted evaluator: state → {name: profile array}."""
    cfg, reg, grid, eos = model.cfg, model.reg, model.grid, model.eos
    parsed = {n: parse_aver_name(n) for n in names}

    @jax.jit
    def evaluate(state):
        fa = reg.stack(state["fields"])
        fg = fill_ghosts(fa[: reg.ncom], cfg.grid,
                         (cfg.bcx, cfg.bcy, cfg.bcz), reg, grid, cfg, eos)
        pen = Pencils(fg, grid, reg, cfg, eos)
        out = {}
        for n, (q, axes) in parsed.items():
            out[n] = jnp.mean(QUANTS[q](pen), axis=axes)
        return out

    return evaluate


class AveragesWriter:
    """data/xyaverages.dat-style append-only writer: a time stamp line,
    then the flattened profile values, 8 per line."""

    def __init__(self, path, names):
        self.path = path
        self.names = list(names)

    def append(self, t, values: Dict[str, np.ndarray]):
        with open(self.path, "a") as f:
            f.write(f"{float(t):14.7e}\n")
            for n in self.names:
                v = np.asarray(values[n]).ravel()
                for i in range(0, len(v), 8):
                    f.write(" ".join(f"{x:13.6e}" for x in v[i:i + 8]) + "\n")


def read_averages(path, names, shape_of: Dict[str, int]):
    """Read back; shape_of maps name → profile length."""
    times = []
    data = {n: [] for n in names}
    with open(path) as f:
        tokens = f.read().split("\n")
    i = 0
    while i < len(tokens):
        line = tokens[i].strip()
        if not line:
            i += 1
            continue
        times.append(float(line.split()[0]))
        i += 1
        vals = []
        need = sum(shape_of[n] for n in names)
        while len(vals) < need and i < len(tokens):
            vals.extend(float(v) for v in tokens[i].split())
            i += 1
        off = 0
        for n in names:
            ln = shape_of[n]
            data[n].append(np.asarray(vals[off:off + ln]))
            off += ln
    return np.asarray(times), {n: np.asarray(v) for n, v in data.items()}
