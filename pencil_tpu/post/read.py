"""Post-processing read API (reference ``python/pencil``:
``pc.read.ts() / var() / slices() / aver() / power()`` over a data
directory — SURVEY.md §2.12 / §3.5).

Works on this framework's native outputs (npz snapshots, time_series.dat,
slice npz, averages.dat, power_*.dat) and on reference-format var.dat via
the compat codec."""
from __future__ import annotations

import glob
import os
from types import SimpleNamespace

import numpy as np

from ..io.averages import read_averages
from ..io.slices import read_slices
from ..io.spectra import read_spectrum
from ..io.timeseries import read_time_series


def ts(datadir="data"):
    """Time series as an object with one array attribute per column
    (pc.read.ts contract: ts.t, ts.urms, ...)."""
    data = read_time_series(os.path.join(str(datadir), "time_series.dat"))
    return SimpleNamespace(**{k: np.asarray(v) for k, v in data.items()},
                           keys=list(data))


def var(varfile="var.npz", datadir="data", trimall=False):
    """Snapshot as an object with named field arrays (pc.read.var contract:
    var.uu, var.lnrho, ..., var.t).  Reads our .npz state or a
    reference-format var.dat."""
    path = os.path.join(str(datadir), str(varfile))
    if not os.path.exists(path) and os.path.exists(str(varfile)):
        path = str(varfile)
    if path.endswith(".npz"):
        from ..io.snapshot import load_snapshot
        st = load_snapshot(path)
        out = {k: np.asarray(v) for k, v in st["fields"].items()}
        ns = SimpleNamespace(**out, t=float(np.asarray(st["t"])),
                             dt=float(np.asarray(st["dt"])),
                             it=int(np.asarray(st["it"])))
        if "particles" in st:
            ns.xp = np.asarray(st["particles"]["xp"])
            ns.vp = np.asarray(st["particles"]["vp"])
        return ns
    if path.endswith(".h5") or (not os.path.exists(path) and os.path.exists(
            os.path.join(str(datadir), "allprocs",
                         str(varfile).replace(".dat", ".h5")))):
        # IO=io_hdf5 layout: data/allprocs/var.h5 (io_hdf5.f90)
        if not path.endswith(".h5"):
            path = os.path.join(str(datadir), "allprocs",
                                str(varfile).replace(".dat", ".h5"))
        if not os.path.exists(path):
            cand = os.path.join(str(datadir), "allprocs",
                                os.path.basename(path))
            if os.path.exists(cand):
                path = cand
        from ..io.hdf5 import read_var_h5
        fields, t, grid = read_var_h5(path)
        ns = SimpleNamespace(t=t, **{k: (v[(slice(3, -3),) * 3]
                                         if trimall else v)
                                     for k, v in fields.items()})
        for k in ("x", "y", "z", "dx", "dy", "dz"):
            if k in grid:
                setattr(ns, k, grid[k])
        return ns
    from ..compat.io_dist import read_var
    vf = read_var(path, datadir=datadir)
    ns = SimpleNamespace(f=vf.f, t=vf.t, x=vf.x, y=vf.y, z=vf.z,
                         dx=vf.dx, dy=vf.dy, dz=vf.dz, deltay=vf.deltay)
    # attach named slices if an index.pro is present
    idx_path = os.path.join(os.path.dirname(path), "index.pro")
    if os.path.exists(idx_path):
        g = 3 if trimall else 0
        sl = (slice(g, -g) if trimall else slice(None),) * 3
        with open(idx_path) as fh:
            for line in fh:
                if "=" in line:
                    name, num = line.strip().split("=")
                    i = int(num) - 1
                    if 0 <= i < vf.f.shape[0]:
                        setattr(ns, name.lstrip("i"), vf.f[(i,) + sl])
    return ns


def slices(field="ux", plane="xy", datadir="data"):
    t, data = read_slices(os.path.join(str(datadir),
                                       f"slice_{field}_{plane}.npz"))
    return SimpleNamespace(t=t, data=data)


def aver(datadir="data", names=None, shape_of=None):
    names = list(names or [])
    t, data = read_averages(os.path.join(str(datadir), "averages.dat"),
                            names, shape_of or {})
    return SimpleNamespace(t=t, **data)


def power(name="kin", datadir="data"):
    t, spec = read_spectrum(os.path.join(str(datadir), f"power_{name}.dat"))
    return SimpleNamespace(t=t, spec=spec)


def snapshots(datadir="data"):
    """List enumerated VAR<N> snapshots (newest last)."""
    files = sorted(glob.glob(os.path.join(str(datadir), "VAR*.npz")),
                   key=lambda p: int("".join(c for c in os.path.basename(p)
                                             if c.isdigit()) or 0))
    return files
