"""Run-directory object model (reference ``python/pencil/sim``:
``get_sim(path)`` wraps a simulation directory with its parameters, data
products and control actions).

A Simulation bundles:
  * configuration — ``sim.cfg`` (the pencil_tpu Config parsed from the
    run dir's start.in/run.in/cparam.local via compat.rundir, when they
    exist) and ``sim.params`` (raw namelist dicts);
  * data products — ``sim.ts() / var() / slices() / aver() / power()``
    delegating to post.read over ``sim.datadir``;
  * control — ``sim.run(nt=...)`` actually advances the simulation
    in-process through the Run driver (the reference's pc.sim submits a
    batch job; here the solver is a library call), ``sim.stop()`` drops a
    STOP control file for a live run.
"""
from __future__ import annotations

import os
from types import SimpleNamespace

from . import read as _read


class Simulation:
    def __init__(self, path="."):
        self.path = os.path.abspath(str(path))
        self.datadir = os.path.join(self.path, "data")
        self.name = os.path.basename(self.path)
        self._cfg = None
        self._info = None

    # -- configuration --------------------------------------------------
    @property
    def cfg(self):
        if self._cfg is None:
            from ..compat.rundir import load_rundir
            self._cfg, self._info = load_rundir(self.path)
        return self._cfg

    @property
    def params(self):
        """Raw namelist groups of start.in + run.in (dict of dicts)."""
        from ..compat.namelist import read_namelist_file
        out = {}
        for fn in ("start.in", "run.in"):
            p = os.path.join(self.path, fn)
            if os.path.exists(p):
                for k, v in read_namelist_file(p).items():
                    out.setdefault(k, {}).update(v)
        return out

    @property
    def grid(self):
        return self.cfg.grid

    # -- data products ---------------------------------------------------
    def ts(self):
        return _read.ts(self.datadir)

    def var(self, varfile="var.npz", **kw):
        return _read.var(varfile, datadir=self.datadir, **kw)

    def slices(self, field="ux", plane="xy"):
        return _read.slices(field, plane, datadir=self.datadir)

    def aver(self, names=None, **kw):
        return _read.aver(self.datadir, names=names, **kw)

    def power(self, name="kin"):
        return _read.power(name, datadir=self.datadir)

    def snapshots(self):
        return _read.snapshots(self.datadir)

    # -- control ---------------------------------------------------------
    def run(self, nt=None, resume=None, seed=0, params=None, quiet=True):
        """Advance this simulation in-process: build the Model from the
        run dir, init (or resume from the rolling checkpoint) and run the
        driver loop.  Returns the final state."""
        from ..model import Model
        from ..run import Run, RunParams
        cfg = self.cfg
        info = self._info or {}
        model = Model(cfg)
        p = params or RunParams(
            nt=int(nt if nt is not None else info.get("nt", 100)),
            it1=int(info.get("it1", 10) or 10),
        )
        if nt is not None:
            p.nt = int(nt)
        run = Run(model, datadir=self.datadir, params=p, quiet=quiet,
                  rundir=self.path)
        if resume is None:
            resume = os.path.exists(os.path.join(self.datadir, "var.npz"))
        state = (run.resume() if resume
                 else model.init_state(seed,
                                       overrides=info.get("init_overrides")))
        return run.main_loop(state)

    def stop(self):
        """Drop a STOP control file (graceful-exit request for a live
        driver loop — reference control files, src/run.f90:526)."""
        os.makedirs(self.datadir, exist_ok=True)
        open(os.path.join(self.datadir, "STOP"), "w").close()

    def __repr__(self):
        return f"<Simulation {self.name!r} at {self.path}>"


def get_sim(path="."):
    """pc.sim.get_sim contract: wrap a run directory."""
    return Simulation(path)


def simulations(root="."):
    """Find run directories under ``root`` (dirs holding a run.in or a
    data/time_series.dat)."""
    out = []
    for dirpath, dirnames, filenames in os.walk(str(root)):
        if "run.in" in filenames or (
                os.path.basename(dirpath) == "data"
                and "time_series.dat" in filenames):
            p = (os.path.dirname(dirpath)
                 if os.path.basename(dirpath) == "data" else dirpath)
            if p not in out:
                out.append(p)
            dirnames.clear()
    return [Simulation(p) for p in sorted(out)]
