"""I/O layer: time-series format, snapshot/restart bit-exactness, driver."""
import os

import numpy as np
import pytest

from pencil_tpu import (Config, Density, EosIdealGas, Forcing, GridSpec,
                        Hydro, Model, TimeSpec, Viscosity)
from pencil_tpu.io.snapshot import load_snapshot, save_snapshot
from pencil_tpu.io.timeseries import (TimeSeriesWriter, parse_print_in,
                                      read_time_series)
from pencil_tpu.run import Run, RunParams, simulate


def _cfg(n=8):
    return Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3),
        modules=(
            EosIdealGas(gamma=1.0001),
            Density(),
            Hydro(init="gaussian-noise", ampl=1e-2),
            Viscosity(ivisc=("nu-const",), nu=5e-3),
            Forcing(force=0.05, kf=2.0),
        ),
    )


def test_parse_print_in():
    cols = parse_print_in("it(F6.0)\nt(F7.2)\n!\ndt(E10.3)\n#\nurms(F8.4)\n")
    assert cols == [("it", "F6.0"), ("t", "F7.2"), ("dt", "E10.3"),
                    ("urms", "F8.4")]


def test_timeseries_roundtrip(tmp_path):
    p = tmp_path / "time_series.dat"
    w = TimeSeriesWriter(p, [("it", "I9"), ("t", "E12.4"), ("urms", "F8.4")])
    w.append({"it": 10, "t": 0.25, "urms": 0.0058})
    w.append({"it": 20, "t": 0.50, "urms": 0.0112})
    data = read_time_series(p)
    assert data["it"] == [10.0, 20.0]
    np.testing.assert_allclose(data["urms"], [0.0058, 0.0112])


def test_restart_bit_exact(tmp_path):
    """Stop/save/load/continue must equal an uninterrupted run bit-for-bit
    (the reference's persist-record guarantee, src/persist.f90)."""
    model = Model(_cfg())
    step = model.make_step()
    s = model.init_state(3)
    for _ in range(3):
        s = step(s)
    save_snapshot(tmp_path / "var.npz", s)
    s_loaded = load_snapshot(tmp_path / "var.npz")
    # continue both for 3 more steps — forcing uses the PRNG key, so this
    # also proves stochastic state is restored exactly
    a, b = s, s_loaded
    for _ in range(3):
        a = step(a)
        b = step(b)
    for k in a["fields"]:
        np.testing.assert_array_equal(np.asarray(a["fields"][k]),
                                      np.asarray(b["fields"][k]), err_msg=k)
    assert float(a["t"]) == float(b["t"])


def test_driver_end_to_end(tmp_path):
    state = simulate(_cfg(), nt=12, datadir=tmp_path / "data", seed=1,
                     params=RunParams(nt=12, it1=4, isave=6,
                                      print_columns=("it", "t", "dt", "urms",
                                                     "umax", "rhom")),
                     quiet=True)
    data = read_time_series(tmp_path / "data" / "time_series.dat")
    assert len(data["it"]) >= 3
    assert all(np.isfinite(v) for v in data["urms"])
    assert os.path.exists(tmp_path / "data" / "var.npz")
    assert os.path.exists(tmp_path / "data" / "COMPLETED")
    # resume continues from the checkpoint
    state2 = simulate(_cfg(), nt=4, datadir=tmp_path / "data", resume=True,
                      params=RunParams(nt=4, it1=2), quiet=True)
    assert int(np.asarray(state2["it"])) == 16


def test_stop_control_file(tmp_path):
    model = Model(_cfg())
    run = Run(model, datadir=tmp_path / "data",
              params=RunParams(nt=100, it1=50), quiet=True)
    open(tmp_path / "data" / "STOP", "w").close()
    state = run.main_loop(model.init_state(0))
    assert int(np.asarray(state["it"])) == 1  # stopped after first step


def test_hdf5_snapshot_roundtrip(tmp_path):
    """IO=io_hdf5 analog: allprocs/var.h5 written in the reference layout
    round-trips through our reader and the reference python package."""
    import numpy as np
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Model, TimeSpec)
    from pencil_tpu.io.hdf5 import export_state_h5, read_var_h5

    cfg = Config(grid=GridSpec(nx=8, ny=8, nz=8), time=TimeSpec(itorder=3),
                 modules=(EosIdealGas(), Density(init="sinwave-z", ampl=0.1),
                          Hydro(init="gaussian-noise", ampl=1e-2)))
    model = Model(cfg)
    state = model.init_state(5)
    datadir = str(tmp_path / "data")
    export_state_h5(model, state, datadir)

    fields, t, grid = read_var_h5(datadir + "/allprocs/var.h5")
    g = cfg.grid.nghost
    np.testing.assert_allclose(
        fields["lnrho"][g:-g, g:-g, g:-g],
        np.asarray(state["fields"]["lnrho"]), rtol=1e-6)
    np.testing.assert_allclose(
        fields["ux"][g:-g, g:-g, g:-g],
        np.asarray(state["fields"]["uu"])[0], rtol=1e-6)

    # the reference python package must read it unchanged
    import sys
    sys.path.insert(0, "/root/reference/python")
    try:
        import pencil as pc
    except Exception:
        import pytest
        pytest.skip("reference python package not importable")
    var = pc.read.var(var_file="var.h5", datadir=datadir, trimall=True,
                      quiet=True)
    np.testing.assert_allclose(np.asarray(var.lnrho),
                               np.asarray(state["fields"]["lnrho"]).T,
                               rtol=1e-6)


def test_reference_python_reads_averages(tmp_path):
    """The reference python package (`pc.read.aver` / `pc.read.phiaver`)
    must parse our 1-D average files (xyaverages.dat: 1pe12.5 time line +
    contiguous 8-per-line values) and the PHIAVG Fortran-record files
    unchanged (VERDICT item 9 acceptance)."""
    import os
    import sys
    if not os.path.isdir("/root/reference/python"):
        import pytest
        pytest.skip("reference tree not mounted")
    import numpy as np
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Model, Viscosity)
    from pencil_tpu.run import Run, RunParams
    from pencil_tpu.compat.io_dist import export_state
    cfg = Config(grid=GridSpec(nx=16, ny=16, nz=16),
                 modules=(EosIdealGas(gamma=1.0001), Density(),
                          Hydro(init="gaussian-noise", ampl=1e-2),
                          Viscosity(ivisc=("nu-const",), nu=5e-3)))
    model = Model(cfg)
    state = model.init_state(1)
    ddir = str(tmp_path / "data")
    params = RunParams(nt=10, it1=5, it1d=5, isave=0,
                       aver_names=("uxmz", "rhomz"),
                       phiaver_names=("uzmphi", "rhomphi"), d2davg=1e-9,
                       print_columns=("it", "t", "dt", "urms"),
                       dsnap=1e30)
    run = Run(model, datadir=ddir, params=params, quiet=True)
    run.main_loop(state)
    export_state(model, state, ddir)
    (tmp_path / "xyaver.in").write_text("uxmz\nrhomz\n")
    sys.path.insert(0, "/root/reference/python")
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        import pencil as pc
        av = pc.read.aver(datadir="data", plane_list=["xy"])
        assert av.xy.uxmz.shape[1] == 16
        np.testing.assert_allclose(np.asarray(av.xy.rhomz).mean(), 1.0,
                                   atol=1e-3)
        ph = pc.read.phiaver(datadir="data")
        assert np.asarray(ph.phiavg.uzmphi).shape[1:] == (16, 8)
        np.testing.assert_allclose(
            float(np.mean(np.asarray(ph.phiavg.rhomphi))), 1.0, atol=1e-3)
    finally:
        os.chdir(cwd)


def test_hdf5_state_import(tmp_path):
    """import_state_h5: the read half of IO=io_hdf5 (io_hdf5.f90
    input_snap) — a state exported to var.h5 restores bit-exactly."""
    import numpy as np
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Model)
    from pencil_tpu.io.hdf5 import export_state_h5, import_state_h5

    cfg = Config(grid=GridSpec(nx=8, ny=8, nz=8),
                 modules=(EosIdealGas(), Density(init="sinwave-z", ampl=0.1),
                          Hydro(init="gaussian-noise", ampl=1e-2)))
    model = Model(cfg)
    state = model.init_state(3)
    datadir = str(tmp_path / "data")
    export_state_h5(model, state, datadir)
    st2 = import_state_h5(model, datadir)
    for k, v in state["fields"].items():
        np.testing.assert_array_equal(np.asarray(st2["fields"][k]),
                                      np.asarray(v))
    assert float(np.asarray(st2["t"])) == float(np.asarray(state["t"]))

    # our post.read reader resolves the h5 layout too
    import pencil_tpu.post.read as pr
    v = pr.var("var.h5", datadir=datadir)
    assert hasattr(v, "ux") and hasattr(v, "lnrho")
