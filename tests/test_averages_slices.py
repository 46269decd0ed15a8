"""1-D/2-D averages and video-slice output tests."""
import numpy as np

from pencil_tpu import (Config, Density, EosIdealGas, Forcing, GridSpec,
                        Hydro, Model, TimeSpec, Viscosity)
from pencil_tpu.io.averages import (AveragesWriter, make_averages,
                                    parse_aver_name, read_averages)
from pencil_tpu.io.slices import read_slices
from pencil_tpu.run import Run, RunParams, simulate


def _cfg(n=16):
    return Config(
        grid=GridSpec(nx=n, ny=n, nz=n),
        time=TimeSpec(itorder=3),
        modules=(
            EosIdealGas(gamma=1.0001),
            Density(init="sinwave-z", ampl=0.1),
            Hydro(init="gaussian-noise", ampl=1e-2),
            Viscosity(ivisc=("nu-const",), nu=5e-3),
        ),
    )


def test_parse_aver_names():
    assert parse_aver_name("uxmz") == ("ux", (0, 1))
    assert parse_aver_name("rhomxy") == ("rho", (2,))
    assert parse_aver_name("u2mx") == ("u2", (1, 2))


def test_averages_values():
    model = Model(_cfg())
    state = model.init_state(0)
    ev = make_averages(model, ("rhomz", "uxmz"))
    out = ev(state)
    rho = np.exp(np.asarray(state["fields"]["lnrho"]))
    np.testing.assert_allclose(np.asarray(out["rhomz"]),
                               rho.mean(axis=(0, 1)), rtol=1e-5)
    assert out["uxmz"].shape == (16,)


def test_driver_writes_averages_slices_spectra(tmp_path):
    cfg = _cfg()
    simulate(cfg, nt=10, datadir=tmp_path / "data", seed=0,
             params=RunParams(nt=10, it1=5, it1d=5, dvid=1e-6, dspec=1e-6,
                              aver_names=("uxmz", "rhomz"),
                              slice_fields=("ux",), slice_planes=("xy",),
                              power_fields=("kin",)),
             quiet=True)
    # reference file naming: the 'mz' plane goes to xyaverages.dat
    t, data = read_averages(tmp_path / "data" / "xyaverages.dat",
                            ["uxmz", "rhomz"], {"uxmz": 16, "rhomz": 16})
    assert len(t) == 2 and data["rhomz"].shape == (2, 16)
    ts, frames = read_slices(tmp_path / "data" / "slice_ux_xy.npz")
    assert frames.shape[1:] == (16, 16) and len(ts) >= 1
    from pencil_tpu.io.spectra import read_spectrum
    tt, ss = read_spectrum(tmp_path / "data" / "power_kin.dat")
    assert len(tt) >= 1 and ss.shape[1] == 8
