"""Curvilinear (cylindrical/spherical) vector-calculus tests.

Operators are checked against closed forms on analytically-extended ghost
zones (no BC coupling), reference convention x=r, y=θ|φ, z=φ|z."""
import numpy as np
import jax.numpy as jnp
import pytest

from pencil_tpu.core.config import Config, GridSpec
from pencil_tpu.core.farray import Registry
from pencil_tpu.core.grid import make_grid
from pencil_tpu.physics.pencils import Pencils

G = 3


def _setup(coords, n=32):
    if coords == "spherical":
        spec = GridSpec(nx=n, ny=n, nz=n, coords=coords,
                        x0=1.0, Lx=1.0,            # r ∈ [1, 2]
                        y0=0.6, Ly=1.9,            # θ away from poles
                        z0=0.0, Lz=2 * np.pi,      # φ periodic
                        periodic=(False, False, True))
    else:
        spec = GridSpec(nx=n, ny=n, nz=8, coords=coords,
                        x0=1.0, Lx=1.0,            # r ∈ [1, 2]
                        y0=0.0, Ly=2 * np.pi,      # φ periodic
                        z0=0.0, Lz=1.0,
                        periodic=(False, True, True))
    cfg = Config(grid=spec)
    grid = make_grid(spec, jnp.float32)
    return spec, cfg, grid


def _ghost_coords(grid):
    """Full ghosted coordinate arrays (numpy, float64)."""
    return (np.asarray(grid.x, np.float64)[:, None, None],
            np.asarray(grid.y, np.float64)[None, :, None],
            np.asarray(grid.z, np.float64)[None, None, :])


def _pen(fields, cfg, grid):
    reg = Registry()
    for name, arr in fields.items():
        ncomp = arr.shape[0] if arr.ndim == 4 else 1
        reg.register(name, ncomp, "pde")
    reg.finalize()
    fg = jnp.concatenate([
        jnp.asarray(a if a.ndim == 4 else a[None], jnp.float32)
        for a in fields.values()], axis=0)
    return Pencils(fg, grid, reg, cfg, None)


def test_spherical_harmonic_laplacian_zero():
    """f = r·sinθ·cosφ is the cartesian x — harmonic: ∇²f = 0."""
    spec, cfg, grid = _setup("spherical")
    r, th, ph = _ghost_coords(grid)
    f = r * np.sin(th) * np.cos(ph) * np.ones((1, 1, 1))
    f = np.broadcast_to(f, (spec.mx, spec.my, spec.mz))
    pen = _pen({"ff": np.asarray(f)}, cfg, grid)
    lap = np.asarray(pen.del2s("ff"))
    assert np.abs(lap).max() < 5e-3, np.abs(lap).max()


def test_cylindrical_harmonic_laplacian_zero():
    spec, cfg, grid = _setup("cylindrical")
    r, ph, z = _ghost_coords(grid)
    f = np.broadcast_to(r * np.cos(ph), (spec.mx, spec.my, spec.mz))
    pen = _pen({"ff": np.asarray(f)}, cfg, grid)
    lap = np.asarray(pen.del2s("ff"))
    assert np.abs(lap).max() < 5e-3, np.abs(lap).max()


def test_spherical_solid_body_rotation():
    """u = Ω ẑ × r: u_φ = Ω r sinθ.  div u = 0; ∇×u = 2Ω ẑ, whose spherical
    components are (2Ω cosθ, −2Ω sinθ, 0)."""
    Om = 0.7
    spec, cfg, grid = _setup("spherical")
    r, th, ph = _ghost_coords(grid)
    shape = (spec.mx, spec.my, spec.mz)
    uu = np.zeros((3,) + shape)
    uu[2] = Om * r * np.sin(th)
    pen = _pen({"uu": uu}, cfg, grid)
    div = np.asarray(pen.divu())
    assert np.abs(div).max() < 5e-3, np.abs(div).max()
    oo = np.asarray(pen.oo())
    thi = np.asarray(grid.y)[G:-G][None, :, None]
    np.testing.assert_allclose(oo[0], 2 * Om * np.cos(thi)
                               * np.ones_like(oo[0]), atol=5e-3)
    np.testing.assert_allclose(oo[1], -2 * Om * np.sin(thi)
                               * np.ones_like(oo[1]), atol=5e-3)
    np.testing.assert_allclose(oo[2], 0.0, atol=5e-3)


def test_cylindrical_solid_body_rotation():
    """u_φ = Ω r: div u = 0, (∇×u)_z = 2Ω."""
    Om = 0.5
    spec, cfg, grid = _setup("cylindrical")
    r, ph, z = _ghost_coords(grid)
    shape = (spec.mx, spec.my, spec.mz)
    uu = np.zeros((3,) + shape)
    uu[1] = Om * r * np.ones_like(ph) * np.ones_like(z)
    pen = _pen({"uu": uu}, cfg, grid)
    assert np.abs(np.asarray(pen.divu())).max() < 5e-3
    oo = np.asarray(pen.oo())
    np.testing.assert_allclose(oo[2], 2 * Om, atol=5e-3)
    np.testing.assert_allclose(oo[0], 0.0, atol=5e-3)


def test_spherical_radial_field():
    """u = r r̂: div u = 3 exactly; (∇²u)_r = 0."""
    spec, cfg, grid = _setup("spherical")
    r, th, ph = _ghost_coords(grid)
    shape = (spec.mx, spec.my, spec.mz)
    uu = np.zeros((3,) + shape)
    uu[0] = r * np.ones_like(th) * np.ones_like(ph)
    pen = _pen({"uu": uu}, cfg, grid)
    np.testing.assert_allclose(np.asarray(pen.divu()), 3.0, atol=5e-3)
    lap = np.asarray(pen.del2v("uu"))
    assert np.abs(lap[0]).max() < 5e-3, np.abs(lap[0]).max()


def test_spherical_advection_curvature():
    """Solid-body rotation: (u·∇)u must equal the centripetal acceleration
    −Ω²ϖ ϖ̂ with ϖ = r sinθ: components (−Ω²r sin²θ, −Ω²r sinθcosθ, 0)."""
    Om = 1.0
    spec, cfg, grid = _setup("spherical")
    r, th, ph = _ghost_coords(grid)
    shape = (spec.mx, spec.my, spec.mz)
    uu = np.zeros((3,) + shape)
    uu[2] = Om * r * np.sin(th)
    pen = _pen({"uu": uu}, cfg, grid)
    ugu = np.asarray(pen.ugu())
    ri = np.asarray(grid.x)[G:-G][:, None, None]
    thi = np.asarray(grid.y)[G:-G][None, :, None]
    np.testing.assert_allclose(
        ugu[0], -Om ** 2 * ri * np.sin(thi) ** 2 * np.ones_like(ugu[0]),
        atol=5e-3)
    np.testing.assert_allclose(
        ugu[1], -Om ** 2 * ri * np.sin(thi) * np.cos(thi)
        * np.ones_like(ugu[1]), atol=5e-3)


def test_spherical_hydro_smoke():
    """Isothermal hydro in a spherical shell runs stably (BC registry on
    the r/θ faces, curvature terms in the step)."""
    from pencil_tpu import (BC, Density, EosIdealGas, Hydro, Model, TimeSpec,
                            Viscosity)
    spec = GridSpec(nx=16, ny=16, nz=16, coords="spherical",
                    x0=1.0, Lx=1.0, y0=0.6, Ly=1.9, z0=0.0, Lz=2 * np.pi,
                    periodic=(False, False, True))
    cfg = Config(
        grid=spec, time=TimeSpec(itorder=3, dt=2e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-3),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)),
        bcx=(BC.parse("ux", "a"), BC.parse("uy", "s"), BC.parse("uz", "s"),
             BC.parse("lnrho", "s")),
        bcy=(BC.parse("ux", "s"), BC.parse("uy", "a"), BC.parse("uz", "s"),
             BC.parse("lnrho", "s")),
    )
    from pencil_tpu import Model
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(20):
        state = step(state)
    for k, v in state["fields"].items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_spherical_current_closed_form():
    """A = r φ̂: B = (cotθ, −2, 0) and µ₀J = ∇×B has the closed form
    J_φ = (1/r)(1/sin²θ − 2), J_r = J_θ = 0."""
    spec, cfg, grid = _setup("spherical")
    r, th, ph = _ghost_coords(grid)
    shape = (spec.mx, spec.my, spec.mz)
    aa = np.zeros((3,) + shape)
    aa[2] = r * np.ones_like(th) * np.ones_like(ph)
    pen = _pen({"aa": aa}, cfg, grid)
    bb = np.asarray(pen.bb())
    thi = np.asarray(grid.y)[G:-G][None, :, None]
    np.testing.assert_allclose(bb[0], np.cos(thi) / np.sin(thi)
                               * np.ones_like(bb[0]), atol=5e-3)
    np.testing.assert_allclose(bb[1], -2.0, atol=5e-3)
    jj = np.asarray(pen.jj())
    ri = np.asarray(grid.x)[G:-G][:, None, None]
    expect = (1.0 / np.sin(thi) ** 2 - 2.0) / ri
    np.testing.assert_allclose(jj[2], expect * np.ones_like(jj[2]), atol=2e-2)
    assert np.abs(jj[0]).max() < 2e-2 and np.abs(jj[1]).max() < 2e-2


def test_spherical_mhd_with_lorentz_runs():
    from pencil_tpu import (BC, Density, EosIdealGas, Hydro, Magnetic, Model,
                            TimeSpec, Viscosity)
    spec = GridSpec(nx=16, ny=16, nz=16, coords="spherical",
                    x0=1.0, Lx=1.0, y0=0.6, Ly=1.9, z0=0.0, Lz=2 * np.pi,
                    periodic=(False, False, True))
    cfg = Config(
        grid=spec, time=TimeSpec(itorder=3, dt=1e-3),
        modules=(EosIdealGas(gamma=1.0001), Density(),
                 Hydro(init="gaussian-noise", ampl=1e-3),
                 Magnetic(init="gaussian-noise", ampl=1e-3, eta=2e-3),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)),
        bcx=(BC.parse("ux", "a"), BC.parse("uy", "s"), BC.parse("uz", "s"),
             BC.parse("lnrho", "s"), BC.parse("ax", "s"),
             BC.parse("ay", "a"), BC.parse("az", "a")),
        bcy=(BC.parse("ux", "s"), BC.parse("uy", "a"), BC.parse("uz", "s"),
             BC.parse("lnrho", "s"), BC.parse("ax", "a"),
             BC.parse("ay", "s"), BC.parse("az", "a")),
    )
    from pencil_tpu import Model
    model = Model(cfg)
    state = model.init_state(0)
    step = model.make_step()
    for _ in range(20):
        state = step(state)
    for k, v in state["fields"].items():
        assert np.isfinite(np.asarray(v)).all(), k
