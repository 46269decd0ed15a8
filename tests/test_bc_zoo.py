"""Unit tests for the census-driven BC zoo (reference src/boundcond.f90
case labels used by samples/**/start.in+run.in).  Each test checks the
defining mathematical property of the condition on a ghosted array."""
import jax.numpy as jnp
import numpy as np
import pytest

from pencil_tpu.core.config import Config, GridSpec
from pencil_tpu.core.farray import Registry
from pencil_tpu.core.grid import make_grid
from pencil_tpu.ops.boundary import BC, BC_REGISTRY, BCContext
from pencil_tpu.ops.stencil import NGHOST
from pencil_tpu.parallel.halo import fill_ghosts
from pencil_tpu.physics.eos import EosIdealGas

G = NGHOST


def _ctx(spec=None, fields=("lnrho", "ss")):
    spec = spec or GridSpec(nx=8, ny=8, nz=8, periodic=(True, True, False))
    cfg = Config(grid=spec)
    grid = make_grid(spec)
    reg = Registry()
    for f in fields:
        reg.register(f, 1, "pde")
    reg.finalize()
    rng = np.random.default_rng(42)
    m = (len(fields), spec.nx + 2 * G, spec.ny + 2 * G, spec.nz + 2 * G)
    fg = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
    eos = EosIdealGas(gamma=5.0 / 3.0, cs0=1.0)
    ctx = BCContext(fg, reg, grid, cfg, eos)
    return ctx, fg


def _apply(code, fgc, axis, side, ctx, val=0.0):
    return np.asarray(BC_REGISTRY[code](fgc, axis, side, val, ctx))


def test_zero_ghosts():
    ctx, fg = _ctx()
    out = _apply("0", fg[0], 2, 0, ctx)
    assert np.all(out[:, :, :G] == 0.0)
    np.testing.assert_array_equal(out[:, :, G:], np.asarray(fg[0])[:, :, G:])


def test_cop_copies_boundary():
    ctx, fg = _ctx()
    out = _apply("cop", fg[0], 2, 1, ctx)
    for j in (1, 2, 3):
        np.testing.assert_array_equal(out[:, :, -G - 1 + j], out[:, :, -G - 1])


@pytest.mark.parametrize("code", ["e1", "e2"])
def test_extrap_exact_on_polynomials(code):
    # e1 reproduces quadratics exactly, e2 cubics in its design space;
    # both must at least be exact on linear profiles.
    spec = GridSpec(nx=16, ny=4, nz=4, periodic=(False, True, True))
    ctx, _ = _ctx(spec)
    x = np.asarray(ctx.grid.x)
    f = (2.0 + 0.3 * x)[:, None, None] * np.ones((1, 10, 10))
    fgc = jnp.asarray(f, dtype=jnp.float64)
    for side in (0, 1):
        out = _apply(code, fgc, 0, side, ctx)
        np.testing.assert_allclose(out, f, rtol=1e-5)


def test_e3_power_law():
    # e3 maintains f = c * x^p exactly
    spec = GridSpec(nx=16, ny=4, nz=4, x0=1.0, Lx=2.0,
                    periodic=(False, True, True))
    ctx, _ = _ctx(spec)
    x = np.asarray(ctx.grid.x)
    f = (1.7 * x ** -2.5)[:, None, None] * np.ones((1, 10, 10))
    out = _apply("e3", jnp.asarray(f), 0, 0, ctx)
    np.testing.assert_allclose(out, f, rtol=1e-4)
    out = _apply("e3", jnp.asarray(f), 0, 1, ctx)
    np.testing.assert_allclose(out, f, rtol=1e-4)


def test_s0d_zero_derivative():
    ctx, fg = _ctx()
    out = _apply("s0d", fg[0], 2, 0, ctx)
    # ghosts symmetric
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, :, G - j], out[:, :, G + j])
    # boundary value satisfies the 6th-order one-sided df=0 relation
    b = out[:, :, G]
    expect = (360 * out[:, :, G + 1] - 450 * out[:, :, G + 2]
              + 400 * out[:, :, G + 3] - 225 * out[:, :, G + 4]
              + 72 * out[:, :, G + 5] - 10 * out[:, :, G + 6]) / 147
    np.testing.assert_allclose(b, expect, rtol=1e-5)


def test_van_ramp():
    ctx, fg = _ctx()
    out = _apply("v", fg[0], 2, 1, ctx)
    b = out[:, :, -G - 1]
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, :, -G - 1 + j],
                                   b * (G + 1 - j) / (G + 1), rtol=1e-6)


def test_v3_quadratic_exact():
    # v3 extrapolates with the one-sided quadratic: exact for parabolas
    spec = GridSpec(nx=4, ny=4, nz=16, periodic=(True, True, False))
    ctx, _ = _ctx(spec)
    z = np.asarray(ctx.grid.z)
    f = (1.0 + 0.5 * z - 0.2 * z ** 2)[None, None, :] * np.ones((10, 10, 1))
    out = _apply("v3", jnp.asarray(f), 2, 0, ctx)
    np.testing.assert_allclose(out, f, rtol=1e-4, atol=1e-6)


def test_outflow_blocks_inflow():
    ctx, fg = _ctx()
    uz = fg[0]
    out = _apply("ouf", uz, 2, 1, ctx)   # top: outflow = positive uz
    b = np.asarray(uz)[:, :, -G - 1]
    outflowing = b > 0
    for j in (1, 2, 3):
        mirror = out[:, :, -G - 1 - j]
        ghost = out[:, :, -G - 1 + j]
        np.testing.assert_allclose(ghost[outflowing], mirror[outflowing])
        np.testing.assert_allclose(ghost[~outflowing], -mirror[~outflowing])
    assert np.all(out[:, :, -G - 1][~outflowing] == 0.0)
    # forced variant: no ghost may point inward
    out2 = _apply("out", uz, 2, 1, ctx)
    assert np.all(out2[:, :, -G:] >= 0.0)
    out3 = _apply("out", uz, 2, 0, ctx)
    assert np.all(out3[:, :, :G] <= 0.0)


def test_ubs_steady():
    ctx, fg = _ctx()
    out = _apply("ubs", fg[0], 2, 0, ctx)
    b = np.asarray(fg[0])[:, :, G]
    inner = np.asarray(fg[0])[:, :, G + 1]
    # outflowing (<=0 at bottom): ghosts copy the boundary value
    mask = b <= 0
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, :, G - j][mask], b[mask])
    # inflowing + shallowing: linear extrapolation continues
    mask2 = (b > 0) & (b <= inner)
    np.testing.assert_allclose(out[:, :, G - 1][mask2],
                               (2 * b - inner)[mask2], rtol=1e-5)


def test_spherical_nfr_sfr_spr():
    spec = GridSpec(nx=16, ny=4, nz=4, x0=0.7, Lx=1.3, coords="spherical",
                    periodic=(False, True, True))
    ctx, fg = _ctx(spec)
    x = np.asarray(ctx.grid.x)
    f = np.asarray(fg[0])
    out = _apply("nfr", fg[0], 0, 0, ctx)
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[G - j], f[G + j] * x[G + j] / x[G - j],
                                   rtol=1e-5)
    out = _apply("sfr", fg[0], 0, 1, ctx)
    for j in (1, 2, 3):
        np.testing.assert_allclose(
            out[-G - 1 + j], f[-G - 1 - j] * x[-G - 1 + j] / x[-G - 1 - j],
            rtol=1e-5)
    out = _apply("spr", fg[0], 0, 0, ctx)
    assert np.all(out[G] == 0.0)
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[G - j],
                                   -f[G + j] * x[G + j] / x[G - j], rtol=1e-5)


def test_sT_mirrors_temperature():
    ctx, fg = _ctx()
    eos = ctx.eos
    ctx.comp = "ss"
    out = _apply("sT", fg[1], 2, 0, ctx)
    lnrho = np.asarray(fg[0])
    cpmcv = eos.cp - eos.cp / eos.gamma
    for j in (1, 2, 3):
        expect = (np.asarray(fg[1])[:, :, G + j]
                  + cpmcv * (lnrho[:, :, G + j] - lnrho[:, :, G - j]))
        np.testing.assert_allclose(out[:, :, G - j], expect, rtol=1e-5)


def test_c2_sets_boundary_temperature():
    ctx, fg = _ctx()
    eos = ctx.eos
    cs2 = 0.8
    out = _apply("c2", fg[1], 2, 1, ctx, val=cs2)
    lnrho_b = np.asarray(fg[0])[:, :, -G - 1]
    g1 = (eos.gamma - 1.0) / eos.gamma
    ss_expect = eos.cp * (np.log(cs2 / eos.cs20) / eos.gamma
                          - g1 * (lnrho_b - eos.lnrho0))
    np.testing.assert_allclose(out[:, :, -G - 1], ss_expect, rtol=1e-5)
    for j in (1, 2, 3):
        np.testing.assert_allclose(
            out[:, :, -G - 1 + j],
            2 * ss_expect - out[:, :, -G - 1 - j], rtol=1e-4)


def test_ism_density_profile():
    ctx, fg = _ctx()
    ctx.comp = "lnrho"
    scale = 2.0
    out = _apply("ism", fg[0], 2, 1, ctx, val=scale)
    z = np.asarray(ctx.grid.z)
    b = np.asarray(fg[0])[:, :, -G - 1]
    # top side uses 1/scale (reference bc_ism :8655 asymmetry vs :8631)
    for j in (1, 2, 3):
        dist = abs(z[-G - 1 + j] - z[-G - 1])
        np.testing.assert_allclose(out[:, :, -G - 1 + j],
                                   b - dist / scale, rtol=1e-4)
    # bottom side uses scale itself (:8631)
    out_lo = _apply("ism", fg[0], 2, 0, ctx, val=scale)
    b_lo = np.asarray(fg[0])[:, :, G]
    for j in (1, 2, 3):
        dist = abs(z[G - j] - z[G])
        np.testing.assert_allclose(out_lo[:, :, G - j],
                                   b_lo - dist * scale, rtol=1e-4)


def test_cdz_geometric_decay():
    ctx, fg = _ctx()
    out = _apply("cdz", fg[0], 2, 0, ctx)
    dz = 1.0 / float(np.asarray(ctx.grid.dz_1)[G])
    fac = 1.0 - 1.11 * dz
    b = np.asarray(fg[0])[:, :, G]
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, :, G - j], b * fac ** j, rtol=1e-4)


def test_ctz_constant_temperature_ghosts():
    ctx, fg = _ctx()
    eos = ctx.eos
    ctx.comp = "ss"
    out = _apply("ctz", fg[1], 2, 0, ctx)
    lnrho = np.asarray(fg[0])
    cpmcv = eos.cp - eos.cp / eos.gamma
    prev_ss = np.asarray(fg[1])[:, :, G]
    prev_ln = lnrho[:, :, G]
    for j in (1, 2, 3):
        expect = prev_ss + cpmcv * (prev_ln - lnrho[:, :, G - j])
        np.testing.assert_allclose(out[:, :, G - j], expect, rtol=1e-4)
        prev_ss, prev_ln = expect, lnrho[:, :, G - j]


def test_div_sets_divergence():
    # fill u with a linear field, ask for div u = val on the boundary; the
    # ghost-filled uz must give duz/dz = val - dux/dx - duy/dy there.
    spec = GridSpec(nx=8, ny=8, nz=8, periodic=(True, True, False))
    cfg = Config(grid=spec)
    grid = make_grid(spec)
    reg = Registry()
    reg.register("uu", 3, "pde", comps=("ux", "uy", "uz"))
    reg.finalize()
    x = np.asarray(grid.x)[:, None, None]
    y = np.asarray(grid.y)[None, :, None]
    z = np.asarray(grid.z)[None, None, :]
    ax_ = 0.4 * x + 0.1 * y + 0 * z
    ay_ = -0.2 * y + 0 * x
    az_ = 0.7 * z + 0 * x + 0 * y
    fg = jnp.asarray(np.stack([ax_ + 0 * y, ay_ + 0 * z, az_]),
                     dtype=jnp.float64)
    ctx = BCContext(fg, reg, grid, cfg, None)
    ctx.comp = "uz"
    val = 0.9
    out = _apply("div", fg[2], 2, 1, ctx, val=val)
    # centered 6th-order duz/dz at the boundary plane using the new ghosts
    w = np.array([-1, 9, -45, 0, 45, -9, 1]) / 60.0
    dz1 = float(np.asarray(grid.dz_1)[G])
    duzdz = sum(w[k + 3] * out[:, :, -G - 1 + k] for k in range(-3, 4)) * dz1
    target = val - 0.4 - (-0.2)
    np.testing.assert_allclose(duzdz[G:-G, G:-G], target, rtol=1e-5)


def test_pole_periodic_pp_ap():
    spec = GridSpec(nx=4, ny=8, nz=8, coords="spherical",
                    periodic=(True, False, True))
    ctx, fg = _ctx(spec)
    out = _apply("pp", fg[0], 1, 0, ctx)
    f = np.asarray(fg[0])
    # the φ half-turn rolls the INTERIOR φ points only (reference
    # bc_pper_y indexes the global interior φ grid; the z ghosts are
    # re-filled by the z-periodic wrap that runs after the y pass)
    rolled = f.copy()
    rolled[..., G:-G] = np.roll(f[..., G:-G], 8 // 2, axis=-1)
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, G - j, G:-G],
                                   rolled[:, G + j - 1, G:-G])
    out = _apply("ap", fg[0], 1, 0, ctx)
    for j in (1, 2, 3):
        np.testing.assert_allclose(out[:, G - j, G:-G],
                                   -rolled[:, G + j - 1, G:-G])


def test_str_stratified_density():
    spec = GridSpec(nx=8, ny=8, nz=4, x0=1.0, Lx=1.0, y0=0.5, Ly=2.0,
                    coords="spherical", periodic=(False, False, True))
    ctx, fg = _ctx(spec)
    ctx.comp = "lnrho"
    out = _apply("str", fg[0], 1, 0, ctx)
    r = np.asarray(ctx.grid.x)[:, None]
    th = np.asarray(ctx.grid.y)
    H2 = (ctx.eos.cs0 * r) ** 2
    b = np.asarray(fg[0])[:, G, :]
    za2 = (r * np.cos(th[G])) ** 2
    for j in (1, 2, 3):
        zg2 = (r * np.cos(th[G - j])) ** 2
        np.testing.assert_allclose(out[:, G - j, :],
                                   b - (zg2 - za2) / (2 * H2), rtol=1e-4)


def test_freeze_zeroes_df_on_boundary():
    """'f' BC: ghosts antisymmetric-about-value AND df pinned to zero on the
    boundary plane (reference bc_freeze_var)."""
    from pencil_tpu import Density, EosIdealGas as Eos, Hydro, MeshSpec, \
        Model, TimeSpec, Viscosity

    bcz = (BC.parse("ux", "s"), BC.parse("uy", "s"), BC.parse("uz", "a"),
           BC.parse("lnrho", "f"))
    cfg = Config(
        grid=GridSpec(nx=8, ny=8, nz=8, periodic=(True, True, False)),
        mesh=MeshSpec(1, 1, 1), time=TimeSpec(itorder=3),
        modules=(Eos(gamma=1.4, cs0=1.0),
                 Density(init="sinwave-z", ampl=0.1),
                 Hydro(init="gaussian-noise", ampl=1e-2),
                 Viscosity(ivisc=("nu-const",), nu=2e-3)),
        bcz=bcz,
    )
    model = Model(cfg)
    state = model.init_state(3)
    lnrho0 = np.asarray(state["fields"]["lnrho"])
    step = model.make_step()
    for _ in range(3):
        state = step(state)
    lnrho1 = np.asarray(state["fields"]["lnrho"])
    np.testing.assert_array_equal(lnrho1[:, :, 0], lnrho0[:, :, 0])
    np.testing.assert_array_equal(lnrho1[:, :, -1], lnrho0[:, :, -1])
    assert np.any(lnrho1[:, :, 1:-1] != lnrho0[:, :, 1:-1])


def test_onesided_exact_on_cubic():
    """'1s' (set_ghosts_for_onesided_ders): the 7th-order extrapolation
    reproduces polynomials up to degree 6 exactly — check a cubic."""
    spec = GridSpec(nx=8, ny=8, nz=16, periodic=(True, True, False))
    ctx, _ = _ctx(spec)
    z = np.asarray(ctx.grid.z)
    f = (1.0 + 0.5 * z - 0.2 * z ** 2 + 0.05 * z ** 3)
    fg = jnp.asarray(np.broadcast_to(f, (8 + 2 * G, 8 + 2 * G, len(z))
                                     ).copy())
    bad = fg.at[:, :, :G].set(99.0).at[:, :, -G:].set(-99.0)
    lo = _apply("1s", bad, 2, 0, ctx)
    hi = _apply("1s", bad, 2, 1, ctx)
    np.testing.assert_allclose(lo[:, :, :G], np.asarray(fg)[:, :, :G],
                               rtol=5e-5, atol=5e-4)
    np.testing.assert_allclose(hi[:, :, -G:], np.asarray(fg)[:, :, -G:],
                               rtol=5e-5, atol=5e-4)


def test_d1s_pins_boundary():
    ctx, fg = _ctx()
    out = _apply("d1s", fg[0], 2, 0, ctx, val=2.5)
    np.testing.assert_allclose(out[:, :, G], 2.5)
    out = _apply("d1s", fg[0], 2, 1, ctx, val=-1.0)
    np.testing.assert_allclose(out[:, :, -G - 1], -1.0)


def test_n1s_neumann_boundary_value():
    """'n1s': the boundary value satisfies the one-sided 6th-order
    first-derivative formula with the requested slope — exact on a
    linear profile."""
    spec = GridSpec(nx=8, ny=8, nz=16, periodic=(True, True, False))
    ctx, _ = _ctx(spec)
    z = np.asarray(ctx.grid.z)
    f = 1.0 + 0.7 * z
    fg = jnp.asarray(np.broadcast_to(f, (8 + 2 * G, 8 + 2 * G, len(z))
                                     ).copy())
    out = _apply("n1s", fg, 2, 0, ctx, val=0.7)
    np.testing.assert_allclose(out[:, :, G], f[G], rtol=1e-5)
    out = _apply("n1s", fg, 2, 1, ctx, val=0.7)
    np.testing.assert_allclose(out[:, :, -G - 1], f[-G - 1], rtol=1e-5)


def test_cT2_sets_temperature_from_density():
    ctx, fg = _ctx()
    ctx.comp = "ss"
    eos = ctx.eos
    cs2 = 0.8
    out = _apply("cT2", fg[1], 2, 1, ctx, val=cs2)
    lnrho = np.asarray(fg[0])
    cv = eos.cp / eos.gamma
    for j in (0, 1, 2, 3):
        zi = -G - 1 + j if j else -G - 1
        expect = (cv * np.log(cs2 / eos.cs20)
                  - (eos.cp - cv) * (lnrho[:, :, zi] - eos.lnrho0))
        np.testing.assert_allclose(out[:, :, zi], expect, rtol=1e-4,
                                   atol=1e-6)


def test_ce_constant_energy_ghosts():
    """'ce' (bc_ss_energy): ghost cs² equals the boundary cs² given the
    ghost density."""
    ctx, fg = _ctx()
    ctx.comp = "ss"
    eos = ctx.eos
    out = _apply("ce", fg[1], 2, 0, ctx)
    lnrho = np.asarray(fg[0])
    g1 = eos.gamma - 1.0
    cv = eos.cp / eos.gamma
    cs2 = eos.cs20 * np.exp(g1 * lnrho + np.asarray(out) / cv)
    for j in (1, 2, 3):
        np.testing.assert_allclose(cs2[:, :, G - j], cs2[:, :, G],
                                   rtol=1e-4)


def test_hs_hydrostatic_slopes():
    """'hs' (bc_lnrho_hds_z_iso): ghost slope d lnρ/dz = γ g_z/cs² and
    ds/dz = −(γ−1) g_z/cs² from the corner sound speed."""
    from pencil_tpu.physics.gravity import Gravity
    spec = GridSpec(nx=8, ny=8, nz=8, periodic=(True, True, False))
    cfg = Config(grid=spec, modules=(Gravity(gravz_profile="const",
                                             gravz=-1.5),))
    ctx, fg = _ctx(spec)
    ctx.cfg = cfg
    eos = ctx.eos
    ctx.comp = "lnrho"
    out = _apply("hs", fg[0], 2, 0, ctx)
    lnr0 = float(np.asarray(fg[0])[G, G, G])
    ss0 = float(np.asarray(fg[1])[G, G, G])
    cs2 = eos.cs20 * np.exp(eos.gamma * ss0 / eos.cp
                            + (eos.gamma - 1) * (lnr0 - eos.lnrho0))
    slope = eos.gamma * (-1.5) / cs2
    dz = spec.Lz / (spec.nz - 1)
    for j in (1, 2, 3):
        np.testing.assert_allclose(
            out[:, :, G - j],
            np.asarray(fg[0])[:, :, G + j] - 2 * j * dz * slope,
            rtol=1e-4, atol=1e-5)
