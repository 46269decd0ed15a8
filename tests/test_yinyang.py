"""Yin-Yang overset spherical grids (reference src/yinyang.f90 +
setup_interp_yy, mpicomm.f90:606-1323): two rotated patches covering the
sphere, ghost zones interpolated from each other with vector rotation."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu.parallel.yinyang import (YinYangModel, YinYangSpec, _basis,
                                         _R, build_interp_tables,
                                         exchange_horizontal_ghosts)

G = 3


def _spec():
    return YinYangSpec(nr=8, nth=24, nph=68, r0=0.7, r1=1.0)


def test_tables_cover_and_weights_sum():
    t = build_interp_tables(_spec())
    w = np.asarray(t["w"])
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)
    assert (w >= -1e-9).all()
    # rotation matrices are orthogonal
    rot = np.asarray(t["rot"])
    eye = np.einsum("nij,nkj->nik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-6)   # tables stored f32


def test_exchange_uniform_scalar_exact():
    """Bilinear interpolation of a uniform field is exact — ghosts equal
    the constant after the overset exchange."""
    spec = _spec()
    t = build_interp_tables(spec)
    shape = (1, spec.nr + 2 * G, spec.nth + 2 * G, spec.nph + 2 * G)
    fg = jnp.stack([jnp.full(shape, 2.5), jnp.full(shape, 2.5)])
    out = np.asarray(exchange_horizontal_ghosts(fg, t, []))
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)


def test_exchange_smooth_scalar_matches_analytic():
    """A smooth function of POSITION (frame-independent scalar) must come
    back at its analytic ghost-point values: f = z_cart = r·cosθ in yin;
    in yang coordinates the same physical field is r·sinθ'·sinφ'."""
    spec = _spec()
    t = build_interp_tables(spec)
    r = spec.r
    thg = np.concatenate([spec.th[0] - spec.dth * np.arange(G, 0, -1),
                          spec.th,
                          spec.th[-1] + spec.dth * np.arange(1, G + 1)])
    phg = np.concatenate([spec.ph[0] - spec.dph * np.arange(G, 0, -1),
                          spec.ph,
                          spec.ph[-1] + spec.dph * np.arange(1, G + 1)])
    rg = np.concatenate([r[0] - spec.dr * np.arange(G, 0, -1), r,
                         r[-1] + spec.dr * np.arange(1, G + 1)])
    R, TH, PH = np.meshgrid(rg, thg, phg, indexing="ij")
    z_yin = R * np.cos(TH)                       # physical z in yin frame
    # yang frame: z_yin = y_yang ⇒ field in yang coords = r sinθ sinφ
    z_in_yang = R * np.sin(TH) * np.sin(PH)
    fg = jnp.stack([jnp.asarray(z_yin)[None], jnp.asarray(z_in_yang)[None]])
    out = np.asarray(exchange_horizontal_ghosts(fg, t, []))
    # yin ghosts must still equal r cosθ at the ghost coordinates
    np.testing.assert_allclose(out[0, 0, :, :G, :], z_yin[:, :G, :],
                               atol=2e-3)
    np.testing.assert_allclose(out[0, 0, :, -G:, :], z_yin[:, -G:, :],
                               atol=2e-3)
    np.testing.assert_allclose(out[0, 0, :, :, :G], z_yin[:, :, :G],
                               atol=2e-3)
    np.testing.assert_allclose(out[1, 0, :, :G, :], z_in_yang[:, :G, :],
                               atol=2e-3)


def test_exchange_constant_cartesian_vector():
    """A constant Cartesian vector (v = ẑ in yin frame) expressed in each
    patch's spherical basis must reproduce its analytic ghost components
    after the exchange with rotation."""
    spec = _spec()
    t = build_interp_tables(spec)
    thg = np.concatenate([spec.th[0] - spec.dth * np.arange(G, 0, -1),
                          spec.th,
                          spec.th[-1] + spec.dth * np.arange(1, G + 1)])
    phg = np.concatenate([spec.ph[0] - spec.dph * np.arange(G, 0, -1),
                          spec.ph,
                          spec.ph[-1] + spec.dph * np.arange(1, G + 1)])
    TH, PH = np.meshgrid(thg, phg, indexing="ij")
    mr = spec.nr + 2 * G

    def sph_components(vcart, TH, PH):
        M = _basis(TH, PH)                      # (…,3,3) columns r̂θ̂φ̂
        return np.einsum("...ji,j->i...", M, vcart)

    v_yin = sph_components(np.array([0.0, 0.0, 1.0]), TH, PH)
    # in the yang frame the same physical vector is R·ẑ = ŷ_yang
    v_yang = sph_components(_R @ np.array([0.0, 0.0, 1.0]), TH, PH)
    f0 = jnp.asarray(np.broadcast_to(v_yin[:, None], (3, mr) + TH.shape))
    f1 = jnp.asarray(np.broadcast_to(v_yang[:, None], (3, mr) + TH.shape))
    out = np.asarray(exchange_horizontal_ghosts(
        jnp.stack([f0, f1]), t, [(0, 3)]))
    np.testing.assert_allclose(out[0][:, :, :G, :], f0[:, :, :G, :],
                               atol=3e-3)
    np.testing.assert_allclose(out[0][:, :, :, -G:], f0[:, :, :, -G:],
                               atol=3e-3)
    np.testing.assert_allclose(out[1][:, :, -G:, :], f1[:, :, -G:, :],
                               atol=3e-3)


def test_rigid_rotation_advection_across_patches():
    """Solid-body rotation about x̂ advects a passive-scalar blob across
    the patch boundaries; after a finite arc the blob's mass is conserved
    and the solution stays smooth (the classic overset-grid test)."""
    from pencil_tpu import (BC, Density, EosIdealGas, HydroKinematic,
                            PassiveScalar)
    from pencil_tpu.core.config import TimeSpec

    spec = YinYangSpec(nr=6, nth=24, nph=68, r0=0.9, r1=1.0)
    mods = tuple(
        (EosIdealGas(gamma=1.0001),
         HydroKinematic(profile="rigid-x", ampl=sgn * 1.0),
         PassiveScalar(diffcc=2e-4))
        for sgn in (1.0, -1.0))
    bcx = (BC.parse("cc", "s"),)
    yy = YinYangModel(spec, mods, time=TimeSpec(itorder=3, dt=2e-3),
                      bcx=bcx)
    state = yy.init_state(0)
    # blob at (θ,φ) = (π/2, 0) in yin, gaussian in angle
    thg = spec.th
    phg = spec.ph
    TH, PH = np.meshgrid(thg, phg, indexing="ij")
    blob = np.exp(-((TH - np.pi / 2) ** 2 + PH ** 2) / (2 * 0.15 ** 2))
    cc0 = np.broadcast_to(blob[None], (spec.nr,) + TH.shape).copy()
    cc_pair = np.stack([cc0, np.zeros_like(cc0)])
    state["fields"]["cc"] = jnp.asarray(cc_pair, jnp.float32)
    mass0 = float(np.sum(cc_pair[0]))           # rough (uniform-ish cells)
    step = yy.make_step()
    for _ in range(300):                        # arc ≈ 0.6 rad
        state = step(state)
    cc = np.asarray(state["fields"]["cc"])
    assert np.isfinite(cc).all()
    assert cc.max() > 0.35                      # blob survives transit
    assert cc.min() > -0.1
    # total mass across both patches is roughly conserved (overlap means
    # plain sums double-count the seams — bound loosely)
    total = cc[0].sum() + cc[1].sum()
    assert 0.5 * mass0 < total < 2.0 * mass0
