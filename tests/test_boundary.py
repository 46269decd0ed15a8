"""Ghost-fill and boundary-condition unit tests (reference BC semantics,
src/boundcond.f90 mnemonics)."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu.core.config import Config, GridSpec
from pencil_tpu.core.farray import Registry
from pencil_tpu.core.grid import make_grid
from pencil_tpu.ops.boundary import BC
from pencil_tpu.parallel.halo import fill_ghosts
from pencil_tpu.physics.eos import EosIdealGas


def _setup(periodic=(True, True, True), bcz=()):
    spec = GridSpec(nx=8, ny=8, nz=8, periodic=periodic)
    cfg = Config(grid=spec, bcz=bcz)
    grid = make_grid(spec)
    reg = Registry()
    reg.register("lnrho", 1, "pde")
    reg.register("ss", 1, "pde")
    reg.finalize()
    return spec, cfg, grid, reg


def test_periodic_wrap():
    spec, cfg, grid, reg = _setup()
    rng = np.random.default_rng(0)
    fa = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), dtype=jnp.float32)
    fg = fill_ghosts(fa, spec, (cfg.bcx, cfg.bcy, cfg.bcz), reg, grid, cfg)
    ref = np.pad(np.asarray(fa), ((0, 0), (3, 3), (3, 3), (3, 3)), mode="wrap")
    np.testing.assert_allclose(np.asarray(fg), ref, atol=0)


def test_symmetric_bc():
    bcz = (BC.parse("lnrho", "s"), BC.parse("ss", "a"))
    spec, cfg, grid, reg = _setup(periodic=(True, True, False), bcz=bcz)
    rng = np.random.default_rng(1)
    fa = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), dtype=jnp.float32)
    fg = np.asarray(fill_ghosts(fa, spec, (cfg.bcx, cfg.bcy, cfg.bcz),
                                reg, grid, cfg))
    # 's': f[g-j] == f[g+j] around z-boundary plane (index 3)
    for j in (1, 2, 3):
        np.testing.assert_allclose(fg[0, 3:-3, 3:-3, 3 - j],
                                   fg[0, 3:-3, 3:-3, 3 + j])
        # 'a': antisymmetric
        np.testing.assert_allclose(fg[1, 3:-3, 3:-3, 3 - j],
                                   -fg[1, 3:-3, 3:-3, 3 + j])
        # high side too
        np.testing.assert_allclose(fg[0, 3:-3, 3:-3, -4 + j],
                                   fg[0, 3:-3, 3:-3, -4 - j])


def test_a2_bc():
    bcz = (BC.parse("lnrho", "a2"), BC.parse("ss", "s"))
    spec, cfg, grid, reg = _setup(periodic=(True, True, False), bcz=bcz)
    rng = np.random.default_rng(2)
    fa = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), dtype=jnp.float32)
    fg = np.asarray(fill_ghosts(fa, spec, (cfg.bcx, cfg.bcy, cfg.bcz),
                                reg, grid, cfg))
    for j in (1, 2, 3):
        np.testing.assert_allclose(
            fg[0, 3:-3, 3:-3, 3 - j],
            2 * fg[0, 3:-3, 3:-3, 3] - fg[0, 3:-3, 3:-3, 3 + j], rtol=1e-5)


def test_cT_bc_holds_temperature():
    eos = EosIdealGas(gamma=5.0 / 3.0, cs0=1.0)
    bcz = (BC.parse("lnrho", "a2"), BC.parse("ss", "cT", hval=0.5, lval=0.5))
    spec, cfg, grid, reg = _setup(periodic=(True, True, False), bcz=bcz)
    rng = np.random.default_rng(3)
    fa = jnp.asarray(rng.standard_normal((2, 8, 8, 8)) * 0.1, dtype=jnp.float32)
    fg = np.asarray(fill_ghosts(fa, spec, (cfg.bcx, cfg.bcy, cfg.bcz),
                                reg, grid, cfg, eos=eos))
    # cs2 on boundary and ghost planes equals target 0.5
    lnrho, ss = fg[0], fg[1]
    cs2 = eos.cs20 * np.exp(eos.gamma / eos.cp * ss
                            + (eos.gamma - 1) * (lnrho - eos.lnrho0))
    for zi in (0, 1, 2, 3, -4, -3, -2, -1):
        np.testing.assert_allclose(cs2[3:-3, 3:-3, zi], 0.5, rtol=1e-5)


def test_corner_ghosts_periodic():
    """Corners must be filled consistently (sequential-axis fill)."""
    spec, cfg, grid, reg = _setup()
    f = np.arange(8 ** 3, dtype=np.float32).reshape(8, 8, 8)
    fa = jnp.asarray(f)[None].repeat(2, 0)
    fg = np.asarray(fill_ghosts(fa, spec, (cfg.bcx, cfg.bcy, cfg.bcz),
                                reg, grid, cfg))
    ref = np.pad(f, 3, mode="wrap")
    np.testing.assert_allclose(fg[0], ref, atol=0)
