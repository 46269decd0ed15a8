"""Field-line tracing + tracer maps (reference src/streamlines.f90,
fixed_points analysis)."""
import jax.numpy as jnp
import numpy as np

from pencil_tpu import GridSpec
from pencil_tpu.io.streamlines import (fixed_points, trace_streamlines,
                                       tracer_map)


def test_uniform_field_straight_lines():
    spec = GridSpec(nx=16, ny=16, nz=16)
    B = jnp.zeros((3, 16, 16, 16)).at[2].set(1.0)
    seeds = jnp.asarray([[0.0, 0.0, spec.z0], [1.0, -1.0, spec.z0]])
    path = trace_streamlines(B, seeds, spec, nsteps=64)
    p = np.asarray(path)
    # x, y constant; z increases monotonically by ds per step
    np.testing.assert_allclose(
        p[:, :, 0], np.broadcast_to(p[0, :, 0], p[:, :, 0].shape),
        atol=1e-6)
    np.testing.assert_allclose(
        p[:, :, 1], np.broadcast_to(p[0, :, 1], p[:, :, 1].shape),
        atol=1e-6)
    assert (np.diff(p[:, 0, 2]) > 0).all()


def test_sheared_field_footpoint_map():
    """B = (tan(θ), 0, 1)-like uniform slanted field: the z0→z1 map is a
    uniform shift by Lz·Bx/Bz."""
    spec = GridSpec(nx=16, ny=16, nz=16)
    bx0 = 0.25
    B = jnp.zeros((3, 16, 16, 16)).at[2].set(1.0).at[0].set(bx0)
    seeds, end = tracer_map(B, spec, nseed=4, nsteps=2048)
    shift = np.asarray(end - seeds)
    expect_x = spec.Lz * bx0
    np.testing.assert_allclose(shift[:, 0], expect_x, rtol=0.02)
    np.testing.assert_allclose(shift[:, 1], 0.0, atol=1e-3)


def test_fixed_points_of_identity_map():
    spec = GridSpec(nx=8, ny=8, nz=8)
    B = jnp.zeros((3, 8, 8, 8)).at[2].set(1.0)
    seeds, end = tracer_map(B, spec, nseed=4, nsteps=1024)
    fp, dist = fixed_points(seeds, end, spec)
    # a vertical field maps every footpoint onto itself
    assert len(fp) == len(seeds)
    assert dist.max() < 1e-3
