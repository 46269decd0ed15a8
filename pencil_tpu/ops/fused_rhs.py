"""Fused RHS megakernel (Pallas/TPU).

The jnp RHS path materializes every derivative and pencil in HBM; at 256³
that is ~hundreds of field-sized arrays of memory traffic per substep and
the step is HBM-bound ~75× off speed-of-light.  This kernel is the
TPU-native analog of the Astaroth fused RK3 stencil kernel the reference
offloads to (SURVEY.md §2.9, src/astaroth/gpu_astaroth.cc): it tiles the
(x, y) plane, DMAs each tile **plus its 3-wide halo** from the ghosted
state in HBM into VMEM once, and evaluates the entire composed physics RHS
(the same Module.rhs code that runs in the jnp path — Pencils works
unchanged on a VMEM-resident tile) writing only df.  HBM traffic drops to
~(read nf + write nvar) fields per substep.

Requirements of the v1 kernel (asserted at build time):
  * uniform Cartesian grid (scalar inverse spacings; coordinate-profile
    terms like z-dependent gravity/cooling use the z-vector input)
  * full z extent per tile (tiles span z, so z-coords are tile-invariant)
"""
from __future__ import annotations

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integrate.timestep import cfl_dt1
from ..physics.base import TimestepAccum
from ..physics.pencils import Pencils
from .stencil import NGHOST


class TileGrid(SimpleNamespace):
    """Duck-typed Grid for one VMEM tile: scalar metrics + coord vectors."""

    def dline_1(self):
        return (self.dx1, self.dy1, self.dz1)


def _choose_tile(n, target=16):
    for t in (target, 8, 4, 32, 2, n):
        if n % t == 0 and t <= n:
            return t
    return n


def make_fused_rhs(model, tx=None, ty=None):
    """Returns rhs_fused(fg, z_int) -> (dfa, dt1_tiles).

    fg: ghosted stack (nc, mx, my, mz); dfa: (nvar, nx, ny, nz);
    dt1_tiles: (gx, gy) per-tile max inverse timestep.
    """
    cfg = model.cfg
    reg = model.reg
    eos = model.eos
    gs = cfg.grid
    if gs.grid_func != ("uniform", "uniform", "uniform") or gs.coords != "cartesian":
        raise NotImplementedError("fused RHS v1: uniform Cartesian only")
    nx, ny, nz = gs.nx, gs.ny, gs.nz
    g = NGHOST
    TX = tx or _choose_tile(nx)
    TY = ty or _choose_tile(ny)
    gx, gy = nx // TX, ny // TY
    nc = reg.ncom
    nvar = reg.nvar
    YS = -(-(TY + 2 * g) // 8) * 8          # sublane-aligned DMA slab size
    ypad = YS - (TY + 2 * g)                # extra high-side y padding
    dx1 = 1.0 / gs.dx
    dy1 = 1.0 / gs.dy
    dz1 = 1.0 / gs.dz

    def kernel(fg_ref, z_ref, df_ref, dt1_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            fg_ref.at[:, pl.ds(i * TX, TX + 2 * g), pl.ds(j * TY, YS), :],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        txy = scratch[:, :, : TY + 2 * g, :]
        # z is periodic and spans the full extent per tile: build the z halo
        # in VMEM (lane-dim concat) so HBM stays 128-aligned.
        tile = jnp.concatenate(
            [txy[..., nz - g:], txy, txy[..., :g]], axis=-1)
        dt = tile.dtype
        tgrid = TileGrid(
            dx1=jnp.asarray(dx1, dt), dy1=jnp.asarray(dy1, dt),
            dz1=jnp.asarray(dz1, dt),
            dx_1=jnp.full((TX + 2 * g,), dx1, dt),
            dy_1=jnp.full((TY + 2 * g,), dy1, dt),
            dz_1=jnp.full((nz + 2 * g,), dz1, dt),
            zg=z_ref[0, g:-g][None, None, :],
            z=z_ref[0],
        )
        pen = Pencils(tile, tgrid, reg, cfg, eos)
        df = {}
        ts = TimestepAccum()
        for m in model.modules:
            m.rhs(pen, df, ts)
        parts = []
        for name, slot in reg.slots.items():
            if slot.kind != "pde":
                continue
            d = df.get(name)
            if d is None:
                d = jnp.zeros((slot.ncomp, TX, TY, nz), dt)
            elif d.ndim == 3:
                d = d[None]
            parts.append(d)
        df_ref[:] = jnp.concatenate(parts, axis=0)
        dt1 = cfl_dt1(ts, tgrid, cfg.time)
        dt1_ref[i, j] = jnp.max(dt1)

    out_shape = (
        jax.ShapeDtypeStruct((nvar, nx, ny, nz), jnp.dtype(cfg.dtype)),
        jax.ShapeDtypeStruct((gx, gy), jnp.dtype(cfg.dtype)),
    )
    vmem_bytes = (nc * (TX + 2 * g) * (TY + 2 * g) * (nz + 2 * g)) * 4
    interpret = jax.devices()[0].platform != "tpu"

    if not gs.periodic[2]:
        raise NotImplementedError("fused RHS v1 needs periodic z")

    call = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z vector (1, mz)
        ],
        out_specs=(
            pl.BlockSpec((nvar, TX, TY, nz), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nc, TX + 2 * g, YS, nz), jnp.dtype(cfg.dtype)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def rhs_fused(fg, z_vec):
        if ypad:
            # high-side y padding so every DMA slab is sublane-aligned
            fg = jnp.pad(fg, ((0, 0), (0, 0), (0, ypad), (0, 0)))
        return call(fg, z_vec.reshape(1, -1))

    return rhs_fused
