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
    """Largest candidate ≤ n dividing n, preferring ``target`` (empirically
    TX=8, TY=64 is the sweet spot at 256³ on v5e with wrapped-DMA
    ghosts + z rolls; 8/32 with the HBM-ghosted path)."""
    for t in (target, 32, 16, 8, 4, 64, 2, n):
        if n % t == 0 and t <= n:
            return t
    return n


def make_fused_rhs(model, tx=None, ty=None, local_shape=None,
                   fuse_update=False, wrap_ghosts=False, z_ghosted=False):
    """Returns rhs_fused(fg, z_int) -> (dfa, dt1_tiles), or with
    ``fuse_update`` rhs_fused(fg, z_int, df_prev, alpha, beta_dt) ->
    (df_new, fa_new, dt1_tiles) — the 2N-RK combine df ← α·df + rhs and
    state update f ← f + βΔt·df happen inside the kernel, saving ~3 full
    field-set round trips of HBM traffic per substep.

    fg: ghosted stack (nc, mx, my, mz); dfa: (nvar, nx, ny, nz);
    dt1_tiles: (gx, gy) per-tile max inverse timestep.
    ``local_shape`` overrides the global grid dims for sharded (per-device)
    evaluation inside shard_map.

    ``z_ghosted``: the state carries z ghost zones in HBM (filled by the
    ppermute halo exchange across a z-sharded mesh, or by physical z BCs
    on a non-periodic axis — reference finalize_isendrcv_bdry +
    boundconds_z, mpicomm.f90:1704/boundcond.f90:1283); tiles DMA the
    z-ghosted slab and stencils slice instead of circular-rolling, so the
    megakernel survives z-sharding (round-2 verdict item #2).
    """
    cfg = model.cfg
    reg = model.reg
    eos = model.eos
    gs = cfg.grid
    if gs.grid_func != ("uniform", "uniform", "uniform") or gs.coords != "cartesian":
        raise NotImplementedError("fused RHS v1: uniform Cartesian only")
    nx, ny, nz = local_shape or (gs.nx, gs.ny, gs.nz)
    g = NGHOST
    import os
    TX = tx or int(os.environ.get("PC_TX", 0)) or _choose_tile(nx, target=8)
    TY = ty or int(os.environ.get("PC_TY", 0)) or _choose_tile(ny, target=64)
    gx, gy = nx // TX, ny // TY
    nc = reg.ncom
    nvar = reg.nvar
    zext = nz + 2 * g if z_ghosted else nz  # DMA/scratch lane extent
    YS = -(-(TY + 2 * g) // 8) * 8          # sublane-aligned DMA slab size
    ypad = YS - (TY + 2 * g)                # extra high-side y padding
    dx1 = 1.0 / gs.dx
    dy1 = 1.0 / gs.dy
    dz1 = 1.0 / gs.dz

    # analytic tile coordinates (uniform cartesian is a fused-path
    # invariant): periodic axes are half-cell shifted (grid.f90:141)
    x0_eff = gs.x0 + (0.5 * gs.dx if gs.periodic[0] else 0.0)
    y0_eff = gs.y0 + (0.5 * gs.dy if gs.periodic[1] else 0.0)

    def body(i, j, tile_fn, z_ref, want_dt1=True):
        """Shared RHS evaluation on the DMA'd tile; returns (dfa, dt1max)."""
        tile = tile_fn()
        dt = tile.dtype
        # broadcasted_iota: Mosaic rejects 1-D→3-D vector reshapes
        xi = (i * TX
              + jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0)
              ).astype(dt)
        yj = (j * TY
              + jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1)
              ).astype(dt)
        tgrid = TileGrid(
            dx1=jnp.asarray(dx1, dt), dy1=jnp.asarray(dy1, dt),
            dz1=jnp.asarray(dz1, dt),
            dx_1=jnp.full((TX + 2 * g,), dx1, dt),
            dy_1=jnp.full((TY + 2 * g,), dy1, dt),
            dz_1=jnp.full((zext,), dz1, dt),
            xg=x0_eff + gs.dx * xi,
            yg=y0_eff + gs.dy * yj,
            zg=z_ref[0, g:-g][None, None, :],
            z=z_ref[0],
        )
        pen = Pencils(tile, tgrid, reg, cfg, eos, wrap_z=not z_ghosted)
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
        dfa = jnp.concatenate(parts, axis=0)
        if not want_dt1:
            # 2N-RK substeps 2+ reuse substep 1's dt — skip the pointwise
            # CFL field (exp/sqrt per point) and its reduction entirely
            return tile, dfa, jnp.zeros((), dt)
        dt1 = cfl_dt1(ts, tgrid, cfg.time)
        return tile, dfa, jnp.max(dt1)

    def _dma_tile(fg_ref, scratch, sem, i, j):
        """Double-buffered tile fetch: grid iterations run sequentially on
        the core and scratch persists across them, so each iteration waits
        on the DMA its predecessor launched and prefetches the next tile
        (Pallas double-buffering pattern)."""
        it = i * gy + j

        def dma_for(step_idx, slot):
            ii = step_idx // gy
            jj = step_idx % gy
            return pltpu.make_async_copy(
                fg_ref.at[:, pl.ds(ii * TX, TX + 2 * g),
                          pl.ds(jj * TY, YS), :],
                scratch.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(it, 2)
        nslot = jax.lax.rem(it + 1, 2)

        @pl.when(it == 0)
        def _():
            dma_for(it, slot).start()

        @pl.when(it + 1 < gx * gy)
        def _():
            dma_for(it + 1, nslot).start()

        dma_for(it, slot).wait()
        # z is periodic and spans the full extent per tile: stencils along
        # z use circular rolls (Pencils wrap_z), so the tile needs NO z
        # halo and no copy — HBM slabs stay 128-lane aligned.
        return scratch[slot, :, :, : TY + 2 * g, :]

    # ---- in-kernel periodic ghosts (no HBM ghost pass at all) -----------
    # The state stays RAW (nc, nx, ny, nz) in HBM; each tile's x/y halos
    # are fetched by wrapped DMAs: x offsets are unconstrained, y slabs are
    # fetched as 8-aligned pieces (halo rounded 3→8), so all 9 (x-piece ×
    # y-piece) region copies are contiguous and aligned.  Combined with the
    # z circular rolls this removes the per-substep jnp.pad/wrap pass that
    # cost ~25% of step time.
    GY = 8                          # aligned y halo fetch width
    YW = TY + 2 * GY                # scratch y extent (8-aligned)

    def _dma_tile_wrap(fa_ref, scratch, sem, i, j):
        it = i * gy + j

        def dmas(step_idx, slot):
            ii = step_idx // gy
            jj = step_idx % gy
            xparts = (
                (jax.lax.rem(ii * TX - g + nx, nx), 0, g),
                (ii * TX, g, TX),
                (jax.lax.rem(ii * TX + TX, nx), g + TX, g),
            )
            # y offsets written as 8×(provably-integer) so Mosaic can prove
            # sublane-tiling divisibility of the wrapped DMA slabs
            ny8 = ny // 8
            ty8 = TY // 8
            yparts = (
                (8 * jax.lax.rem(jj * ty8 - 1 + ny8, ny8), 0, GY),
                (8 * (jj * ty8), GY, TY),
                (8 * jax.lax.rem(jj * ty8 + ty8, ny8), GY + TY, GY),
            )
            out = []
            k = 0
            for sx, dx_, lx in xparts:
                for sy, dy_, ly in yparts:
                    out.append(pltpu.make_async_copy(
                        fa_ref.at[:, pl.ds(sx, lx), pl.ds(sy, ly), :],
                        scratch.at[slot, :, pl.ds(dx_, lx),
                                   pl.ds(dy_, ly), :],
                        sem.at[slot, k],
                    ))
                    k += 1
            return out

        slot = jax.lax.rem(it, 2)
        nslot = jax.lax.rem(it + 1, 2)

        @pl.when(it == 0)
        def _():
            for c in dmas(it, slot):
                c.start()

        @pl.when(it + 1 < gx * gy)
        def _():
            for c in dmas(it + 1, nslot):
                c.start()

        for c in dmas(it, slot):
            c.wait()
        # pencil view: y ghost width is NGHOST (view offset GY−g)
        return scratch[slot, :, :, GY - g: GY + TY + g, :]

    fetch = None   # chosen below once wrap_ghosts helpers exist

    def kernel(fg_ref, z_ref, df_ref, dt1_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        _, dfa, dt1m = body(i, j, lambda: fetch(fg_ref, scratch, sem, i, j),
                            z_ref)
        df_ref[:] = dfa
        dt1_ref[i, j] = dt1m

    def kernel_upd(fg_ref, z_ref, dfp_ref, ab_ref, df_ref, fa_ref, dt1_ref,
                   scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        tile, dfa, dt1m = body(
            i, j, lambda: fetch(fg_ref, scratch, sem, i, j), z_ref,
            want_dt1=False)
        alpha = ab_ref[0, 0]
        beta_dt = ab_ref[0, 1]
        dfn = alpha * dfp_ref[:] + dfa
        df_ref[:] = dfn
        body_z = tile[:nvar, g:-g, g:-g, g:-g] if z_ghosted \
            else tile[:nvar, g:-g, g:-g, :]
        fa_ref[:] = body_z + beta_dt * dfn
        dt1_ref[i, j] = dt1m

    interpret = jax.devices()[0].platform != "tpu"

    if not z_ghosted and not gs.periodic[2]:
        raise NotImplementedError(
            "fused RHS: non-periodic z requires z_ghosted tiles")
    if wrap_ghosts and z_ghosted:
        raise NotImplementedError("wrap_ghosts and z_ghosted are exclusive")

    dtype = jnp.dtype(cfg.dtype)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = pl.BlockSpec((nvar, TX, TY, nz), lambda i, j: (0, i, j, 0),
                       memory_space=pltpu.VMEM)
    if wrap_ghosts:
        if not (gs.periodic[0] and gs.periodic[1]):
            raise NotImplementedError("wrap_ghosts needs periodic x and y")
        fetch = _dma_tile_wrap
        scratch_shapes = [
            pltpu.VMEM((2, nc, TX + 2 * g, YW, nz), dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ]
    else:
        fetch = _dma_tile
        scratch_shapes = [
            pltpu.VMEM((2, nc, TX + 2 * g, YS, zext), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    if not fuse_update:
        call = pl.pallas_call(
            kernel,
            grid=(gx, gy),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # z vector (1, mz)
            ],
            out_specs=(blk, pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),
                jax.ShapeDtypeStruct((gx, gy), dtype),
            ),
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )

        def rhs_fused(fg, z_vec):
            if not wrap_ghosts and ypad and fg.shape[2] == ny + 2 * g:
                # high-side y padding so every DMA slab is sublane-aligned
                # (callers that pre-pad via fill_ghosts extra_hi skip this)
                fg = jnp.pad(fg, ((0, 0), (0, 0), (0, ypad), (0, 0)))
            return call(fg, z_vec.reshape(1, -1))

        rhs_fused.ypad = ypad
        rhs_fused.wrap_ghosts = wrap_ghosts
        rhs_fused.z_ghosted = z_ghosted
        return rhs_fused

    call = pl.pallas_call(
        kernel_upd,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # z vector
            blk,                                         # df_prev
            pl.BlockSpec(memory_space=pltpu.SMEM),       # (1,2) alpha,βΔt
        ],
        out_specs=(blk, blk, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),  # df_new
            jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),  # fa_new
            jax.ShapeDtypeStruct((gx, gy), dtype),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=cparams,
        interpret=interpret,
        input_output_aliases={2: 0},  # df_prev buffer reused for df_new
    )

    def rhs_fused_update(fg, z_vec, df_prev, alpha, beta_dt):
        if not wrap_ghosts and ypad and fg.shape[2] == ny + 2 * g:
            fg = jnp.pad(fg, ((0, 0), (0, 0), (0, ypad), (0, 0)))
        ab = jnp.stack([jnp.asarray(alpha, dtype),
                        jnp.asarray(beta_dt, dtype)]).reshape(1, 2)
        return call(fg, z_vec.reshape(1, -1), df_prev, ab)

    rhs_fused_update.ypad = ypad
    rhs_fused_update.wrap_ghosts = wrap_ghosts
    rhs_fused_update.z_ghosted = z_ghosted
    return rhs_fused_update
