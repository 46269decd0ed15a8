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
                   fuse_update=False, wrap_ghosts=False, z_ghosted=False,
                   defer_prev=False, last=False, with_kick=False):
    """Returns rhs_fused(fg, z_int) -> (dfa, dt1_tiles), or with
    ``fuse_update`` rhs_fused(fg, z_int, df_prev, alpha, beta_dt) ->
    (df_new, fa_new, dt1_tiles) — the 2N-RK combine df ← α·df + rhs and
    state update f ← f + βΔt·df happen inside the kernel, saving ~3 full
    field-set round trips of HBM traffic per substep.

    fg: ghosted stack (nc, mx, my, mz); dfa: (nvar, nx, ny, nz);
    dt1_tiles: (gx, gy) per-tile max inverse timestep.
    ``local_shape`` overrides the global grid dims for sharded (per-device)
    evaluation inside shard_map.

    ``z_ghosted``: the state carries z ghost zones (filled by the ppermute
    halo exchange across a z-sharded mesh, or by physical z BCs on a
    non-periodic axis — reference finalize_isendrcv_bdry + boundconds_z,
    mpicomm.f90:1704/boundcond.f90:1283); stencils slice the z-ghosted
    tile instead of circular-rolling, so the megakernel survives
    z-sharding (round-2 verdict item #2).  Mosaic requires DMA slices to
    be 128-aligned in the lane (z) dim, so the ghosted stack is NOT DMA'd
    whole: the body rides the usual aligned DMA (lane extent nz) and the
    six z-halo planes arrive as pre-windowed Pallas inputs packed with z
    in the SUBLANE dim ((gx, gy, nc, TX+2g, 8, YS) — tiny blocks, 8-row
    sublane alignment), transposed and lane-concatenated with the body
    in-kernel (value-level relayouts, no unaligned memref slices).
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
    zext = nz + 2 * g if z_ghosted else nz  # tile z extent seen by Pencils
    YS = -(-(TY + 2 * g) // 8) * 8          # sublane-aligned DMA slab size
    ypad = YS - (TY + 2 * g)                # extra high-side y padding
    dx1 = 1.0 / gs.dx
    dy1 = 1.0 / gs.dy
    dz1 = 1.0 / gs.dz

    # analytic tile coordinates (uniform cartesian is a fused-path
    # invariant): periodic axes are half-cell shifted (grid.f90:141)
    x0_eff = gs.x0 + (0.5 * gs.dx if gs.periodic[0] else 0.0)
    y0_eff = gs.y0 + (0.5 * gs.dy if gs.periodic[1] else 0.0)

    # In-kernel x chunking: the DMA tile spans TX rows but the RHS is
    # evaluated CX rows at a time.  x is the OUTER (unpadded, vreg-major)
    # dim of every VMEM temporary, so an x-slice is a free vreg subset and
    # chunk temporaries cost (CX+2g)/(TX+2g) of the full-tile ones — the
    # VMEM register pressure that caps TX stays fixed while the DMA tile
    # (and with it the halo read amplification, (TX+2g)(TY+2g)/TX·TY)
    # shrinks toward 1.  Chunks overlap by 2g rows *in VMEM*, not HBM.
    # CX=1 wins on hardware (v5e, 256³ MHD: 0.93/0.99/1.01 of the 1e9
    # updates/s target at CX=8/2/1 — Mosaic keeps the single-row chunk
    # entirely in vregs); the interpreter pays per-chunk Python overhead
    # instead, so tests keep CX=4 (equivalence is shape-generic)
    _cx_default = 1 if jax.devices()[0].platform == "tpu" else 4
    CX = int(os.environ.get("PC_CX", 0)) or min(_cx_default, TX)

    def body(i, j, tile_fn, z_ref, emit, want_dt1=True):
        """Shared RHS evaluation on the DMA'd tile, x-chunked.  For each
        chunk calls ``emit(xs, dfa_c, tile_c)`` with the chunk's df block
        (nvar, cx, TY, nz) and its ghosted input slab
        (nc, cx+2g, TY+2g, zext) so the caller stores straight into the
        output refs — no full-tile df temporary ever materializes.
        Returns (tile, dt1max)."""
        tile = tile_fn()
        dt = tile.dtype
        if os.environ.get("PC_FAKE_RHS"):
            # perf instrumentation: skip the physics, keep the full memory
            # pipeline (DMA in, block out) to measure the memory-bound floor
            dfa = tile[:nvar, g:-g, g:-g, :] if not z_ghosted \
                else tile[:nvar, g:-g, g:-g, g:-g]
            emit(0, dfa * 1.0000001, tile)
            return tile, jnp.zeros((), dt)

        def eval_rhs(tile_c, x_lo):
            """RHS on one x-chunk (extent cx+2g rows, interior cx)."""
            cx = tile_c.shape[1] - 2 * g
            # broadcasted_iota: Mosaic rejects 1-D→3-D vector reshapes
            xi = (x_lo
                  + jax.lax.broadcasted_iota(jnp.int32, (cx, 1, 1), 0)
                  ).astype(dt)
            yj = (j * TY
                  + jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1)
                  ).astype(dt)
            tgrid = TileGrid(
                dx1=jnp.asarray(dx1, dt), dy1=jnp.asarray(dy1, dt),
                dz1=jnp.asarray(dz1, dt),
                dx_1=jnp.full((cx + 2 * g,), dx1, dt),
                dy_1=jnp.full((TY + 2 * g,), dy1, dt),
                dz_1=jnp.full((zext,), dz1, dt),
                xg=x0_eff + gs.dx * xi,
                yg=y0_eff + gs.dy * yj,
                zg=z_ref[0, g:-g][None, None, :],
                z=z_ref[0],
            )
            pen = Pencils(tile_c, tgrid, reg, cfg, eos,
                          wrap_z=not z_ghosted)
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
                    d = jnp.zeros((slot.ncomp, cx, TY, nz), dt)
                elif d.ndim == 3:
                    d = d[None]
                parts.append(d)
            dfa = jnp.concatenate(parts, axis=0)
            if not want_dt1:
                # 2N-RK substeps 2+ reuse substep 1's dt — skip the
                # pointwise CFL field (exp/sqrt per point) and its
                # reduction entirely
                return dfa, jnp.zeros((), dt)
            dt1 = cfl_dt1(ts, tgrid, cfg.time)
            return dfa, jnp.max(dt1)

        dt1m = jnp.zeros((), dt)
        for xs in range(0, TX, CX):
            tile_c = tile[:, xs:xs + CX + 2 * g]
            dfa_c, d1 = eval_rhs(tile_c, i * TX + xs)
            emit(xs, dfa_c, tile_c)
            dt1m = jnp.maximum(dt1m, d1)
        return tile, dt1m

    # DMA pipeline depth (slots of tile scratch): 2 = classic double
    # buffering; 3 hides more of the HBM latency of the many-piece fetches
    NSLOT = int(os.environ.get("PC_DMA_SLOTS", 0)) or 3

    def _dma_tile(fg_ref, scratch, sem, i, j):
        """Multi-buffered tile fetch: grid iterations run sequentially on
        the core and scratch persists across them, so each iteration waits
        on the DMA a predecessor launched and prefetches NSLOT-1 tiles
        ahead (Pallas double-buffering pattern, generalized)."""
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

        slot = jax.lax.rem(it, NSLOT)

        @pl.when(it == 0)
        def _():
            for ahead in range(min(NSLOT - 1, gx * gy)):
                dma_for(it + ahead, jax.lax.rem(it + ahead, NSLOT)).start()

        @pl.when(it + NSLOT - 1 < gx * gy)
        def _():
            dma_for(it + NSLOT - 1,
                    jax.lax.rem(it + NSLOT - 1, NSLOT)).start()

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

        slot = jax.lax.rem(it, NSLOT)

        @pl.when(it == 0)
        def _():
            for ahead in range(min(NSLOT - 1, gx * gy)):
                for c in dmas(it + ahead, jax.lax.rem(it + ahead, NSLOT)):
                    c.start()

        @pl.when(it + NSLOT - 1 < gx * gy)
        def _():
            for c in dmas(it + NSLOT - 1,
                          jax.lax.rem(it + NSLOT - 1, NSLOT)):
                c.start()

        for c in dmas(it, slot):
            c.wait()
        # pencil view: y ghost width is NGHOST (view offset GY−g)
        return scratch[slot, :, :, GY - g: GY + TY + g, :]

    fetch = None   # chosen below once wrap_ghosts helpers exist

    def _halo_tile(h_ref):
        """One windowed z-halo block → (nc, TX+2g, TY+2g, g) tile slab.
        Blocks are packed (1, 1, nc, TX+2g, 8, YS): z in the SUBLANE dim
        (3 planes padded to 8 rows) and y in the lane dim, so the Pallas
        pipeline DMA is sublane-aligned; unpacking is a value transpose."""
        h = h_ref[0, 0]                       # (nc, TX+2g, 8, YS)
        h = h[:, :, :g, : TY + 2 * g]
        return jnp.transpose(h, (0, 1, 3, 2))  # (nc, TX+2g, TY+2g, g)

    def _fetch_zg(fg_ref, zlo_ref, zhi_ref, scratch, sem, i, j):
        view = _dma_tile(fg_ref, scratch, sem, i, j)   # lane extent nz
        return jnp.concatenate(
            [_halo_tile(zlo_ref), view, _halo_tile(zhi_ref)], axis=-1)

    def kernel(fg_ref, z_ref, df_ref, dt1_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def emit(xs, dfa_c, _tile_c):
            df_ref[:, xs:xs + dfa_c.shape[1]] = dfa_c

        _, dt1m = body(i, j, lambda: fetch(fg_ref, scratch, sem, i, j),
                       z_ref, emit)
        dt1_ref[i, j] = dt1m

    def kernel_zg(fg_ref, zlo_ref, zhi_ref, z_ref, df_ref, dt1_ref,
                  scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def emit(xs, dfa_c, _tile_c):
            df_ref[:, xs:xs + dfa_c.shape[1]] = dfa_c

        _, dt1m = body(
            i, j,
            lambda: _fetch_zg(fg_ref, zlo_ref, zhi_ref, scratch, sem, i, j),
            z_ref, emit)
        dt1_ref[i, j] = dt1m

    def kernel_upd(fg_ref, z_ref, dfp_ref, ab_ref, df_ref, fa_ref, dt1_ref,
                   scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        alpha = ab_ref[0, 0]
        beta_dt = ab_ref[0, 1]

        def emit(xs, dfa_c, tile_c):
            cx = dfa_c.shape[1]
            dfn = alpha * dfp_ref[:, xs:xs + cx] + dfa_c
            df_ref[:, xs:xs + cx] = dfn
            fa_ref[:, xs:xs + cx] = (tile_c[:nvar, g:-g, g:-g, :]
                                     + beta_dt * dfn)

        _, dt1m = body(i, j, lambda: fetch(fg_ref, scratch, sem, i, j),
                       z_ref, emit, want_dt1=False)
        dt1_ref[i, j] = dt1m

    def kernel_zg_upd(fg_ref, zlo_ref, zhi_ref, z_ref, dfp_ref, ab_ref,
                      df_ref, fa_ref, dt1_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        alpha = ab_ref[0, 0]
        beta_dt = ab_ref[0, 1]

        def emit(xs, dfa_c, tile_c):
            cx = dfa_c.shape[1]
            dfn = alpha * dfp_ref[:, xs:xs + cx] + dfa_c
            df_ref[:, xs:xs + cx] = dfn
            fa_ref[:, xs:xs + cx] = (tile_c[:nvar, g:-g, g:-g, g:-g]
                                     + beta_dt * dfn)

        _, dt1m = body(
            i, j,
            lambda: _fetch_zg(fg_ref, zlo_ref, zhi_ref, scratch, sem, i, j),
            z_ref, emit, want_dt1=False)
        dt1_ref[i, j] = dt1m

    # ---- wrap-mode tail kernels (substeps 2..n of the 2N-RK chain) ------
    # defer_prev: substep 1's state update f1 = f0 + βΔt·df1 never touches
    #   HBM — substep 2 DMAs BOTH raw f0 and raw df1 (each with wrapped
    #   halos) and reconstructs the ghosted f1 in VMEM, eliminating a full
    #   field-set axpy round trip per step.
    # last: the final substep's df is dead after the update — skip its
    #   HBM write entirely.
    # with_kick: apply the stochastic helical forcing kick (addforce,
    #   src/run.f90:729) to uu inside the last substep's update, saving
    #   the separate read-modify-write pass over the velocity field.
    def kernel_tail(*refs):
        idx = 0
        fa_ref = refs[idx]; idx += 1
        dfh_ref = None
        if defer_prev:
            dfh_ref = refs[idx]; idx += 1
        z_ref = refs[idx]; idx += 1
        dfp_ref = None
        if not defer_prev:
            dfp_ref = refs[idx]; idx += 1
        ab_ref = refs[idx]; idx += 1
        kick_ref = None
        if with_kick:
            kick_ref = refs[idx]; idx += 1
        df_ref = None
        if not last:
            df_ref = refs[idx]; idx += 1
        fao_ref = refs[idx]; idx += 1
        dt1_ref = refs[idx]; idx += 1
        scrA = refs[idx]; semA = refs[idx + 1]; idx += 2
        if defer_prev:
            scrB = refs[idx]; semB = refs[idx + 1]; idx += 2

        i = pl.program_id(0)
        j = pl.program_id(1)
        alpha = ab_ref[0, 0]
        beta_dt = ab_ref[0, 1]
        cprev = ab_ref[0, 2]

        if defer_prev:
            tileD = _dma_tile_wrap(dfh_ref, scrB, semB, i, j)

            def tile_fn():
                tA = _dma_tile_wrap(fa_ref, scrA, semA, i, j)
                upd = tA[:nvar] + cprev * tileD
                if nc > nvar:
                    return jnp.concatenate([upd, tA[nvar:]], axis=0)
                return upd
        else:
            def tile_fn():
                return _dma_tile_wrap(fa_ref, scrA, semA, i, j)

        def emit(xs, dfa_c, tile_c):
            cx = dfa_c.shape[1]
            if defer_prev:
                dfp_c = tileD[:, g + xs:g + xs + cx, g:-g, :]
            else:
                dfp_c = dfp_ref[:, xs:xs + cx]
            dfn = alpha * dfp_c + dfa_c
            fa_new = tile_c[:nvar, g:-g, g:-g, :] + beta_dt * dfn
            if with_kick:
                dtp = fa_new.dtype
                iuu = model.reg.slice("uu").start
                xi = (i * TX + xs
                      + jax.lax.broadcasted_iota(jnp.int32, (cx, 1, 1), 0)
                      ).astype(dtp)
                yj = (j * TY
                      + jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1)
                      ).astype(dtp)
                xg = x0_eff + gs.dx * xi
                yg = y0_eff + gs.dy * yj
                zg = z_ref[0, g:-g][None, None, :]
                # th = k·x + φ is separable: angle-addition keeps the
                # transcendentals on the degenerate broadcast axes (a
                # per-point cos/sin pair costs ~2 ms/step at 256³ on the
                # VPU; this form is 3 mul-adds per point)
                A = kick_ref[0, 0] * xg + kick_ref[0, 3]   # (cx,1,1)
                B = kick_ref[0, 1] * yg                    # (1,TY,1)
                C = kick_ref[0, 2] * zg                    # (1,1,nz)
                cA, sA = jnp.cos(A), jnp.sin(A)
                cB, sB = jnp.cos(B), jnp.sin(B)
                cC, sC = jnp.cos(C), jnp.sin(C)
                P = cA * cB - sA * sB                      # cos(A+B)
                Q = sA * cB + cA * sB                      # sin(A+B)
                amp = kick_ref[0, 10]
                kicked = []
                for c_ in range(3):
                    # a·cosθ − b·sinθ = P(a·cC − b·sC) − Q(a·sC + b·cC)
                    a_ = kick_ref[0, 4 + c_]
                    b_ = kick_ref[0, 7 + c_]
                    U = a_ * cC - b_ * sC                  # (1,1,nz)
                    V = a_ * sC + b_ * cC
                    duu = amp * (P * U - Q * V)
                    kicked.append(fa_new[iuu + c_] + duu)
                parts = ([fa_new[:iuu]] if iuu > 0 else []) \
                    + [k[None] for k in kicked] \
                    + ([fa_new[iuu + 3:]] if iuu + 3 < nvar else [])
                fa_new = jnp.concatenate(parts, axis=0)
            if not last:
                df_ref[:, xs:xs + cx] = dfn
            fao_ref[:, xs:xs + cx] = fa_new

        body(i, j, tile_fn, z_ref, emit, want_dt1=False)
        dt1_ref[i, j] = jnp.zeros_like(alpha)

    interpret = jax.devices()[0].platform != "tpu"

    if not z_ghosted and not gs.periodic[2]:
        raise NotImplementedError(
            "fused RHS: non-periodic z requires z_ghosted tiles")
    if wrap_ghosts and z_ghosted:
        raise NotImplementedError("wrap_ghosts and z_ghosted are exclusive")

    dtype = jnp.dtype(cfg.dtype)
    vmem_mb = int(os.environ.get("PC_VMEM_MB", 0)) or 100
    cparams = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
    blk = pl.BlockSpec((nvar, TX, TY, nz), lambda i, j: (0, i, j, 0),
                       memory_space=pltpu.VMEM)
    if wrap_ghosts:
        if not (gs.periodic[0] and gs.periodic[1]):
            raise NotImplementedError("wrap_ghosts needs periodic x and y")
        fetch = _dma_tile_wrap
        scratch_shapes = [
            pltpu.VMEM((NSLOT, nc, TX + 2 * g, YW, nz), dtype),
            pltpu.SemaphoreType.DMA((NSLOT, 9)),
        ]
    else:
        fetch = _dma_tile
        scratch_shapes = [
            pltpu.VMEM((NSLOT, nc, TX + 2 * g, YS, nz), dtype),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ]

    # z-halo windowed blocks: (gx, gy, nc, TX+2g, 8, YS), z in sublane
    halo_spec = pl.BlockSpec(
        (1, 1, nc, TX + 2 * g, 8, YS),
        lambda i, j: (i, j, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)

    import numpy as _np
    _xi = _np.arange(gx)[:, None] * TX + _np.arange(TX + 2 * g)[None, :]
    _yi = _np.arange(gy)[:, None] * TY + _np.arange(YS)[None, :]

    def _window_halo(zh):
        """(nc, mx, my_pad, g) z-halo planes → (gx, gy, nc, TX+2g, 8, YS)
        overlapping per-tile windows, z packed into the sublane dim."""
        zt = jnp.transpose(zh, (0, 1, 3, 2))          # (nc, mx, g, my_pad)
        zt = jnp.pad(zt, ((0, 0), (0, 0), (0, 8 - g), (0, 0)))
        w = zt[:, _xi]                                # (nc,gx,TX+2g,8,my)
        w = w[..., _yi]                               # (nc,gx,TX+2g,8,gy,YS)
        return jnp.transpose(w, (1, 4, 0, 2, 3, 5))

    def _split_z(fgz):
        """Fully-ghosted stack (lane extent nz+2g) → aligned body + halos."""
        return (fgz[..., g:-g], fgz[..., :g], fgz[..., -g:])

    def _maybe_ypad(fg):
        if not wrap_ghosts and ypad and fg.shape[2] == ny + 2 * g:
            # high-side y padding so every DMA slab is sublane-aligned
            # (callers that pre-pad via fill_ghosts extra_hi skip this)
            fg = jnp.pad(fg, ((0, 0), (0, 0), (0, ypad), (0, 0)))
        return fg

    if defer_prev or last or with_kick:
        if not (wrap_ghosts and fuse_update):
            raise NotImplementedError(
                "tail kernels are wrap-mode update kernels")
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]        # fa raw
        if defer_prev:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # df raw
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))     # z vec
        if not defer_prev:
            in_specs.append(blk)                                   # df_prev
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))     # ab (1,3)
        if with_kick:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (1,12)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        if last:
            out_specs = (blk, smem)
            out_shape = (
                jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),   # fa_new
                jax.ShapeDtypeStruct((gx, gy), dtype),
            )
            aliases = {}
        else:
            out_specs = (blk, blk, smem)
            out_shape = (
                jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),   # df_new
                jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),   # fa_new
                jax.ShapeDtypeStruct((gx, gy), dtype),
            )
            # df_prev blk may be donated into df_new; NEVER alias the
            # wrap-DMA'd raw inputs (later tiles read neighbor halos that
            # an aliased write would have clobbered)
            aliases = {} if defer_prev else {2: 0}
        tail_scratch = [
            pltpu.VMEM((NSLOT, nc, TX + 2 * g, YW, nz), dtype),
            pltpu.SemaphoreType.DMA((NSLOT, 9)),
        ]
        if defer_prev:
            tail_scratch += [
                pltpu.VMEM((NSLOT, nvar, TX + 2 * g, YW, nz), dtype),
                pltpu.SemaphoreType.DMA((NSLOT, 9)),
            ]
        call = pl.pallas_call(
            kernel_tail,
            grid=(gx, gy),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=tail_scratch,
            compiler_params=cparams,
            interpret=interpret,
            input_output_aliases=aliases,
        )

        def rhs_tail(fa, z_vec, df_prev, alpha, beta_dt, cprev=0.0,
                     kick=None):
            """Substep-tail call.  Returns fa_new (last) or
            (df_new, fa_new)."""
            ab = jnp.stack([jnp.asarray(alpha, dtype),
                            jnp.asarray(beta_dt, dtype),
                            jnp.asarray(cprev, dtype)]).reshape(1, 3)
            args = [fa]
            if defer_prev:
                args.append(df_prev)
            args.append(z_vec.reshape(1, -1))
            if not defer_prev:
                args.append(df_prev)
            args.append(ab)
            if with_kick:
                k_phys, phase, f_re, f_im, Ndt = kick
                kv = jnp.concatenate([
                    k_phys.astype(dtype), jnp.reshape(phase, (1,)).astype(dtype),
                    f_re.astype(dtype), f_im.astype(dtype),
                    jnp.reshape(Ndt, (1,)).astype(dtype),
                    jnp.zeros((1,), dtype)]).reshape(1, 12)
                args.append(kv)
            out = call(*args)
            if last:
                return out[0]
            return out[0], out[1]

        rhs_tail.ypad = ypad
        rhs_tail.wrap_ghosts = True
        rhs_tail.z_ghosted = False
        return rhs_tail

    if not fuse_update:
        if z_ghosted:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.ANY),
                halo_spec, halo_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),  # z vector (1, mz)
            ]
            kern = kernel_zg
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # z vector (1, mz)
            ]
            kern = kernel
        call = pl.pallas_call(
            kern,
            grid=(gx, gy),
            in_specs=in_specs,
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
            fg = _maybe_ypad(fg)
            if z_ghosted:
                bodyz, zlo, zhi = _split_z(fg)
                return call(bodyz, _window_halo(zlo), _window_halo(zhi),
                            z_vec.reshape(1, -1))
            return call(fg, z_vec.reshape(1, -1))

        rhs_fused.ypad = ypad
        rhs_fused.wrap_ghosts = wrap_ghosts
        rhs_fused.z_ghosted = z_ghosted
        return rhs_fused

    if z_ghosted:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            halo_spec, halo_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),      # z vector
            blk,                                         # df_prev
            pl.BlockSpec(memory_space=pltpu.SMEM),       # (1,2) alpha,βΔt
        ]
        kern = kernel_zg_upd
        aliases = {4: 0}
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # z vector
            blk,                                         # df_prev
            pl.BlockSpec(memory_space=pltpu.SMEM),       # (1,2) alpha,βΔt
        ]
        kern = kernel_upd
        aliases = {2: 0}
    call = pl.pallas_call(
        kern,
        grid=(gx, gy),
        in_specs=in_specs,
        out_specs=(blk, blk, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),  # df_new
            jax.ShapeDtypeStruct((nvar, nx, ny, nz), dtype),  # fa_new
            jax.ShapeDtypeStruct((gx, gy), dtype),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=cparams,
        interpret=interpret,
        input_output_aliases=aliases,  # df_prev buffer reused for df_new
    )

    def rhs_fused_update(fg, z_vec, df_prev, alpha, beta_dt):
        fg = _maybe_ypad(fg)
        ab = jnp.stack([jnp.asarray(alpha, dtype),
                        jnp.asarray(beta_dt, dtype)]).reshape(1, 2)
        if z_ghosted:
            bodyz, zlo, zhi = _split_z(fg)
            return call(bodyz, _window_halo(zlo), _window_halo(zhi),
                        z_vec.reshape(1, -1), df_prev, ab)
        return call(fg, z_vec.reshape(1, -1), df_prev, ab)

    rhs_fused_update.ypad = ypad
    rhs_fused_update.wrap_ghosts = wrap_ghosts
    rhs_fused_update.z_ghosted = z_ghosted
    return rhs_fused_update
