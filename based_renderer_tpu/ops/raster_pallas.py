"""Tile-binned Pallas TPU rasterizer — the production raster path.

This is the renderer's central native component: the TPU replacement for
the fixed-function rasterizer the reference merely configures
(/root/reference/src/main.cpp:1777-1842).  One Pallas program per screen
tile keeps the tile's depth/visibility state in VMEM scratch and loops
over that tile's binned triangle records (ops/binning.py) with pure int32
VPU arithmetic — identical, by the anchored-exactness proofs in
ops/fixedpoint.py, to the exact-arithmetic XLA path and the CPU oracle.

Dataflow per tile (grid = (num_ty, num_tx)):
  scalar-prefetched tile_start/tile_count index a flat record array in
  HBM; records stream in CHUNK-row slices into double-buffered VMEM
  scratch via async DMA overlapping the raster loop; the inner loop
  rasterizes one record per iteration over the whole (TH, TW) tile
  vectorized on the VPU; finally the VMEM visibility state is written to
  the output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fixedpoint as fp
from .binning import FRECORD_BASE, bin_triangles, frecord_width, ftid_col, record_width
from .raster_xla import VisBuffer, stencil_test, stencil_update
from .setup import TriSetup

CHUNK = 128  # records DMA'd per step
NUM_SAMPLES = 4  # MSAA-4x sample count (fp.MSAA4_OFFSETS)


def _depth_cmp(compare: str, z, zbuf):
    if compare == "never":
        return jnp.zeros(z.shape, jnp.bool_)
    if compare == "less":
        return z < zbuf
    if compare == "equal":
        return z == zbuf
    if compare == "less_equal":
        return z <= zbuf
    if compare == "greater":
        return z > zbuf
    if compare == "not_equal":
        return z != zbuf
    if compare == "greater_equal":
        return z >= zbuf
    if compare == "always":
        return jnp.ones(z.shape, jnp.bool_)
    raise ValueError(compare)


def _raster_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (MAXPAIRS, RECORD_WIDTH) int32, stays in HBM
    frecords_hbm,  # (MAXPAIRS, FRECORD_WIDTH) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_test: bool,
    depth_compare: str,
    depth_write: bool,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    skip_losers: bool,
    stencil=None,
    stencil_clear: int = 0,
    unroll: int = 1,
):
    # rest = [init blocks x5(+stencil) if has_init] + outputs (5 + 1 invw +
    # num_channels + stencil?) + scratch (2 chunks + int tiles + f32 tiles
    # + 2 sems).
    use_stencil = stencil is not None and stencil.enable
    nout = 6 + num_channels + (1 if use_stencil else 0)
    ninit = (6 if use_stencil else 5) if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6 : 6 + num_channels]
    stencil_ref = outs[-1] if use_stencil else None
    scratch = rest[ninit + nout :]
    chunk_vmem, fchunk_vmem, zs, ids = scratch[:4]
    k = 4
    sts = scratch[k] if use_stencil else None
    k += 1 if use_stencil else 0
    b0s, b1s, b2s, iws = scratch[k : k + 4]
    chs = scratch[k + 4 : k + 4 + num_channels]
    sems, fsems = scratch[k + 4 + num_channels :]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * num_tx + tx
    # Records sit at arbitrary sorted offsets; DMA windows round the
    # start down to a CHUNK multiple (Mosaic requires aligned offsets)
    # and the leading foreign records are skipped by index.
    raw_start = tile_start_ref[tile]
    start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
    skip = raw_start - start
    count = tile_count_ref[tile] + skip

    if has_init:
        # Continue an earlier draw's visibility state (multi-draw frames).
        i_id, i_z, i_b0, i_b1, i_b2 = init_refs[:5]
        ids[:] = i_id[:]
        zs[:] = i_z[:]
        b0s[:] = i_b0[:]
        b1s[:] = i_b1[:]
        b2s[:] = i_b2[:]
        if use_stencil:
            sts[:] = init_refs[5][:]
    else:
        zs[:] = jnp.full((tile_h, tile_w), jnp.int32(clear_depth_q))
        ids[:] = jnp.full((tile_h, tile_w), jnp.int32(-1))
        b0s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b2s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        if use_stencil:
            sts[:] = jnp.full((tile_h, tile_w), jnp.int32(stencil_clear & 0xFF))
    iws[:] = jnp.ones((tile_h, tile_w), jnp.float32)
    for ch in chs:
        ch[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = ix + tx * tile_w
        gy_pix = iy + ty * tile_h
        scissor_mask = (gx_pix >= sx0) & (gx_pix < sx1) & (gy_pix >= sy0) & (gy_pix < sy1)
    else:
        scissor_mask = None

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk_vmem.at[slot],
            fsems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()
        get_fdma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()
            get_fdma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        get_fdma(slot, c).wait()

        def rec_body(i, _):
            # Loop bounds already restrict i to this tile's live records.
            def f(j):
                return chunk_vmem[slot, j, i]  # scalar field read

            e0 = f(0) + f(3) * ix + f(6) * iy
            e1 = f(1) + f(4) * ix + f(7) * iy
            e2 = f(2) + f(5) * ix + f(8) * iy
            covered = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            if scissor_mask is not None:
                covered = covered & scissor_mask

            zshift = f(12)
            z_u = f(9) + f(10) * ix + f(11) * iy
            hi = jnp.right_shift(jnp.int32(1 << 29), zshift) + jnp.int32(1)
            z = jnp.left_shift(jnp.clip(z_u, -hi, hi), zshift) + jnp.int32(1 << 29)
            if depth_clip == "clamp":
                z = jnp.clip(z, 0, jnp.int32(fp.DEPTH_ONE_Q))
            elif depth_clip:
                covered = covered & (z >= 0) & (z <= jnp.int32(fp.DEPTH_ONE_Q))
            if depth_test:
                d_pass = _depth_cmp(depth_compare, z, zs[:])
            else:
                d_pass = jnp.ones((tile_h, tile_w), jnp.bool_)
            if use_stencil:
                s_pass = stencil_test(stencil, sts[:])
                sts[:] = stencil_update(stencil, sts[:], covered, s_pass, d_pass)
                passes = covered & s_pass & d_pass
            else:
                passes = covered & d_pass

            # Records that win no pixel (fully occluded, or a bbox-binned
            # sliver missing the tile) can skip interpolation and
            # writeback entirely — with depth testing this prunes
            # overdraw on dense meshes (opt-in: the any-reduce costs more
            # than it saves on low-overlap scenes).
            def writeback():
                def ff(j):
                    return fchunk_vmem[slot, j, i]

                ixf = ix.astype(jnp.float32)
                iyf = iy.astype(jnp.float32)

                def plane(off):
                    return ff(off) + ff(off + 1) * ixf + ff(off + 2) * iyf

                nb0 = plane(0)
                nb1 = plane(3)
                nb2 = (1.0 - nb0) - nb1
                if depth_write:
                    zs[:] = jnp.where(passes, z, zs[:])
                ids[:] = jnp.where(passes, f(13), ids[:])
                b0s[:] = jnp.where(passes, nb0, b0s[:])
                b1s[:] = jnp.where(passes, nb1, b1s[:])
                b2s[:] = jnp.where(passes, nb2, b2s[:])
                iws[:] = jnp.where(passes, plane(6), iws[:])
                for ci, ch in enumerate(chs):
                    ch[:] = jnp.where(passes, plane(FRECORD_BASE + 3 * ci), ch[:])

            if skip_losers:
                pl.when(jnp.any(passes))(writeback)
            else:
                writeback()

            return 0

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)
        if unroll > 1:
            # Fixed-trip unrolled loop with per-record live masking: the
            # scalar loop machinery (bounds checks, scalar reads) is the
            # dense-mesh floor, so amortize it across ``unroll`` records.
            def rec_masked(i, _):
                @pl.when((i >= lo) & (i < hi_b))
                def _():
                    rec_body(i, 0)

                return 0

            def u_body(u, _):
                for r in range(unroll):
                    rec_masked(u * unroll + r, 0)
                return 0

            jax.lax.fori_loop(
                lo // unroll, pl.cdiv(hi_b, unroll), u_body, 0, unroll=False
            )
        else:
            jax.lax.fori_loop(lo, hi_b, rec_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    tri_id_ref[:] = ids[:]
    depth_ref[:] = zs[:]
    b0_ref[:] = b0s[:]
    b1_ref[:] = b1s[:]
    b2_ref[:] = b2s[:]
    invw_ref[:] = iws[:]
    for cr, ch in zip(chan_refs, chs):
        cr[:] = ch[:]
    if use_stencil:
        stencil_ref[:] = sts[:]


def _raster_kernel_two_pass(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (RECORD_WIDTH, MAXPAIRS) int32, stays in HBM
    frecords_hbm,  # (FRECORD_WIDTH, MAXPAIRS) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_test: bool,
    depth_compare: str,
    depth_write: bool,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    stencil=None,
    stencil_clear: int = 0,
):
    """Two-pass variant: an int-only visibility pass records the winning
    record index per pixel; a second pass replays only the float-plane
    interpolation, skipping records that won no pixel.  Dense-mesh frames
    are record-bound, and most records lose every pixel (occlusion +
    bbox-binned slivers), so pass 2 is nearly free — the per-record cost
    drops to the int visibility math.
    """
    use_stencil = stencil is not None and stencil.enable
    nout = 6 + num_channels + (1 if use_stencil else 0)
    ninit = (6 if use_stencil else 5) if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6 : 6 + num_channels]
    stencil_ref = outs[-1] if use_stencil else None
    scratch = rest[ninit + nout :]
    chunk_vmem, fchunk_vmem, zs, ids, widx = scratch[:5]
    k = 5
    sts = scratch[k] if use_stencil else None
    k += 1 if use_stencil else 0
    b0s, b1s, b2s, iws = scratch[k : k + 4]
    chs = scratch[k + 4 : k + 4 + num_channels]
    sems, fsems = scratch[k + 4 + num_channels :]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * num_tx + tx
    raw_start = tile_start_ref[tile]
    start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
    skip = raw_start - start
    count = tile_count_ref[tile] + skip

    if has_init:
        i_id, i_z, i_b0, i_b1, i_b2 = init_refs[:5]
        ids[:] = i_id[:]
        zs[:] = i_z[:]
        b0s[:] = i_b0[:]
        b1s[:] = i_b1[:]
        b2s[:] = i_b2[:]
        if use_stencil:
            sts[:] = init_refs[5][:]
    else:
        zs[:] = jnp.full((tile_h, tile_w), jnp.int32(clear_depth_q))
        ids[:] = jnp.full((tile_h, tile_w), jnp.int32(-1))
        b0s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b2s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        if use_stencil:
            sts[:] = jnp.full((tile_h, tile_w), jnp.int32(stencil_clear & 0xFF))
    widx[:] = jnp.full((tile_h, tile_w), jnp.int32(-1))
    iws[:] = jnp.ones((tile_h, tile_w), jnp.float32)
    for ch in chs:
        ch[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = ix + tx * tile_w
        gy_pix = iy + ty * tile_h
        scissor_mask = (gx_pix >= sx0) & (gx_pix < sx1) & (gy_pix >= sy0) & (gy_pix < sy1)
    else:
        scissor_mask = None

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk_vmem.at[slot],
            fsems.at[slot],
        )

    # ---- pass 1: int visibility ------------------------------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()

        def rec_body(i, _):
            def f(j):
                return chunk_vmem[slot, j, i]

            e0 = f(0) + f(3) * ix + f(6) * iy
            e1 = f(1) + f(4) * ix + f(7) * iy
            e2 = f(2) + f(5) * ix + f(8) * iy
            covered = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            if scissor_mask is not None:
                covered = covered & scissor_mask

            zshift = f(12)
            z_u = f(9) + f(10) * ix + f(11) * iy
            hi = jnp.right_shift(jnp.int32(1 << 29), zshift) + jnp.int32(1)
            z = jnp.left_shift(jnp.clip(z_u, -hi, hi), zshift) + jnp.int32(1 << 29)
            if depth_clip == "clamp":
                z = jnp.clip(z, 0, jnp.int32(fp.DEPTH_ONE_Q))
            elif depth_clip:
                covered = covered & (z >= 0) & (z <= jnp.int32(fp.DEPTH_ONE_Q))
            if depth_test:
                d_pass = _depth_cmp(depth_compare, z, zs[:])
            else:
                d_pass = jnp.ones((tile_h, tile_w), jnp.bool_)
            if use_stencil:
                s_pass = stencil_test(stencil, sts[:])
                sts[:] = stencil_update(stencil, sts[:], covered, s_pass, d_pass)
                passes = covered & s_pass & d_pass
            else:
                passes = covered & d_pass
            if depth_write:
                zs[:] = jnp.where(passes, z, zs[:])
            ids[:] = jnp.where(passes, f(13), ids[:])
            widx[:] = jnp.where(passes, c * CHUNK + i, widx[:])
            return 0

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)
        jax.lax.fori_loop(lo, hi_b, rec_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    # ---- pass 2: float planes for surviving records only ------------------
    # Only chunks containing a winner need work (and their frecord DMA).
    win_max = jnp.max(widx[:])

    @pl.when(win_max >= 0)
    def _():
        get_fdma(0, 0).start()

    last_chunk = win_max // CHUNK  # -1 when no winners

    def fchunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 <= last_chunk)
        def _():
            get_fdma((c + 1) % 2, c + 1).start()

        get_fdma(slot, c).wait()

        def rec_body(i, _):
            mask = widx[:] == c * CHUNK + i

            @pl.when(jnp.any(mask))
            def _():
                def ff(j):
                    return fchunk_vmem[slot, j, i]

                ixf = ix.astype(jnp.float32)
                iyf = iy.astype(jnp.float32)

                def plane(off):
                    return ff(off) + ff(off + 1) * ixf + ff(off + 2) * iyf

                nb0 = plane(0)
                nb1 = plane(3)
                nb2 = (1.0 - nb0) - nb1
                b0s[:] = jnp.where(mask, nb0, b0s[:])
                b1s[:] = jnp.where(mask, nb1, b1s[:])
                b2s[:] = jnp.where(mask, nb2, b2s[:])
                iws[:] = jnp.where(mask, plane(6), iws[:])
                for ci, ch in enumerate(chs):
                    ch[:] = jnp.where(mask, plane(FRECORD_BASE + 3 * ci), ch[:])

            return 0

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)
        jax.lax.fori_loop(lo, hi_b, rec_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, last_chunk + 1, fchunk_body, 0, unroll=False)

    tri_id_ref[:] = ids[:]
    depth_ref[:] = zs[:]
    b0_ref[:] = b0s[:]
    b1_ref[:] = b1s[:]
    b2_ref[:] = b2s[:]
    invw_ref[:] = iws[:]
    for cr, ch in zip(chan_refs, chs):
        cr[:] = ch[:]
    if use_stencil:
        stencil_ref[:] = sts[:]


def _raster_kernel_batched(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (RECORD_WIDTH, MAXPAIRS) int32, stays in HBM
    frecords_hbm,  # (FRECORD_WIDTH, MAXPAIRS) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_compare: str,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    batch: int,
):
    """Batched-reduction rasterization for order-independent depth modes.

    For depth test+write with an ordered compare (less / less_equal /
    greater / greater_equal) the final buffer state is a pure per-pixel
    reduction over records: winner depth = extremum of covered depths,
    winner fragment = the first (strict compares) or last (*_equal
    compares) record attaining it — sequential processing is unnecessary.
    This kernel evaluates BATCH records independently per iteration and
    merges them with an order-aware tree (left operand = earlier records,
    so tie-breaks need no index bookkeeping), then folds the batch winner
    into the tile state once.  Breaking the per-record read-after-write
    dependency on the depth plane lets the VPU pipeline record evaluations
    back-to-back — the fix for the sequential kernel's ~0.4us/record
    floor on dense meshes (record count is the cost driver for 1M-tri
    scenes, BASELINE config 5).

    Bit-identical to the sequential kernels and the oracle: the merge
    predicate mirrors the sequential pass/tie semantics exactly (proof in
    the strict/non-strict analysis above; pinned by tests including
    equal-depth tie cases).
    """
    strict = depth_compare in ("less", "greater")
    less_family = depth_compare.startswith("less")
    sent = jnp.int32(2**31 - 1) if less_family else jnp.int32(-(2**31))

    def better(z_new, z_old):
        # "Does the LATER operand beat the EARLIER one?"
        if less_family:
            return (z_new < z_old) if strict else (z_new <= z_old)
        return (z_new > z_old) if strict else (z_new >= z_old)

    nout = 6 + num_channels
    ninit = 5 if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6:]
    scratch = rest[ninit + nout :]
    chunk_vmem, fchunk_vmem, zs, ids = scratch[:4]
    b0s, b1s, iws = scratch[4:7]
    chs = scratch[7 : 7 + num_channels]
    sems, fsems = scratch[7 + num_channels :]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * num_tx + tx
    raw_start = tile_start_ref[tile]
    start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
    skip = raw_start - start
    count = tile_count_ref[tile] + skip

    if has_init:
        i_id, i_z, i_b0, i_b1, _i_b2 = init_refs
        ids[:] = i_id[:]
        zs[:] = i_z[:]
        b0s[:] = i_b0[:]
        b1s[:] = i_b1[:]
    else:
        zs[:] = jnp.full((tile_h, tile_w), jnp.int32(clear_depth_q))
        ids[:] = jnp.full((tile_h, tile_w), jnp.int32(-1))
        b0s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1s[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
    iws[:] = jnp.ones((tile_h, tile_w), jnp.float32)
    for ch in chs:
        ch[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    ixf = ix.astype(jnp.float32)
    iyf = iy.astype(jnp.float32)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = ix + tx * tile_w
        gy_pix = iy + ty * tile_h
        scissor_mask = (gx_pix >= sx0) & (gx_pix < sx1) & (gy_pix >= sy0) & (gy_pix < sy1)
    else:
        scissor_mask = None

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk_vmem.at[slot],
            fsems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()
        get_fdma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()
            get_fdma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        get_fdma(slot, c).wait()

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)

        def group_body(g, _):
            def eval_record(r):
                i = g * batch + r
                in_range = (i >= lo) & (i < hi_b)

                def f(j):
                    return chunk_vmem[slot, j, i]

                def ff(j):
                    return fchunk_vmem[slot, j, i]

                e0 = f(0) + f(3) * ix + f(6) * iy
                e1 = f(1) + f(4) * ix + f(7) * iy
                e2 = f(2) + f(5) * ix + f(8) * iy
                covered = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                if scissor_mask is not None:
                    covered = covered & scissor_mask
                zshift = f(12)
                z_u = f(9) + f(10) * ix + f(11) * iy
                hi = jnp.right_shift(jnp.int32(1 << 29), zshift) + jnp.int32(1)
                z = jnp.left_shift(jnp.clip(z_u, -hi, hi), zshift) + jnp.int32(1 << 29)
                if depth_clip == "clamp":
                    z = jnp.clip(z, 0, jnp.int32(fp.DEPTH_ONE_Q))
                elif depth_clip:
                    covered = covered & (z >= 0) & (z <= jnp.int32(fp.DEPTH_ONE_Q))
                zk = jnp.where(covered & in_range, z, sent)

                def plane(off):
                    return ff(off) + ff(off + 1) * ixf + ff(off + 2) * iyf

                vals = [plane(0), plane(3), plane(6)]  # b0, b1, invw
                vals += [plane(FRECORD_BASE + 3 * ci) for ci in range(num_channels)]
                tid = jnp.full((tile_h, tile_w), f(13))
                return [zk, tid] + vals

            def merge(left, right):
                # right = later records; tie semantics via strictness.
                take = better(right[0], left[0])
                return [jnp.where(take, b, a) for a, b in zip(left, right)]

            entries = [eval_record(r) for r in range(batch)]
            while len(entries) > 1:
                entries = [
                    merge(entries[2 * k], entries[2 * k + 1])
                    for k in range(len(entries) // 2)
                ] + ([entries[-1]] if len(entries) % 2 else [])
            win = entries[0]

            take = better(win[0], zs[:])
            zs[:] = jnp.where(take, win[0], zs[:])
            ids[:] = jnp.where(take, win[1], ids[:])
            b0s[:] = jnp.where(take, win[2], b0s[:])
            b1s[:] = jnp.where(take, win[3], b1s[:])
            iws[:] = jnp.where(take, win[4], iws[:])
            for ci, ch in enumerate(chs):
                ch[:] = jnp.where(take, win[5 + ci], ch[:])
            return 0

        jax.lax.fori_loop(lo // batch, pl.cdiv(hi_b, batch), group_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    tri_id_ref[:] = ids[:]
    depth_ref[:] = zs[:]
    b0_ref[:] = b0s[:]
    b1_ref[:] = b1s[:]
    # b2 is derived once at writeback (the same (1-b0)-b1 the sequential
    # kernels compute per record); background keeps the cleared 0.
    b2_ref[:] = jnp.where(ids[:] >= 0, (1.0 - b0s[:]) - b1s[:], 0.0)
    invw_ref[:] = iws[:]
    for cr, ch in zip(chan_refs, chs):
        cr[:] = ch[:]


def _raster_kernel_sublane(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (RECORD_WIDTH, MAXPAIRS) int32, stays in HBM
    frecords_hbm,  # (FRECORD_WIDTH, MAXPAIRS) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_compare: str,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    group: int = 8,
    band_rows: int | None = None,
    num_by: int = 0,
):
    """Sublane-parallel rasterization — the dense-mesh production kernel.

    The sequential kernels' ~0.4us/record floor is their ~23 scalar SMEM
    reads per record (measured: unrolling the loop and batching the
    reduction both left the floor untouched — only the scalar reads are
    common to every prior variant).  This kernel eliminates scalar reads
    entirely:

    Pass 1 (int visibility) transposes each DMA'd record chunk once in
    VMEM and processes records in groups of ``group`` (default 8, any
    multiple of 8 dividing CHUNK) on the sublane axis — all coefficients
    arrive as (group, 1) vector loads and broadcast along lanes.  Each
    group evaluates its records over one 128-pixel tile row per step
    (records x pixels on the VPU's native 8x128 registers; group > 8
    simply spans several registers per op, amortizing the per-group
    coefficient loads and loop control over more records) and folds them
    into per-SUBLANE-SLOT (depth, record-index) accumulators — sublane
    slot s of row y holds the best record with index ≡ s (mod group)
    seen so far for that row.  No cross-sublane work
    happens in the hot loop; one masked cross-sublane extremum per row
    at tile finalize picks the overall winner.  Tie semantics are exact:
    within a slot, record indices arrive in increasing order, so the
    strictness of the depth compare itself keeps the first (strict) or
    last (*_equal) record of equal depth; across slots the finalize
    reduction breaks depth ties by record index (min under strict
    compares, max under *_equal).  Like the batched kernel this is exact
    for order-independent depth modes: depth test+write with an ordered
    compare, where the final buffer is a pure per-pixel reduction (proof
    in _raster_kernel_batched).

    Pass 2 (attribute fetch) recovers every float attribute of each
    pixel's winning record with one one-hot matmul per (row, chunk):
    onehot(pixel, record) @ frecord_chunk.T accumulates the winner's
    whole plane-coefficient row per pixel (zero rows for pixels whose
    winner lies elsewhere), exactly — a one-hot f32 matmul under
    Precision.HIGHEST reconstructs f32 bit-exactly (the bf16 triple
    decomposition h+m+l of any normal f32 re-sums exactly; verified on
    hardware) — and the planes are evaluated once per tile at the end.
    The triangle id rides in the float records (binning.ftid_col, exact
    below 2**24).

    Measured ~60ns/record pass-1 + ~10ns pass-2 vs the sequential 370ns
    on a v5e — the fix for BASELINE config 5 (1M-triangle scenes).

    Sub-tile band binning (``band_rows`` set, Pipeline.raster_bin_rows):
    records were binned per (tile_w x band_rows) band with COLUMN-major
    bin ids (binning.py col_major_ids), so one output tile's
    ``tile_h / band_rows`` bands are contiguous in the record stream —
    still ONE DMA stream per tile, but each band's group loop evaluates
    only its ``band_rows`` rows.  Records stay anchored at the OUTPUT
    tile origin (binning.anchor_rows), so record contents — including
    the f32 planes — are bit-identical to the unbanded stream; each
    band's loop advances the int row state to its band start with exact
    int32 adds.  On tiny-triangle meshes this cuts pass-1 row work by
    ~tile_h/band_rows at the cost of band-crossing triangles binning
    once per band.  Bands partition pixel rows, so per-pixel record
    order (and thus coverage/depth/tie semantics) is bit-identical.
    ``num_by`` is the bin grid's band-row count (pad_h / band_rows).
    """
    assert tile_w == 128, "sublane kernel requires tile_w == 128"
    assert group % 8 == 0 and CHUNK % group == 0
    G = group
    strict = depth_compare in ("less", "greater")
    less_family = depth_compare.startswith("less")
    sent = jnp.int32(2**31 - 1) if less_family else jnp.int32(-(2**31))
    red_z = jnp.min if less_family else jnp.max
    # Across sublane slots, equal-depth ties go to the lowest record
    # index for strict compares (later records do not replace) and the
    # highest for the *_equal compares (later records do replace).
    red_idx = jnp.min if strict else jnp.max
    idx_sent = jnp.int32(1 << 30) if strict else jnp.int32(-1)

    def better(z_new, z_old):
        # "Does the LATER operand beat the EARLIER one?"
        if less_family:
            return (z_new < z_old) if strict else (z_new <= z_old)
        return (z_new > z_old) if strict else (z_new >= z_old)

    # The +2^29 plane bias commutes out of the hot loop for every mode
    # except depth_clip="clamp": every accumulator compare is monotone
    # under a constant shift (and equalities are preserved, so tie
    # semantics are untouched), so pass 1 accumulates UNBIASED shifted
    # depths and the finalize re-biases once per tile.  Bitwise
    # identical: (Z<<zsh) + 2^29 is the same int32 whether the add
    # happens per row or at finalize.
    #
    # Under depth_clip=True (the default), the clip test additionally
    # moves to the PRE-SHIFT domain, dropping the per-row value clamp:
    # z_q in [0, Q]  <=>  z_u<<s in [-2^29, 2^29]  <=>  z_u in
    # [-mid, mid] with mid = 2^29 >> s (s low bits of z_u<<s are zero
    # and mid is exactly divisible, so the shifted and unshifted window
    # tests agree exactly).  In-window pixels need no clamp (|z_u| <=
    # mid => the shift is exact), and out-of-window pixels fail the
    # window test and are masked — exactly the pixels the old
    # clamp-then-fold chain masked (the clamp boundary values +-(mid+1)
    # always land outside [0, Q]).  The test (Z + mid) | (mid - Z) >= 0
    # cannot be fooled by int32 wrap: |Z| <= 2^30 + 2^29 (+ the MSAA
    # sample delta < 2^21, spec fixedpoint.py) and mid <= 2^29, so a
    # wrap only occurs past +-2^31, i.e. for |Z| > 3*2^29 - mid > mid —
    # genuinely out-of-window — and the wrapped value is always
    # negative (range [2^31, 2^31 + 2^21] wraps onto [-2^31, -2^31 +
    # 2^21]), so wrapping can only mask, never unmask.  Net: the clamp's
    # min+max disappear from the hot loop (2 ops per (row, sample)).
    late_bias = depth_clip != "clamp"
    clip_window = bool(depth_clip) and depth_clip != "clamp"

    ftid = ftid_col(num_channels)
    nout = 6 + num_channels
    ninit = 5 if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6:]
    scratch = rest[ninit + nout :]
    ichunk, fchunk, tri, zs, ws, accz, acci, cacc = scratch[:8]
    sems, fsems = scratch[8:]
    fw = cacc.shape[0]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    if band_rows is None:
        tile = ty * num_tx + tx
        raw_start = tile_start_ref[tile]
        start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
        skip = raw_start - start
        count = tile_count_ref[tile] + skip
        band_lo_hi = None
    else:
        bands = tile_h // band_rows
        base = tx * num_by + ty * bands
        raw_start = tile_start_ref[base]
        start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
        skip = raw_start - start
        last_end = (
            tile_start_ref[base + bands - 1] + tile_count_ref[base + bands - 1]
        )
        count = last_end - start
        # Per-band [lo, hi) record ranges relative to `start`.  Bands of
        # one tile are contiguous (col-major bin ids; dead slots sort to
        # the stream tail), so band b ends where band b+1 begins.
        band_lo_hi = [
            (
                tile_start_ref[base + b] - start,
                (
                    tile_start_ref[base + b + 1] - start
                    if b + 1 < bands
                    else last_end - start
                ),
            )
            for b in range(bands)
        ]

    if has_init:
        _i_id, i_z, _i_b0, _i_b1, _i_b2 = init_refs
        zs[:] = i_z[:]
    else:
        zs[:] = jnp.full((tile_h, tile_w), jnp.int32(clear_depth_q))
    accz[:] = jnp.full((tile_h, G, tile_w), sent)
    acci[:] = jnp.zeros((tile_h, G, tile_w), jnp.int32)
    cacc[:] = jnp.zeros((fw, tile_h, tile_w), jnp.float32)

    xl = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
    subi = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = xl + tx * tile_w
        xmask = (gx_pix >= sx0) & (gx_pix < sx1)  # (1, 128)
        gy0 = ty * tile_h

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            ichunk.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk.at[slot],
            fsems.at[slot],
        )

    # ---- pass 1: sublane-parallel int visibility ---------------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        tri[:] = ichunk[slot].T  # one (W, 128) -> (128, W) relayout per chunk

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)

        def make_group_body(row0, nrows, g_lo, g_hi):
            # One group loop over records live in [g_lo, g_hi) of this
            # chunk, evaluating tile rows [row0, row0 + nrows).  Unbanded:
            # one instance covering all tile_h rows.  Banded: one instance
            # per band — records are anchored at their band origin, so
            # row state starts at the record origin either way.
            def group_body(g, _):
                base = pl.ds(pl.multiple_of(g * G, G), G)

                def f(j):
                    return tri[base, j : j + 1]  # (group, 1) vector load

                rec_i = g * G + subi
                inr = (rec_i >= g_lo) & (rec_i < g_hi)
                # Records outside the live window get the same
                # impossible-edge treatment the binner gives invalid slots
                # (very negative e0, zero step): one select per group
                # instead of a mask per row.
                ay0 = jnp.where(inr, f(6), 0)
                ay1, ay2, dzy = f(7), f(8), f(11)
                zsh = f(12)
                mid = jnp.right_shift(jnp.int32(1 << 29), zsh)
                hi_clamp = mid + jnp.int32(1)
                # Row state carried across the loop: E_i and Z already
                # include the per-lane x term, so each row costs four adds
                # to advance instead of re-evaluating the planes (~30%
                # fewer pass-1 ops).
                E0 = jnp.where(inr, f(0), jnp.int32(-(1 << 30))) + f(3) * xl
                E1 = f(1) + f(4) * xl
                E2 = f(2) + f(5) * xl
                Z = f(9) + f(10) * xl
                if row0:
                    # Banded: records are anchored at the OUTPUT tile
                    # origin (binning.anchor_rows); advance the row state
                    # to the band start.  int32 adds commute exactly, so
                    # this is bit-identical to walking row0 rows.
                    E0 = E0 + ay0 * row0
                    E1 = E1 + ay1 * row0
                    E2 = E2 + ay2 * row0
                    Z = Z + dzy * row0
                Q = jnp.int32(fp.DEPTH_ONE_Q)
                rec_abs = rec_i + c * CHUNK  # (8, 1) absolute record idxs
                for r in range(nrows):
                    y = row0 + r
                    # all-non-negative == the OR of the three has a clear
                    # sign bit (exactly the 3-compare AND, two ops cheaper).
                    m = (E0 | E1) | E2
                    if clip_window:
                        # Depth clip in the pre-shift domain (see late_bias
                        # comment above): in-window iff Z in [-mid, mid],
                        # folded into the coverage sign test; in-window
                        # pixels shift exactly with no clamp.
                        m = m | ((Z + mid) | (mid - Z))
                        z = jnp.left_shift(Z, zsh)
                    else:
                        z = jnp.left_shift(jnp.clip(Z, -hi_clamp, hi_clamp), zsh)
                        if not late_bias:
                            z = z + jnp.int32(1 << 29)
                        if depth_clip == "clamp":
                            z = jnp.clip(z, 0, Q)
                    if scissor is not None:
                        y_ok = (gy0 + y >= sy0) & (gy0 + y < sy1)
                        zk = jnp.where((m >= 0) & xmask & y_ok, z, sent)
                    else:
                        zk = jnp.where(m >= 0, z, sent)
                    # Fold into the per-slot accumulators — no
                    # cross-sublane ops in the hot loop.  A sent
                    # (uncovered) zk can only "beat" a slot that is itself
                    # still sent (under the *_equal compares), which the
                    # finalize excludes anyway; real (selected) depths
                    # never equal the sentinel: under clip_window winners
                    # are in-window so |z| <= 2^29; with the bias applied
                    # in-loop |z - 2^29| <= 2^29 + 2^zshift and in the
                    # clamped late_bias domain |z| <= 2^29 + 2^zshift —
                    # all bounded away from +/-(2^31 - 1).
                    az = accz[y]
                    take = better(zk, az)
                    accz[y] = jnp.where(take, zk, az)
                    acci[y] = jnp.where(take, rec_abs, acci[y])
                    E0 = E0 + ay0
                    E1 = E1 + ay1
                    E2 = E2 + ay2
                    Z = Z + dzy
                return 0

            return group_body

        if band_rows is None:
            jax.lax.fori_loop(
                lo // G,
                pl.cdiv(hi_b, G),
                make_group_body(0, tile_h, lo, hi_b),
                0,
                unroll=False,
            )
        else:
            # One group loop per band: records binned per (tile_w x
            # band_rows) band evaluate ONLY their band's rows.  Group
            # windows straddling a band boundary run in both bands' loops
            # with disjoint inr masks, so every record is evaluated
            # exactly once over exactly its band.
            for b, (blo, bhi) in enumerate(band_lo_hi):
                g_lo = jnp.clip(blo - c * CHUNK, 0, CHUNK)
                g_hi = jnp.clip(bhi - c * CHUNK, 0, CHUNK)
                jax.lax.fori_loop(
                    g_lo // G,
                    pl.cdiv(g_hi, G),
                    make_group_body(b * band_rows, band_rows, g_lo, g_hi),
                    0,
                    unroll=False,
                )
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    # ---- pass-1 finalize: one cross-sublane reduction per row ---------------
    z_rows = []
    i_rows = []
    for y in range(tile_h):
        az = accz[y]
        zw = red_z(az, axis=0, keepdims=True)
        iw = red_idx(jnp.where(az == zw, acci[y], idx_sent), axis=0, keepdims=True)
        z_rows.append(zw)
        i_rows.append(iw)
    zg = jnp.concatenate(z_rows, axis=0)
    ig = jnp.concatenate(i_rows, axis=0)
    has_win = zg != sent
    if late_bias:
        # Re-bias the winning depths (sentinel rows may wrap; has_win
        # masks them out of the final compare below).
        zg = zg + jnp.int32(1 << 29)
    take_fin = better(zg, zs[:]) & has_win
    zs[:] = jnp.where(take_fin, zg, zs[:])
    ws[:] = jnp.where(take_fin, ig, jnp.int32(-1))

    # ---- pass 2: one-hot matmul attribute fetch ----------------------------
    win_max = jnp.max(ws[:])

    @pl.when(win_max >= 0)
    def _():
        get_fdma(0, 0).start()

    last_chunk = win_max // CHUNK  # -1 when no winners

    riota_sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def fchunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 <= last_chunk)
        def _():
            get_fdma((c + 1) % 2, c + 1).start()

        get_fdma(slot, c).wait()
        for y in range(tile_h):
            wrow = ws[y : y + 1, :]  # (1, 128) winner indices of this row
            # Skip (row, chunk) pairs that cannot contain a winner — the
            # matmul is the pass-2 cost and most rows resolve in few
            # chunks.
            whi = jnp.max(wrow)
            wlo = jnp.min(jnp.where(wrow < 0, jnp.int32(2**30), wrow))

            @pl.when((whi >= c * CHUNK) & (wlo < (c + 1) * CHUNK))
            def _():
                # ohT[record, pixel]: one-hot of this row's winners, built
                # directly in record-major layout so the value matrix
                # (fchunk, already (FW, records)) needs no transpose.
                ohT = ((wrow - c * CHUNK) == riota_sub).astype(jnp.float32)
                # Winner columns accumulate their record's full coefficient
                # column; pixels whose winner lies in another chunk
                # contribute zero columns, so plain += is an exact
                # scatter-free accumulation (one-hot matmul under HIGHEST
                # reconstructs f32 bit-exactly).
                cacc[:, y, :] += jax.lax.dot_general(
                    fchunk[slot],
                    ohT,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

        return 0

    jax.lax.fori_loop(0, last_chunk + 1, fchunk_body, 0, unroll=False)

    # ---- finalize: evaluate winner planes, select vs init/background ------
    # Plane coefficients live field-major (FW, tile_h, tile_w), so each
    # evaluation is a full-tile (tile_h, 128) VPU op.  (Banded records are
    # re-anchored at the OUTPUT tile origin by the binner — anchor_rows —
    # so yf counts rows from the tile origin in every mode.)
    xf = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1).astype(jnp.float32)
    yf = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0).astype(jnp.float32)

    def plane_eval(col):
        return cacc[col] + cacc[col + 1] * xf + cacc[col + 2] * yf

    covm = ws[:] >= 0
    nb0 = plane_eval(0)
    nb1 = plane_eval(3)
    niw = plane_eval(6)
    tid = cacc[ftid].astype(jnp.int32)

    if has_init:
        i_id, _i_z, i_b0, i_b1, _i_b2 = init_refs
        bg_id, bg_b0, bg_b1 = i_id[:], i_b0[:], i_b1[:]
    else:
        bg_id = jnp.full((tile_h, tile_w), jnp.int32(-1))
        bg_b0 = jnp.zeros((tile_h, tile_w), jnp.float32)
        bg_b1 = jnp.zeros((tile_h, tile_w), jnp.float32)

    out_id = jnp.where(covm, tid, bg_id)
    out_b0 = jnp.where(covm, nb0, bg_b0)
    out_b1 = jnp.where(covm, nb1, bg_b1)
    tri_id_ref[:] = out_id
    depth_ref[:] = zs[:]
    b0_ref[:] = out_b0
    b1_ref[:] = out_b1
    # b2 derived once at writeback from the same (1-b0)-b1 expression the
    # sequential kernels evaluate per record; background keeps 0.
    b2_ref[:] = jnp.where(out_id >= 0, (1.0 - out_b0) - out_b1, 0.0)
    invw_ref[:] = jnp.where(covm, niw, 1.0)
    for ci, cr in enumerate(chan_refs):
        cr[:] = jnp.where(covm, plane_eval(FRECORD_BASE + 3 * ci), 0.0)


def _raster_kernel_msaa4_sublane(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (RECORD_WIDTH_MSAA, MAXPAIRS) int32, stays in HBM
    frecords_hbm,  # (FRECORD_WIDTH, MAXPAIRS) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_compare: str,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    group: int = 8,
):
    """Sublane-parallel coverage-sample MSAA-4x rasterization.

    The MSAA analog of _raster_kernel_sublane (same eligibility: depth
    test+write with an ordered compare, no stencil): pass 1 processes
    records in sublane groups and folds them into PER-SAMPLE per-slot
    (depth, record-index) accumulators — per-sample coverage and
    quantized depth derive from the shared pixel-center planes by
    per-record scalar offsets (spec: fp.MSAA4_OFFSETS proofs), exactly
    as in the sequential _raster_kernel_msaa4, so results are
    bit-identical to it and the oracle.  Pass 2 recovers each sample
    layer's winning float attributes (evaluated at the pixel CENTER —
    true multisampling, shade once per fragment) with ONE widened
    one-hot matmul per (row, chunk): the 4 sample layers of a row are
    concatenated along lanes into a (CHUNK, 4*tile_w) one-hot, so the
    MXU visits each float chunk once per row regardless of the sample
    count.  Tie semantics and the order-independence proof are the 1x
    sublane kernel's, applied per sample layer.
    """
    S = NUM_SAMPLES
    assert tile_w == 128, "sublane kernel requires tile_w == 128"
    assert group % 8 == 0 and CHUNK % group == 0
    G = group
    strict = depth_compare in ("less", "greater")
    less_family = depth_compare.startswith("less")
    sent = jnp.int32(2**31 - 1) if less_family else jnp.int32(-(2**31))
    red_z = jnp.min if less_family else jnp.max
    red_idx = jnp.min if strict else jnp.max
    idx_sent = jnp.int32(1 << 30) if strict else jnp.int32(-1)

    def better(z_new, z_old):
        if less_family:
            return (z_new < z_old) if strict else (z_new <= z_old)
        return (z_new > z_old) if strict else (z_new >= z_old)

    # Same late-bias hoist + pre-shift clip window as
    # _raster_kernel_sublane (see its comment for the proof, including
    # the wrap analysis with the MSAA per-sample depth delta < 2^21):
    # pass 1 accumulates unbiased shifted depths, the default
    # depth_clip=True tests the window on the pre-shift value with no
    # clamp, and the finalize re-biases — saving (clamp min+max + bias
    # add) per (row, SAMPLE) step, 4x the 1x kernel's cut.
    late_bias = depth_clip != "clamp"
    clip_window = bool(depth_clip) and depth_clip != "clamp"

    ftid = ftid_col(num_channels)
    nout = 6 + num_channels
    ninit = 5 if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6:]
    scratch = rest[ninit + nout :]
    ichunk, fchunk, tri, zs, ws, accz, acci, cacc = scratch[:8]
    sems, fsems = scratch[8:]
    fw = cacc.shape[0]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * num_tx + tx
    raw_start = tile_start_ref[tile]
    start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
    skip = raw_start - start
    count = tile_count_ref[tile] + skip

    if has_init:
        _i_id, i_z, _i_b0, _i_b1, _i_b2 = init_refs
        zs[:] = i_z[:]
    else:
        zs[:] = jnp.full((S, tile_h, tile_w), jnp.int32(clear_depth_q))
    accz[:] = jnp.full((S, tile_h, G, tile_w), sent)
    acci[:] = jnp.zeros((S, tile_h, G, tile_w), jnp.int32)
    cacc[:] = jnp.zeros((fw, tile_h, S * tile_w), jnp.float32)

    xl = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
    subi = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = xl + tx * tile_w
        xmask = (gx_pix >= sx0) & (gx_pix < sx1)  # (1, 128)
        gy0 = ty * tile_h

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            ichunk.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk.at[slot],
            fsems.at[slot],
        )

    # ---- pass 1: sublane-parallel per-sample int visibility ----------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()
        tri[:] = ichunk[slot].T

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)

        def group_body(g, _):
            base = pl.ds(pl.multiple_of(g * G, G), G)

            def f(j):
                return tri[base, j : j + 1]  # (group, 1) vector load

            rec_i = g * G + subi
            inr = (rec_i >= lo) & (rec_i < hi_b)
            ay0 = jnp.where(inr, f(6), 0)
            ay1, ay2, dzy = f(7), f(8), f(11)
            zsh = f(12)
            mid = jnp.right_shift(jnp.int32(1 << 29), zsh)
            hi_clamp = mid + jnp.int32(1)
            # Per-sample scalar offsets and depth deltas, once per group
            # (amortized over the tile_h row loop).
            dzx = f(10)
            offs = []
            for ddx, ddy in fp.MSAA4_OFFSETS:
                o0 = f(16) * ddx + f(19) * ddy
                o1 = f(17) * ddx + f(20) * ddy
                o2 = f(18) * ddx + f(21) * ddy
                dz = jnp.right_shift(dzx * ddx + dzy * ddy, 4)
                offs.append((o0, o1, o2, dz))
            E0 = jnp.where(inr, f(0), jnp.int32(-(1 << 30))) + f(3) * xl
            E1 = f(1) + f(4) * xl
            E2 = f(2) + f(5) * xl
            Z = f(9) + f(10) * xl
            Q = jnp.int32(fp.DEPTH_ONE_Q)
            rec_abs = rec_i + c * CHUNK
            for y in range(tile_h):
                if scissor is not None:
                    y_ok = (gy0 + y >= sy0) & (gy0 + y < sy1)
                for s, (o0, o1, o2, dz) in enumerate(offs):
                    m = ((E0 + o0) | (E1 + o1)) | (E2 + o2)
                    Zs = Z + dz
                    if clip_window:
                        m = m | ((Zs + mid) | (mid - Zs))
                        z = jnp.left_shift(Zs, zsh)
                    else:
                        z = jnp.left_shift(
                            jnp.clip(Zs, -hi_clamp, hi_clamp), zsh
                        )
                        if not late_bias:
                            z = z + jnp.int32(1 << 29)
                        if depth_clip == "clamp":
                            z = jnp.clip(z, 0, Q)
                    if scissor is not None:
                        zk = jnp.where((m >= 0) & xmask & y_ok, z, sent)
                    else:
                        zk = jnp.where(m >= 0, z, sent)
                    az = accz[s, y]
                    take = better(zk, az)
                    accz[s, y] = jnp.where(take, zk, az)
                    acci[s, y] = jnp.where(take, rec_abs, acci[s, y])
                E0 = E0 + ay0
                E1 = E1 + ay1
                E2 = E2 + ay2
                Z = Z + dzy
            return 0

        jax.lax.fori_loop(lo // G, pl.cdiv(hi_b, G), group_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    # ---- pass-1 finalize: one cross-sublane reduction per (sample, row) ----
    for s in range(S):
        z_rows = []
        i_rows = []
        for y in range(tile_h):
            az = accz[s, y]
            zw = red_z(az, axis=0, keepdims=True)
            iw = red_idx(
                jnp.where(az == zw, acci[s, y], idx_sent), axis=0, keepdims=True
            )
            z_rows.append(zw)
            i_rows.append(iw)
        zg = jnp.concatenate(z_rows, axis=0)
        ig = jnp.concatenate(i_rows, axis=0)
        has_win = zg != sent
        if late_bias:
            zg = zg + jnp.int32(1 << 29)  # sentinel wrap masked by has_win
        take_fin = better(zg, zs[s]) & has_win
        zs[s] = jnp.where(take_fin, zg, zs[s])
        ws[s] = jnp.where(take_fin, ig, jnp.int32(-1))

    # ---- pass 2: widened one-hot matmul attribute fetch --------------------
    win_max = jnp.max(ws[:])

    @pl.when(win_max >= 0)
    def _():
        get_fdma(0, 0).start()

    last_chunk = win_max // CHUNK  # -1 when no winners

    riota_sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def fchunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 <= last_chunk)
        def _():
            get_fdma((c + 1) % 2, c + 1).start()

        get_fdma(slot, c).wait()
        for y in range(tile_h):
            # The 4 sample layers of this row, concatenated along lanes:
            # one (CHUNK, 4*tile_w) one-hot -> the MXU reads the float
            # chunk once per row regardless of the sample count.
            wrow = jnp.concatenate(
                [ws[s, y : y + 1, :] for s in range(S)], axis=1
            )
            whi = jnp.max(wrow)
            wlo = jnp.min(jnp.where(wrow < 0, jnp.int32(2**30), wrow))

            @pl.when((whi >= c * CHUNK) & (wlo < (c + 1) * CHUNK))
            def _():
                ohT = ((wrow - c * CHUNK) == riota_sub).astype(jnp.float32)
                cacc[:, y, :] += jax.lax.dot_general(
                    fchunk[slot],
                    ohT,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

        return 0

    jax.lax.fori_loop(0, last_chunk + 1, fchunk_body, 0, unroll=False)

    # ---- finalize: evaluate winner planes per sample layer -----------------
    # Attribute planes are evaluated at the PIXEL CENTER (x = lane % 128)
    # for every sample layer — true multisampling.
    xf = (
        jax.lax.broadcasted_iota(jnp.int32, (1, S * tile_w), 1)
        & jnp.int32(tile_w - 1)
    ).astype(jnp.float32)
    yf = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0).astype(jnp.float32)

    def plane_eval(col):
        return cacc[col] + cacc[col + 1] * xf + cacc[col + 2] * yf

    nb0_all = plane_eval(0)  # (tile_h, S*tile_w)
    nb1_all = plane_eval(3)
    niw_all = plane_eval(6)
    tid_all = cacc[ftid].astype(jnp.int32)
    nch_all = [plane_eval(FRECORD_BASE + 3 * ci) for ci in range(num_channels)]

    if has_init:
        i_id, _i_z, i_b0, i_b1, _i_b2 = init_refs

    for s in range(S):
        sl = slice(s * tile_w, (s + 1) * tile_w)
        covm = ws[s] >= 0
        if has_init:
            bg_id, bg_b0, bg_b1 = i_id[s], i_b0[s], i_b1[s]
        else:
            bg_id = jnp.full((tile_h, tile_w), jnp.int32(-1))
            bg_b0 = jnp.zeros((tile_h, tile_w), jnp.float32)
            bg_b1 = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_id = jnp.where(covm, tid_all[:, sl], bg_id)
        out_b0 = jnp.where(covm, nb0_all[:, sl], bg_b0)
        out_b1 = jnp.where(covm, nb1_all[:, sl], bg_b1)
        tri_id_ref[s] = out_id
        depth_ref[s] = zs[s]
        b0_ref[s] = out_b0
        b1_ref[s] = out_b1
        b2_ref[s] = jnp.where(out_id >= 0, (1.0 - out_b0) - out_b1, 0.0)
        invw_ref[s] = jnp.where(covm, niw_all[:, sl], 1.0)
        for ci, cr in enumerate(chan_refs):
            cr[s] = jnp.where(covm, nch_all[ci][:, sl], 0.0)


def _raster_kernel_msaa4(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    records_hbm,  # (RECORD_WIDTH_MSAA, MAXPAIRS) int32, stays in HBM
    frecords_hbm,  # (FRECORD_WIDTH, MAXPAIRS) f32, stays in HBM
    *rest,
    tile_w: int,
    tile_h: int,
    num_tx: int,
    depth_test: bool,
    depth_compare: str,
    depth_write: bool,
    depth_clip: bool,
    clear_depth_q: int,
    has_init: bool,
    num_channels: int,
    scissor,
    stencil=None,
    stencil_clear: int = 0,
):
    """Coverage-sample MSAA-4x rasterization, two-pass.

    Pass 1 evaluates coverage and quantized depth independently at the
    four standard sample positions (fp.MSAA4_OFFSETS) — per-sample values
    derive from the shared pixel-center edge/depth planes by *scalar*
    per-record offsets, so the vector cost per record is ~the sample
    count's int selects, not 4x full rasterization.  Pass 2 replays the
    float attribute planes once per surviving record at the pixel CENTER
    (true multisampling: shade once per fragment) and scatters them into
    each sample layer the record won.  The reference merely configures
    this stage (multisample state, /root/reference/src/main.cpp:1790).
    """
    use_stencil = stencil is not None and stencil.enable
    nout = 6 + num_channels + (1 if use_stencil else 0)
    ninit = (6 if use_stencil else 5) if has_init else 0
    init_refs = rest[:ninit]
    outs = rest[ninit : ninit + nout]
    tri_id_ref, depth_ref, b0_ref, b1_ref, b2_ref, invw_ref = outs[:6]
    chan_refs = outs[6 : 6 + num_channels]
    stencil_ref = outs[-1] if use_stencil else None
    scratch = rest[ninit + nout :]
    chunk_vmem, fchunk_vmem, zs, ids, widx = scratch[:5]
    k = 5
    sts = scratch[k] if use_stencil else None
    k += 1 if use_stencil else 0
    b0s, b1s, b2s, iws = scratch[k : k + 4]
    chs = scratch[k + 4 : k + 4 + num_channels]
    sems, fsems = scratch[k + 4 + num_channels :]
    S = NUM_SAMPLES

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * num_tx + tx
    raw_start = tile_start_ref[tile]
    start = pl.multiple_of((raw_start // CHUNK) * CHUNK, CHUNK)
    skip = raw_start - start
    count = tile_count_ref[tile] + skip

    if has_init:
        i_id, i_z, i_b0, i_b1, i_b2 = init_refs[:5]
        ids[:] = i_id[:]
        zs[:] = i_z[:]
        b0s[:] = i_b0[:]
        b1s[:] = i_b1[:]
        b2s[:] = i_b2[:]
        if use_stencil:
            sts[:] = init_refs[5][:]
    else:
        zs[:] = jnp.full((S, tile_h, tile_w), jnp.int32(clear_depth_q))
        ids[:] = jnp.full((S, tile_h, tile_w), jnp.int32(-1))
        b0s[:] = jnp.zeros((S, tile_h, tile_w), jnp.float32)
        b1s[:] = jnp.zeros((S, tile_h, tile_w), jnp.float32)
        b2s[:] = jnp.zeros((S, tile_h, tile_w), jnp.float32)
        if use_stencil:
            sts[:] = jnp.full((S, tile_h, tile_w), jnp.int32(stencil_clear & 0xFF))
    widx[:] = jnp.full((S, tile_h, tile_w), jnp.int32(-1))
    iws[:] = jnp.ones((S, tile_h, tile_w), jnp.float32)
    for ch in chs:
        ch[:] = jnp.zeros((S, tile_h, tile_w), jnp.float32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    if scissor is not None:
        sx0, sy0, sx1, sy1 = scissor
        gx_pix = ix + tx * tile_w
        gy_pix = iy + ty * tile_h
        scissor_mask = (gx_pix >= sx0) & (gx_pix < sx1) & (gy_pix >= sy0) & (gy_pix < sy1)
    else:
        scissor_mask = None

    num_chunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sems.at[slot],
        )

    def get_fdma(slot, c):
        return pltpu.make_async_copy(
            frecords_hbm.at[:, pl.ds(start + c * CHUNK, CHUNK)],
            fchunk_vmem.at[slot],
            fsems.at[slot],
        )

    # ---- pass 1: per-sample int visibility ---------------------------------
    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < num_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()

        def rec_body(i, _):
            def f(j):
                return chunk_vmem[slot, j, i]  # scalar field read

            # Shared pixel-center planes (bias folded into e*).
            e0 = f(0) + f(3) * ix + f(6) * iy
            e1 = f(1) + f(4) * ix + f(7) * iy
            e2 = f(2) + f(5) * ix + f(8) * iy
            zshift = f(12)
            z_u = f(9) + f(10) * ix + f(11) * iy
            hi = jnp.right_shift(jnp.int32(1 << 29), zshift) + jnp.int32(1)
            tid = f(13)
            for s, (ddx, ddy) in enumerate(fp.MSAA4_OFFSETS):
                # Scalar per-sample offsets (spec: fp.MSAA4_OFFSETS proofs).
                o0 = f(16) * ddx + f(19) * ddy
                o1 = f(17) * ddx + f(20) * ddy
                o2 = f(18) * ddx + f(21) * ddy
                covered = (e0 + o0 >= 0) & (e1 + o1 >= 0) & (e2 + o2 >= 0)
                if scissor_mask is not None:
                    covered = covered & scissor_mask
                dz = jnp.right_shift(f(10) * ddx + f(11) * ddy, 4)
                z = (
                    jnp.left_shift(jnp.clip(z_u + dz, -hi, hi), zshift)
                    + jnp.int32(1 << 29)
                )
                if depth_clip == "clamp":
                    z = jnp.clip(z, 0, jnp.int32(fp.DEPTH_ONE_Q))
                elif depth_clip:
                    covered = covered & (z >= 0) & (z <= jnp.int32(fp.DEPTH_ONE_Q))
                if depth_test:
                    d_pass = _depth_cmp(depth_compare, z, zs[s])
                else:
                    d_pass = jnp.ones((tile_h, tile_w), jnp.bool_)
                if use_stencil:
                    s_pass = stencil_test(stencil, sts[s])
                    sts[s] = stencil_update(stencil, sts[s], covered, s_pass, d_pass)
                    passes = covered & s_pass & d_pass
                else:
                    passes = covered & d_pass
                if depth_write:
                    zs[s] = jnp.where(passes, z, zs[s])
                ids[s] = jnp.where(passes, tid, ids[s])
                widx[s] = jnp.where(passes, c * CHUNK + i, widx[s])
            return 0

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)
        jax.lax.fori_loop(lo, hi_b, rec_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0, unroll=False)

    # ---- pass 2: pixel-center float planes for surviving records ----------
    win_max = jnp.max(widx[:])

    @pl.when(win_max >= 0)
    def _():
        get_fdma(0, 0).start()

    last_chunk = win_max // CHUNK  # -1 when no winners

    def fchunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 <= last_chunk)
        def _():
            get_fdma((c + 1) % 2, c + 1).start()

        get_fdma(slot, c).wait()

        def rec_body(i, _):
            rec = c * CHUNK + i
            masks = [widx[s] == rec for s in range(NUM_SAMPLES)]
            any_mask = masks[0]
            for m in masks[1:]:
                any_mask = any_mask | m

            @pl.when(jnp.any(any_mask))
            def _():
                def ff(j):
                    return fchunk_vmem[slot, j, i]

                ixf = ix.astype(jnp.float32)
                iyf = iy.astype(jnp.float32)

                def plane(off):
                    return ff(off) + ff(off + 1) * ixf + ff(off + 2) * iyf

                nb0 = plane(0)
                nb1 = plane(3)
                nb2 = (1.0 - nb0) - nb1
                niw = plane(6)
                nch = [plane(FRECORD_BASE + 3 * ci) for ci in range(num_channels)]
                for s in range(NUM_SAMPLES):
                    m = masks[s]
                    b0s[s] = jnp.where(m, nb0, b0s[s])
                    b1s[s] = jnp.where(m, nb1, b1s[s])
                    b2s[s] = jnp.where(m, nb2, b2s[s])
                    iws[s] = jnp.where(m, niw, iws[s])
                    for ci, ch in enumerate(chs):
                        ch[s] = jnp.where(m, nch[ci], ch[s])

            return 0

        lo = jnp.maximum(skip - c * CHUNK, 0)
        hi_b = jnp.minimum(count - c * CHUNK, CHUNK)
        jax.lax.fori_loop(lo, hi_b, rec_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, last_chunk + 1, fchunk_body, 0, unroll=False)

    tri_id_ref[:] = ids[:]
    depth_ref[:] = zs[:]
    b0_ref[:] = b0s[:]
    b1_ref[:] = b1s[:]
    b2_ref[:] = b2s[:]
    invw_ref[:] = iws[:]
    for cr, ch in zip(chan_refs, chs):
        cr[:] = ch[:]
    if use_stencil:
        stencil_ref[:] = sts[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "tile_w",
        "tile_h",
        "depth_test",
        "depth_compare",
        "depth_write",
        "depth_clip",
        "depth_clear",
        "max_pairs",
        "slots",
        "interpret",
        "perspective",
        "scissor",
        "skip_losers",
        "return_overflow",
        "two_pass",
        "msaa4",
        "stencil",
        "stencil_clear",
        "batch",
        "unroll",
        "sublane",
        "sublane_group",
        "assemble",
        "bin_rows",
        "tmpl",
    ),
)
def rasterize_vis_pallas(
    ts: TriSetup,
    width: int,
    height: int,
    tile_w: int = 128,
    tile_h: int = 32,
    depth_test: bool = True,
    depth_compare: str = "less",
    depth_write: bool = True,
    depth_clip: bool = True,
    depth_clear: float = 1.0,
    max_pairs: int | None = None,
    slots: int | None = None,
    interpret: bool = False,
    init: VisBuffer | None = None,
    id_offset: int = 0,
    channels=None,
    perspective: bool = True,
    scissor=None,
    skip_losers: bool = False,
    return_overflow: bool = False,
    two_pass: bool = False,
    msaa4: bool = False,
    stencil=None,
    stencil_clear: int = 0,
    batch: int = 0,
    unroll: int = 1,
    sublane: bool = False,
    sublane_group: int = 8,
    origin=(0, 0),
    assemble: str = "xla",
    bin_rows: int | None = None,
    tmpl: str = "xla",
):
    """Tile-binned Pallas rasterization; drop-in for raster_xla.rasterize_vis.

    The framebuffer is internally padded up to tile multiples and cropped
    on return.  Coverage and depth are bit-identical to the XLA path and
    the CPU oracle.  Pass ``init`` to continue a previous draw's
    visibility buffer (multi-draw frames).

    channels: optional (T, 3, K) per-vertex varying values; the kernel
    interpolates them in-raster (perspective-correct when ``perspective``)
    and returns (vis, interp (K, H, W), invw (H, W)) instead of just vis —
    the gather-free fast path for deferred shading on TPU.

    return_overflow: also append the binner's overflow flag (a () bool
    that is True when the true (tile, triangle) pair count exceeded
    max_pairs, i.e. trailing triangles were dropped from the frame).

    msaa4: coverage-sample MSAA-4x — every VisBuffer field (and invw /
    interp layers) gains a leading sample axis of 4, holding per-sample
    coverage and depth at the standard sample positions with attributes
    evaluated at the pixel center (see _raster_kernel_msaa4); bit-identical
    to reference.oracle.rasterize_msaa4.
    """
    num_ch = 0 if channels is None else channels.shape[-1]
    if bin_rows is not None:
        # Sub-tile band binning (Pipeline.raster_bin_rows): bin at
        # (tile_w x bin_rows) granularity with column-major bin ids so
        # one raster tile's bands stay contiguous in the record stream.
        # Height is padded to the RASTER tile grid so every raster tile
        # decomposes into exactly tile_h/bin_rows bands.
        if tile_h % bin_rows:
            raise ValueError(
                f"bin_rows {bin_rows} must divide tile_h {tile_h}"
            )
        bin_h = -(-height // tile_h) * tile_h
        binned = bin_triangles(
            ts,
            width,
            bin_h,
            tile_w,
            bin_rows,
            max_pairs,
            id_offset,
            channels=channels,
            perspective=perspective,
            msaa4=msaa4,
            origin=origin,
            slots=slots,
            assemble=assemble,
            interpret=interpret,
            col_major_ids=True,
            anchor_rows=tile_h,
            tmpl=tmpl,
        )
    else:
        binned = bin_triangles(
            ts,
            width,
            height,
            tile_w,
            tile_h,
            max_pairs,
            id_offset,
            channels=channels,
            perspective=perspective,
            msaa4=msaa4,
            origin=origin,
            slots=slots,
            assemble=assemble,
            interpret=interpret,
            tmpl=tmpl,
        )
    out = rasterize_binned(
        binned,
        width,
        height,
        tile_w=tile_w,
        tile_h=tile_h,
        depth_test=depth_test,
        depth_compare=depth_compare,
        depth_write=depth_write,
        depth_clip=depth_clip,
        depth_clear=depth_clear,
        interpret=interpret,
        init=init,
        num_channels=num_ch,
        scissor=scissor,
        skip_losers=skip_losers,
        two_pass=two_pass,
        msaa4=msaa4,
        stencil=stencil,
        stencil_clear=stencil_clear,
        batch=batch,
        unroll=unroll,
        sublane=sublane,
        sublane_group=sublane_group,
        bin_rows=bin_rows,
    )
    if not return_overflow:
        return out
    if num_ch == 0:
        return out, binned.overflowed
    return (*out, binned.overflowed)


def rasterize_binned(
    binned,
    width: int,
    height: int,
    tile_w: int = 128,
    tile_h: int = 32,
    depth_test: bool = True,
    depth_compare: str = "less",
    depth_write: bool = True,
    depth_clip: bool = True,
    depth_clear: float = 1.0,
    interpret: bool = False,
    init: VisBuffer | None = None,
    num_channels: int = 0,
    scissor=None,
    skip_losers: bool = False,
    two_pass: bool = False,
    msaa4: bool = False,
    stencil=None,
    stencil_clear: int = 0,
    batch: int = 0,
    unroll: int = 1,
    sublane: bool = False,
    sublane_group: int = 8,
    bin_rows: int | None = None,
):
    """Rasterize an already-binned record stream (see bin_triangles).

    The kernel stage of rasterize_vis_pallas, exposed separately so
    callers can bin and rasterize at different altitudes (the multi-chip
    path bins per shard; probes time the kernel in isolation).  Not
    jitted — call under jit.
    """
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    num_tx = pad_w // tile_w
    num_ty = pad_h // tile_h
    clear_q = int(round(depth_clear * fp.DEPTH_ONE_Q))
    has_init = init is not None
    num_ch = num_channels
    use_stencil = stencil is not None and stencil.enable
    S = NUM_SAMPLES

    # Segments are SEGMENT_ALIGN-padded by the binner, so CHUNK-rounded
    # DMA slices stay in bounds.
    records = binned.records
    frecords = binned.frecords

    common = dict(
        tile_w=tile_w,
        tile_h=tile_h,
        num_tx=num_tx,
        depth_test=depth_test,
        depth_compare=depth_compare,
        depth_write=depth_write,
        depth_clip=depth_clip,
        clear_depth_q=clear_q,
        has_init=has_init,
        num_channels=num_ch,
        scissor=scissor,
        stencil=stencil,
        stencil_clear=stencil_clear,
    )
    batched = batch > 0
    if bin_rows is not None and not sublane:
        raise ValueError(
            "bin_rows (sub-tile band binning) requires the sublane kernel"
        )
    if sublane:
        if not (
            depth_test
            and depth_write
            and depth_compare in ("less", "less_equal", "greater", "greater_equal")
            and not use_stencil
            and not two_pass
            and not batched
        ):
            raise ValueError(
                "sublane rasterization requires depth test+write with an "
                "ordered compare and no stencil/two_pass/batch"
            )
        if tile_w != 128:
            raise ValueError("sublane rasterization requires tile_w == 128")
        if sublane_group % 8 or CHUNK % sublane_group:
            raise ValueError(
                f"sublane_group must be a multiple of 8 dividing {CHUNK}, "
                f"got {sublane_group}"
            )
        band_kw = {}
        if bin_rows is not None:
            if msaa4:
                raise ValueError("bin_rows is not supported with msaa4 yet")
            if tile_h % bin_rows:
                raise ValueError(
                    f"bin_rows {bin_rows} must divide tile_h {tile_h}"
                )
            # The bin grid has tile_h/bin_rows band-rows per raster tile
            # row (binned with col_major_ids; see bin_triangles).
            band_kw = dict(
                band_rows=bin_rows, num_by=num_ty * (tile_h // bin_rows)
            )
        kernel = functools.partial(
            _raster_kernel_msaa4_sublane if msaa4 else _raster_kernel_sublane,
            tile_w=tile_w,
            tile_h=tile_h,
            num_tx=num_tx,
            depth_compare=depth_compare,
            depth_clip=depth_clip,
            clear_depth_q=clear_q,
            has_init=has_init,
            num_channels=num_ch,
            scissor=scissor,
            group=sublane_group,
            **band_kw,
        )
    elif batched:
        if not (
            depth_test
            and depth_write
            and depth_compare in ("less", "less_equal", "greater", "greater_equal")
            and not use_stencil
            and not msaa4
            and not two_pass
        ):
            raise ValueError(
                "batch rasterization requires depth test+write with an "
                "ordered compare and no stencil/msaa/two_pass"
            )
        if CHUNK % batch:
            raise ValueError(f"batch must divide {CHUNK}")
        kernel = functools.partial(
            _raster_kernel_batched,
            tile_w=tile_w,
            tile_h=tile_h,
            num_tx=num_tx,
            depth_compare=depth_compare,
            depth_clip=depth_clip,
            clear_depth_q=clear_q,
            has_init=has_init,
            num_channels=num_ch,
            scissor=scissor,
            batch=batch,
        )
    elif msaa4:
        kernel = functools.partial(_raster_kernel_msaa4, **common)
    elif two_pass:
        kernel = functools.partial(_raster_kernel_two_pass, **common)
    else:
        kernel = functools.partial(
            _raster_kernel, skip_losers=skip_losers, unroll=unroll, **common
        )

    if msaa4:
        tile_block = lambda: pl.BlockSpec(
            (S, tile_h, tile_w), lambda ty, tx, *_: (0, ty, tx)
        )
        plane = lambda: (S, tile_h, tile_w)
        out_dims = (S, pad_h, pad_w)
        pad_init = lambda x, cval: jnp.pad(
            x, ((0, 0), (0, pad_h - height), (0, pad_w - width)), constant_values=cval
        )
    else:
        tile_block = lambda: pl.BlockSpec((tile_h, tile_w), lambda ty, tx, *_: (ty, tx))
        plane = lambda: (tile_h, tile_w)
        out_dims = (pad_h, pad_w)
        pad_init = lambda x, cval: jnp.pad(
            x, ((0, pad_h - height), (0, pad_w - width)), constant_values=cval
        )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [binned.tile_start, binned.tile_count, records, frecords]
    if has_init:
        inputs += [
            pad_init(init.tri_id, -1),
            pad_init(init.depth_q, clear_q),
            pad_init(init.b0, 0),
            pad_init(init.b1, 0),
            pad_init(init.b2, 0),
        ]
        if use_stencil:
            st_in = init.stencil
            if st_in is None:
                st_in = jnp.full(
                    init.tri_id.shape, jnp.int32(stencil_clear & 0xFF)
                )
            inputs.append(pad_init(st_in, stencil_clear & 0xFF))
        in_specs += [tile_block() for _ in range(6 if use_stencil else 5)]

    nout = 6 + num_ch + (1 if use_stencil else 0)
    if sublane:
        # Chunks land in VMEM (they are relaid out, not scalar-read), plus
        # a transposed copy of the int chunk (pass 1's sublane coefficient
        # loads; the float chunk is consumed untransposed by the pass-2
        # matmul), the (depth, winner-index) state, and the field-major
        # one-hot coefficient accumulator.
        rw_, fw_ = record_width(msaa4), frecord_width(num_ch)
        pix = lambda shape: shape if not msaa4 else (S, *shape)
        scratch_shapes = [
            pltpu.VMEM((2, rw_, CHUNK), jnp.int32),
            pltpu.VMEM((2, fw_, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK, rw_), jnp.int32),
            pltpu.VMEM(pix((tile_h, tile_w)), jnp.int32),  # zs
            pltpu.VMEM(pix((tile_h, tile_w)), jnp.int32),  # ws
            pltpu.VMEM(pix((tile_h, sublane_group, tile_w)), jnp.int32),  # accz
            pltpu.VMEM(pix((tile_h, sublane_group, tile_w)), jnp.int32),  # acci
            # Field-major one-hot coefficient accumulator; under MSAA the
            # 4 sample layers of a row concatenate along lanes.
            pltpu.VMEM(
                (fw_, tile_h, (S if msaa4 else 1) * tile_w), jnp.float32
            ),
        ]
    else:
        # Two-pass variants carry a winner-index plane; the single-pass
        # kernel does not; stencil adds one more int plane; the batched
        # kernel derives b2 at writeback so it carries one fewer float
        # plane.
        n_int_scratch = (3 if (two_pass or msaa4) else 2) + (1 if use_stencil else 0)
        n_float_scratch = (3 if batched else 4) + num_ch
        scratch_shapes = [
            pltpu.SMEM((2, record_width(msaa4), CHUNK), jnp.int32),
            pltpu.SMEM((2, frecord_width(num_ch), CHUNK), jnp.float32),
        ]
        scratch_shapes += [pltpu.VMEM(plane(), jnp.int32) for _ in range(n_int_scratch)]
        scratch_shapes += [
            pltpu.VMEM(plane(), jnp.float32) for _ in range(n_float_scratch)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_ty, num_tx),
        in_specs=in_specs,
        out_specs=[tile_block() for _ in range(nout)],
        scratch_shapes=scratch_shapes
        + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_shape = (
        [
            jax.ShapeDtypeStruct(out_dims, jnp.int32),
            jax.ShapeDtypeStruct(out_dims, jnp.int32),
        ]
        + [jax.ShapeDtypeStruct(out_dims, jnp.float32) for _ in range(4 + num_ch)]
        + ([jax.ShapeDtypeStruct(out_dims, jnp.int32)] if use_stencil else [])
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    tri_id, depth_q, b0, b1, b2, invw = outs[:6]
    chan = outs[6 : 6 + num_ch]

    crop = lambda x: x[..., :height, :width]
    vis = VisBuffer(
        tri_id=crop(tri_id),
        depth_q=crop(depth_q),
        b0=crop(b0),
        b1=crop(b1),
        b2=crop(b2),
        stencil=crop(outs[6 + num_ch]) if use_stencil else None,
    )
    if num_ch == 0:
        return vis
    interp = jnp.stack([crop(c) for c in chan])
    return vis, interp, crop(invw)
