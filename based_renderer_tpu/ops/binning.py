"""Triangle-to-tile binning for the Pallas rasterizer.

The reference's GPU does this in fixed-function hardware between vertex
shading and fragment shading; on TPU it is an explicit vectorized XLA
stage: expand each triangle into (tile, triangle) pairs over its clipped
tile bounding box, order pairs by tile (stable in draw order), and emit a
flat per-pair raster record stream so the Pallas kernel's inner loop is
pure int32 arithmetic with zero per-triangle setup.

Gathers are pathologically slow on TPU (no hardware gather unit), so the
whole stage is built around exactly three wide gathers: a per-triangle
*template* matrix is computed vectorized (one row per triangle, all
edge/depth/plane quantities anchored at screen pixel (0, 0)), pair slots
are mapped back to source triangles analytically (searchsorted, not
scatter), and each output slot gathers its template row once and
re-anchors to its tile origin with pure arithmetic.

int records (int32 x RECORD_WIDTH), per (tile, tri) pair:
  0..2   eb0..eb2   edge values at the tile-origin pixel center, clamped
                    per the anchored-exactness proof, fill-rule bias
                    already folded in (covered iff all >= 0)
  3..5   ax0..ax2   per-pixel x-step of each edge (A * 16)
  6..8   ay0..ay2   per-pixel y-step of each edge (B * 16)
  9      zo         quantized depth plane at the tile origin (biased units)
  10     dzx        per-pixel x-step (units)
  11     dzy        per-pixel y-step (units)
  12     zshift     per-triangle depth exponent
  13     tri_id     global triangle id (draw-order)
  14..15 (pad / reserved)

float records (f32, width padded to a multiple of 8) — affine screen-space
planes q(p) = q_o + dq_dx*ix + dq_dy*iy evaluated from the tile origin:
  0..2   b0 plane      barycentric weight of v0
  3..5   b1 plane      weight of v1 (b2 = 1 - b0 - b1)
  6..8   invw plane    interpolated 1/clip_w (perspective correction)
  9..    K channel planes, 3 floats each — the varying interpolators
         (attr/w numerators when perspective-correct); interpolating
         attributes in the raster kernel replaces classic deferred
         shading's per-pixel vertex-data gathers.
  9+3K   tri_id as f32 (ftid_col) — exact below 2**24; lets the sublane
         kernel fetch ALL winner attributes with a single one-hot matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fixedpoint as fp
from .setup import TriSetup, depth_tile_anchor

RECORD_WIDTH = 16
# MSAA-4x records additionally carry the raw per-subpixel edge coefficients
# (A0..A2, B0..B2 at fields 16..21) so the kernel can step the pixel-center
# edge values to the four sample positions; padded to 24 (int32 sublane
# tiling requires slice widths % 8 == 0).
RECORD_WIDTH_MSAA = 24
FRECORD_BASE = 9  # b0 plane, b1 plane, invw plane


def record_width(msaa4: bool) -> int:
    return RECORD_WIDTH_MSAA if msaa4 else RECORD_WIDTH


def frecord_width(num_channels: int) -> int:
    # Rounded up to a multiple of 8: f32 sublane tiling requires slices
    # of (W, 128) HBM records to have W % 8 == 0.  The +1 is the f32
    # triangle-id column (ftid_col) used by the sublane kernel's one-hot
    # attribute fetch.
    w = FRECORD_BASE + 3 * num_channels + 1
    return (w + 7) // 8 * 8


def ftid_col(num_channels: int) -> int:
    """Column of the f32 triangle id in the float records.

    The sublane-parallel kernel recovers every winner attribute with one
    one-hot matmul over the float records, so the triangle id rides along
    as a float column — exact for ids below 2**24 (f32 integer range).
    """
    return FRECORD_BASE + 3 * num_channels


FRECORD_WIDTH = frecord_width(0)  # no-varyings layout

SEGMENT_ALIGN = 128  # per-tile segments start at multiples of this (the
# Pallas kernel DMAs 128-record chunks, and Mosaic requires 128-aligned
# offsets/shapes along the minor dimension)


class BinnedTriangles(NamedTuple):
    # Transposed field-major layout: minor dim is the pair index, so the
    # kernel's (W, 128) DMA slices are lane-aligned.
    records: jnp.ndarray  # (RECORD_WIDTH, PADDED_PAIRS) int32
    frecords: jnp.ndarray  # (frecord_width(K), PADDED_PAIRS) float32
    tile_start: jnp.ndarray  # (num_tiles,) int32 — 128-aligned segment start
    tile_count: jnp.ndarray  # (num_tiles,) int32 — true (unpadded) count
    num_pairs: jnp.ndarray  # () int32 — true pair count (pre-truncation)
    overflowed: jnp.ndarray  # () bool — true pair count exceeded MAXPAIRS


def _triangle_templates(ts: TriSetup, id_offset, channels, perspective, transposed=False):
    """Per-triangle record templates, all screen-origin anchored.

    Returns (ti, tf): int template (T, TI_W) and float template (T, TF_W).
    With ``transposed=True`` returns them FIELD-major ((TI_W, T), (TF_W, T))
    instead: stacking along axis 0 writes each field as one contiguous
    (T,) row, where the axis=-1 stack interleaves into the lane-tiled
    minor dimension at a near-footprint relayout pass PER column (the
    same pathology as the measured (P, 64) column reads, see
    bin_triangles below) — the caller then pays ONE transpose to reach
    the row-major gather layout.
    int template columns:
      0..5   A0..A2, B0..B2 (raw edge coefficients)
      6..11  E_origin i64 pairs (hi0, lo0, hi1, lo1, hi2, lo2): exact
             biased edge values at the pixel-(0,0) center
      12,13  dzdx_q, dzdy_q
      14     zshift
      15     tri_id (+ offset)
      16,17  zq0, (x0f, y0f packed? no) —
      16     zq0
      17     x0f
      18     y0f
    float template columns:
      0, 1   gx, gy (depth plane gradients, LSB/fp-unit)
      2..    planes: [b0 (p00, dx, dy), b1, invw, channels...] anchored at
             the pixel-(0,0) center
    """
    num_tris = ts.valid.shape[0]
    a, b = ts.a, ts.b  # (T, 3)
    origin_fp = jnp.int32(fp.HALF_PIXEL)
    e = fp.edge_at_point_exact(
        ts.xf, ts.yf, a, b, jnp.full((num_tris, 1), origin_fp), jnp.full((num_tris, 1), origin_fp)
    )
    # Fold the fill-rule bias into the exact origin value.
    e = fp.i64_add(e, fp.i64_from_i32(ts.bias))

    ti_cols = [a[:, i] for i in range(3)] + [b[:, i] for i in range(3)]
    for i in range(3):
        ti_cols += [e[0][:, i], e[1][:, i]]
    # id_offset: a scalar offsets draw-order ids (arange); a (T,) array
    # gives each triangle its id directly (per-instance culling passes
    # ORIGINAL pre-compaction ids so output tri_id/tie semantics are
    # bit-identical — ops/cull.py).  The Pallas record assembly
    # (ops/binassem.py) reads this template column, so both assembly
    # paths inherit custom ids automatically.
    ids = jnp.asarray(id_offset, jnp.int32)
    if ids.ndim == 0:  # scalar offset (may be a traced scalar under jit)
        tri_ids = jnp.arange(num_tris, dtype=jnp.int32) + ids
    else:  # (T,) per-triangle ids
        tri_ids = ids
    ti_cols += [
        ts.dzdx_q,
        ts.dzdy_q,
        ts.zshift,
        tri_ids,
        ts.zq[:, 0],
        ts.xf[:, 0],
        ts.yf[:, 0],
    ]
    ti = jnp.stack(ti_cols, axis=0 if transposed else -1)

    # Barycentric planes anchored at the pixel-(0,0) center, from the
    # exact origin edge values (un-biased is unnecessary: bias shifts E by
    # at most 1 fp unit ~ 1e-7 of a pixel of bary error).
    inv_area = ts.inv_area
    ef = _i64_to_f32_pair(e)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    sc = jnp.float32(fp.SUBPIXEL_SCALE)
    b0p = (ef[:, 1] * inv_area, af[:, 1] * sc * inv_area, bf[:, 1] * sc * inv_area)
    b1p = (ef[:, 2] * inv_area, af[:, 2] * sc * inv_area, bf[:, 2] * sc * inv_area)
    b2p = (1.0 - (b0p[0] + b1p[0]), -(b0p[1] + b1p[1]), -(b0p[2] + b1p[2]))

    def plane_of(q):  # (T, 3) per-vertex values -> plane triple
        return tuple(q[:, 0] * b0p[i] + q[:, 1] * b1p[i] + q[:, 2] * b2p[i] for i in range(3))

    iw = ts.inv_w
    tf_cols = [ts.gx, ts.gy]
    tf_cols += list(b0p) + list(b1p) + list(plane_of(iw))
    if channels is not None:
        ch = channels * iw[:, :, None] if perspective else channels
        for k in range(ch.shape[-1]):
            tf_cols.extend(plane_of(ch[:, :, k]))
    tf = jnp.stack(tf_cols, axis=0 if transposed else -1)
    return ti, tf


def _i64_to_f32_pair(e):
    hi, lo = e
    hi_adj = hi + (lo < 0).astype(jnp.int32)
    return hi_adj.astype(jnp.float32) * jnp.float32(4294967296.0) + lo.astype(jnp.float32)


def bin_triangles(
    ts: TriSetup,
    width: int,
    height: int,
    tile_w: int = 128,
    tile_h: int = 32,
    max_pairs: int | None = None,
    id_offset: int = 0,
    channels=None,
    perspective: bool = True,
    msaa4: bool = False,
    origin=(0, 0),
    slots: int | None = None,
    assemble: str = "xla",
    interpret: bool = False,
    col_major_ids: bool = False,
    anchor_rows: int | None = None,
    tmpl: str = "xla",
) -> BinnedTriangles:
    """Bin triangles into screen tiles.

    The anchored-exactness proofs require every pixel of a tile to be
    within 128px of both the tile origin and its canonical 128-grid
    anchor, so tile_w and tile_h must each divide 128 (or equal 128).

    ``origin`` is the global pixel coordinate of this framebuffer's
    top-left corner — (0, 0) single-device; the (possibly traced)
    per-shard offset for tile-parallel rendering.  width/height are the
    LOCAL extent.  All record quantities (edge anchors, canonical depth
    tiles) are evaluated in global coordinates, which is what makes a
    sharded render bit-identical to a monolithic one; for the proofs to
    hold, origin must be a multiple of the tile size (shard extents are
    tile-aligned in parallel/tiled.py).

    ``col_major_ids``: emit COLUMN-major tile ids (id = tx * num_ty + ty)
    instead of row-major.  Used by sub-tile band binning
    (Pipeline.raster_bin_rows): with bin tiles of (tile_w, band_rows),
    column-major order keeps all bands of one OUTPUT raster tile
    contiguous in the sorted record stream, so the kernel reads one DMA
    stream per tile.  Within a bin, order is still draw order.

    ``anchor_rows``: re-anchor records at the enclosing OUTPUT-tile origin
    (anchor_rows pixel rows per output tile; must be a multiple of
    tile_h) instead of this bin's own origin.  With band binning the
    record CONTENTS are then bit-identical to the unbanded stream —
    including the f32 planes, whose re-anchoring would otherwise round
    differently at band origins — and the kernel advances the int row
    state to the band start with exact int32 adds.
    """
    if 128 % tile_w and tile_w != 128:
        raise ValueError("tile_w must divide 128")
    if 128 % tile_h and tile_h != 128:
        raise ValueError("tile_h must divide 128")
    origin_x = jnp.asarray(origin[0], jnp.int32)
    origin_y = jnp.asarray(origin[1], jnp.int32)
    num_tx = -(-width // tile_w)
    num_ty = -(-height // tile_h)
    num_tiles = num_tx * num_ty
    num_tris = ts.valid.shape[0]
    if max_pairs is None:
        max_pairs = max(4 * num_tris, 1024)
    padded_pairs = max_pairs + SEGMENT_ALIGN  # tail pad for DMA overrun only
    fw = frecord_width(0 if channels is None else channels.shape[-1])
    rw_rec = record_width(msaa4)
    if num_tris == 0:
        return BinnedTriangles(
            records=jnp.zeros((rw_rec, padded_pairs), jnp.int32),
            frecords=jnp.zeros((fw, padded_pairs), jnp.float32),
            tile_start=jnp.zeros((num_tiles,), jnp.int32),
            tile_count=jnp.zeros((num_tiles,), jnp.int32),
            num_pairs=jnp.int32(0),
            overflowed=jnp.bool_(False),
        )

    # ---- pair expansion (first-tile / extras split) ----------------------
    # bboxes are global; clip to this shard's window, then tile indices are
    # local to the shard's grid.
    bx0 = jnp.maximum(ts.bbox[:, 0] - origin_x, 0)
    by0 = jnp.maximum(ts.bbox[:, 1] - origin_y, 0)
    bx1 = jnp.minimum(ts.bbox[:, 2] - origin_x, width)
    by1 = jnp.minimum(ts.bbox[:, 3] - origin_y, height)
    nonempty = (bx1 > bx0) & (by1 > by0)
    x0 = bx0 // tile_w
    y0 = by0 // tile_h
    x1 = (bx1 - 1) // tile_w
    y1 = (by1 - 1) // tile_h
    live = ts.valid & nonempty
    bw = jnp.where(live, x1 - x0 + 1, 0)
    bh = jnp.where(live, y1 - y0 + 1, 0)
    k = bw * bh

    # GATHER DISCIPLINE (measured on v5e): a single-column gather of ~1.5M
    # elements costs ~10 ms, while a multi-column ROW gather of the same
    # row count costs ~10 ms *total* — so this stage does exactly TWO
    # gather-class ops (one narrow row-repeat pre-sort, one wide row
    # gather post-sort) and zero single-column gathers.  The tile sort
    # carries the triangle index as a second key (lax.sort) instead of
    # argsort + permutation gathers (~30 ms).
    #
    # FIRST-TILE / EXTRAS SPLIT: on dense tiny-triangle meshes ~80-90% of
    # pairs are a triangle's FIRST (often only) tile, whose id is plain
    # per-triangle arithmetic — no expansion needed.  Only the k-1 extra
    # tiles of multi-tile triangles go through the row-repeat, shrinking
    # the repeat from every pair to the extras alone (measured: the 5-col
    # repeat was ~13 ms of a ~45 ms binner at 1.5M pairs).  Draw order
    # within a tile is restored by sorting on (tile, tri): (tri, tile)
    # pairs are unique, so the two-key order equals the old stable
    # tri-major order exactly.
    num_valid_pairs = jnp.sum(live.astype(jnp.int32))
    if col_major_ids:
        first_tile = jnp.where(live, x0 * num_ty + y0, jnp.int32(num_tiles))
    else:
        first_tile = jnp.where(live, y0 * num_tx + x0, jnp.int32(num_tiles))
    tri_ids = jnp.arange(num_tris, dtype=jnp.int32)

    extra_budget = max(max_pairs - num_tris, 0)
    ke = jnp.maximum(k - 1, 0)
    eoffsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ke, dtype=jnp.int32)]
    )
    total_extra = eoffsets[-1]
    overflowed = total_extra > extra_budget
    true_pairs = num_valid_pairs + total_extra  # pre-truncation count
    total = num_valid_pairs + jnp.minimum(total_extra, extra_budget)

    e_table = jnp.stack(
        [eoffsets[:-1], jnp.maximum(bw, 1), x0, y0, tri_ids], axis=1
    )
    extra_idx = jnp.arange(extra_budget, dtype=jnp.int32)
    # Variable-length expansion WITHOUT jnp.repeat: repeat lowers to a
    # scatter-add over the full triangle table plus a cumsum (measured
    # ~11 ms of the binner at 1M triangles), while the owning triangle of
    # each extra slot is just searchsorted(offsets, slot) — and the 'sort'
    # method turns that into ONE extra lax.sort of (tris + extras) rows
    # (~2 ms) followed by the same narrow row gather.
    t_of_e = jnp.searchsorted(
        eoffsets[1:], extra_idx, side="right", method="sort"
    ).astype(jnp.int32)
    eexp = e_table[jnp.minimum(t_of_e, jnp.int32(num_tris - 1))]
    eT = jax.lax.optimization_barrier(eexp.T)
    e_in_range = extra_idx < total_extra
    seq = extra_idx - eT[0] + 1  # skip the first tile (row-major order)
    bw_t = eT[1]
    e_tile_y = eT[3] + seq // bw_t
    e_tile_x = eT[2] + seq % bw_t
    if col_major_ids:
        e_tile_id = e_tile_x * num_ty + e_tile_y
    else:
        e_tile_id = e_tile_y * num_tx + e_tile_x
    e_tile = jnp.where(e_in_range, e_tile_id, jnp.int32(num_tiles))

    tile_id_all = jnp.concatenate([first_tile, e_tile])
    tri_all = jnp.concatenate([tri_ids, eT[4]])
    # Sort pairs by (tile, tri) — tri IS the draw order, so no payload
    # columns ride along.  When both fields fit in 31 bits together they
    # fuse into ONE int32 key (lexicographic == numeric order for
    # non-negative packed fields), halving the sort's comparator work vs
    # the two-key form; the sentinel tile (== num_tiles) still sorts to
    # the tail because it packs to the largest key prefix.
    tri_bits = max(int(num_tris - 1).bit_length(), 1)
    fuse_key = ((num_tiles + 1) << tri_bits) <= 2**31
    if fuse_key:
        key_all = (tile_id_all << tri_bits) | tri_all
        (key_sorted,) = jax.lax.sort([key_all], num_keys=1, is_stable=False)
        tile_id_sorted, t_slot = key_sorted, None  # decomposed post-slice
    else:
        tile_id_sorted, t_slot = jax.lax.sort(
            [tile_id_all, tri_all], num_keys=2, is_stable=False
        )
    max_pairs = num_tris + extra_budget  # full expansion stream length
    if slots is not None and slots < max_pairs:
        # The sort puts dead slots (culled / offscreen triangles, tile ==
        # sentinel) at the tail, so a static slice keeps every LIVE pair
        # as long as the budget holds — the template gather and record
        # assembly below then run over ~live pairs instead of the full
        # expansion stream (on back-face-culled meshes ~half the slots
        # are dead).  A breached budget is surfaced like the expansion
        # overflow.
        slots = max(-(-slots // SEGMENT_ALIGN) * SEGMENT_ALIGN, SEGMENT_ALIGN)
        if slots < max_pairs:
            tile_id_sorted = tile_id_sorted[:slots]
            if t_slot is not None:
                t_slot = t_slot[:slots]
            overflowed = overflowed | (true_pairs > slots)
            total = jnp.minimum(total, slots)
            max_pairs = slots
    if fuse_key:
        t_slot = tile_id_sorted & jnp.int32((1 << tri_bits) - 1)
        tile_id_sorted = tile_id_sorted >> tri_bits
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_id_sorted, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_id_sorted, tile_range, side="right").astype(jnp.int32)
    count = tile_end - tile_start

    # Records live at their sorted positions — no segment re-packing.  The
    # kernel rounds each tile's DMA window start *down* to a CHUNK multiple
    # and skips the leading foreign records, so no alignment padding slots
    # exist at all (they used to cost ~1/3 extra binner gather traffic on
    # dense scenes).
    slot_valid = pair_idx < total
    slot_tile = jnp.clip(tile_id_sorted, 0, num_tiles - 1)
    if col_major_ids:
        s_tile_x = slot_tile // num_ty
        s_tile_y = slot_tile % num_ty
    else:
        s_tile_x = slot_tile % num_tx
        s_tile_y = slot_tile // num_tx
    ox = s_tile_x * tile_w + origin_x  # tile-origin pixel (global coords)
    if anchor_rows is not None:
        # Anchor at the OUTPUT tile containing this band (see docstring).
        if anchor_rows % tile_h:
            raise ValueError(
                f"anchor_rows {anchor_rows} must be a multiple of tile_h {tile_h}"
            )
        bands_per = anchor_rows // tile_h
        oy = (s_tile_y // bands_per) * anchor_rows + origin_y
    else:
        oy = s_tile_y * tile_h + origin_y

    # ---- per-slot record assembly from the templates ---------------------
    # (Layout note, measured on v5e at 1M tris: building the templates
    # field-major — stack(axis=0), contiguous per-field rows — and
    # transposing once to this row-major gather layout is ~1.8 ms SLOWER
    # than stacking axis=-1 directly (tools/probe_binner3.py tmpl_T64
    # 14.52 vs tmpl_cur 12.74 ms for the build+pad stage): the
    # lane-interleave relayout costs the same wherever it happens, and
    # the explicit transpose adds a pass.  _triangle_templates keeps a
    # `transposed` option for a future fully-field-major assembly path.)
    if tmpl == "pallas":
        # Field-major template build + tiled Pallas transpose: the
        # row-major stack(axis=-1) below pays one near-footprint
        # lane-interleave pass PER column (~12.7 ms at 1M tris on v5e),
        # while stack(axis=0) writes each field as one contiguous row and
        # the Pallas relayout is two HBM passes total.  Bit-identical:
        # pure data movement over the same column expressions.
        tiT, tfT = _triangle_templates(
            ts, id_offset, channels, perspective, transposed=True
        )
        fusedT = jnp.concatenate(
            [tiT, jax.lax.bitcast_convert_type(tfT, jnp.int32)], axis=0
        )
        n_ti = tiT.shape[0]
        n_all = fusedT.shape[0]
        pad_to = -(-n_all // 64) * 64
        w8 = -(-n_all // 8) * 8
        if w8 != n_all:
            fusedT = jnp.pad(fusedT, ((0, w8 - n_all), (0, 0)))
        from . import binassem

        fused = binassem.transpose_templates(fusedT, pad_to, interpret=interpret)
    else:
        ti, tf = _triangle_templates(ts, id_offset, channels, perspective)
        # Post-sort row gather: ONE fused wide gather of the int template
        # and the f32 template (riding as bitcast int32 bits — lossless).
        # Row width is padded up to a multiple of 64: measured on v5e, row
        # gathers of 32..48-column rows fall off a cliff (55-78 ms/1.5M
        # rows) while 64- and 128-column rows take ~17 ms — the lowering
        # switches strategy at 64 columns.
        fused = jnp.concatenate(
            [ti, jax.lax.bitcast_convert_type(tf, jnp.int32)], axis=1
        )
        n_ti = ti.shape[1]
        n_all = fused.shape[1]
        pad_to = -(-n_all // 64) * 64
        if pad_to != n_all:
            fused = jnp.pad(fused, ((0, 0), (0, pad_to - n_all)))
    # The operand barrier pins the gather at the padded width: without it
    # XLA folds the pad into the gather and emits a 30-50-column row
    # gather — exactly the pathological width range (measured 67 ms vs
    # 20 ms for the barriered 64-wide gather at 1.5M rows).  The gathered
    # block is then transposed ONCE to field-major (64, P): the assembly
    # below reads ~30 individual columns, and each column extract from a
    # lane-tiled (P, 64) array costs nearly a full-footprint pass
    # (measured: the column reads were ~50 ms of the binner), while row
    # reads of the transposed copy are contiguous.
    fused = jax.lax.optimization_barrier(fused)

    if assemble == "pallas" and pad_to <= 128:
        # Fused transpose + re-anchoring assembly in one streaming Pallas
        # pass (ops/binassem.py) — bit-identical to the XLA assembly
        # below, minus its full-footprint (P, 64) -> (64, P) transpose and
        # ~30 column extraction passes (measured ~34 ms of the binner at
        # 1.5M pairs).  The tail pad slots become invalid records instead
        # of zeros (strictly safer: impossible edges vs. covering ones).
        from . import binassem

        assert n_ti == binassem.N_TI
        nch_ = 0 if channels is None else channels.shape[-1]
        p_pad = -(-(max_pairs + SEGMENT_ALIGN) // 128) * 128
        pad_n = p_pad - max_pairs
        gath = fused[jnp.pad(t_slot, (0, pad_n))]
        records, frecords = binassem.assemble_records(
            gath,
            jnp.pad(ox, (0, pad_n)),
            jnp.pad(oy, (0, pad_n)),
            total,
            nch=nch_,
            msaa4=msaa4,
            rw=rw_rec,
            fw=fw,
            interpret=interpret,
        )
        return BinnedTriangles(
            records=records,
            frecords=frecords,
            tile_start=tile_start,
            tile_count=count,
            num_pairs=true_pairs,
            overflowed=overflowed,
        )

    fused_sT = jax.lax.optimization_barrier(fused[t_slot].T)

    def ti_col(j):
        return fused_sT[j]

    def tf_col(j):
        return jax.lax.bitcast_convert_type(fused_sT[n_ti + j], jnp.float32)

    ox16 = ox * jnp.int32(fp.SUBPIXEL_SCALE)
    oy16 = oy * jnp.int32(fp.SUBPIXEL_SCALE)

    a_s = [ti_col(i) for i in range(3)]
    b_s = [ti_col(3 + i) for i in range(3)]
    eb = []
    for i in range(3):
        e64 = (ti_col(6 + 2 * i), ti_col(7 + 2 * i))
        stepped = fp.i64_add(
            fp.i64_add(e64, fp.i64_mul_i32(a_s[i], ox16)), fp.i64_mul_i32(b_s[i], oy16)
        )
        eb.append(fp.i64_clamp_to_i32(stepped, -fp.ANCHOR_CLAMP, fp.ANCHOR_CLAMP))

    dzx = ti_col(12)
    dzy = ti_col(13)
    zshift = ti_col(14)
    tid = ti_col(15)
    zq0 = ti_col(16)
    x0f = ti_col(17)
    y0f = ti_col(18)
    gx = tf_col(0)
    gy = tf_col(1)
    can_x = (ox // fp.DEPTH_TILE) * fp.DEPTH_TILE
    can_y = (oy // fp.DEPTH_TILE) * fp.DEPTH_TILE
    z_can = depth_tile_anchor(zq0, x0f, y0f, gx, gy, zshift, can_x, can_y)
    zo = z_can + dzx * (ox - can_x) + dzy * (oy - can_y)

    invalid = ~slot_valid
    # Invalid slots: make coverage impossible (eb0 very negative, steps 0).
    # (Also reached by the kernel's skipped window-leading records, which
    # are masked by index, so this is belt and braces.)
    neg = jnp.int32(-(1 << 30))
    scale = jnp.int32(fp.SUBPIXEL_SCALE)
    rec_cols = [
        jnp.where(invalid, neg, eb[0]),
        jnp.where(invalid, neg, eb[1]),
        jnp.where(invalid, neg, eb[2]),
    ]
    rec_cols += [jnp.where(invalid, 0, a_s[i] * scale) for i in range(3)]
    rec_cols += [jnp.where(invalid, 0, b_s[i] * scale) for i in range(3)]
    rec_cols += [zo, dzx, dzy, zshift, tid, jnp.zeros_like(tid), jnp.zeros_like(tid)]
    if msaa4:
        # Raw (per-subpixel) edge coefficients for sample-position stepping.
        rec_cols += [jnp.where(invalid, 0, a_s[i]) for i in range(3)]
        rec_cols += [jnp.where(invalid, 0, b_s[i]) for i in range(3)]
        rec_cols += [jnp.zeros_like(tid), jnp.zeros_like(tid)]
    records = jnp.pad(jnp.stack(rec_cols, axis=0), ((0, 0), (0, SEGMENT_ALIGN)))

    # Planes: re-anchor from pixel (0,0) to the tile origin (pure arith).
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    nch = 0 if channels is None else channels.shape[-1]
    frec_cols = []
    for p in range(3 + nch):  # b0, b1, invw, channels...
        p00 = tf_col(2 + 3 * p)
        pdx = tf_col(3 + 3 * p)
        pdy = tf_col(4 + 3 * p)
        frec_cols += [p00 + pdx * oxf + pdy * oyf, pdx, pdy]
    frec_cols.append(tid.astype(jnp.float32))  # ftid_col(nch)
    while len(frec_cols) < fw:
        frec_cols.append(jnp.zeros_like(oxf))
    frecords = jnp.pad(jnp.stack(frec_cols, axis=0), ((0, 0), (0, SEGMENT_ALIGN)))

    return BinnedTriangles(
        records=records,
        frecords=frecords,
        tile_start=tile_start,
        tile_count=count,
        num_pairs=true_pairs,
        overflowed=overflowed,
    )
