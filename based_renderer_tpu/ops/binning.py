"""Triangle-to-tile binning for the Pallas rasterizer.

The reference's GPU does this in fixed-function hardware between vertex
shading and fragment shading; on TPU it is an explicit vectorized XLA
stage: expand each triangle into (tile, triangle) pairs over its clipped
tile bounding box, sort pairs by tile (stable, preserving draw order),
and precompute a flat per-pair raster record so the Pallas kernel's inner
loop is pure int32 arithmetic with zero per-triangle setup.

Pair records are two arrays (int and float kept separate — Mosaic has no
scalar bitcast, and exact int32 edge math must not round-trip through f32):

int records (int32 x RECORD_WIDTH):
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

float records (f32, width 6 + 3*(1 + K) for K varying channels) — affine
screen-space planes q(p) = q_o + dq_dx*ix + dq_dy*iy (accurate for any
triangle size, unlike edge-value renormalization which saturates with the
int32 clamp on >2048px triangles):
  0..2   b0 plane      barycentric weight of v0
  3..5   b1 plane      weight of v1 (b2 = 1 - b0 - b1)
  6..8   invw plane    interpolated 1/clip_w (perspective correction)
  9..    K channel planes, 3 floats each — the *varying interpolators*:
         for perspective-correct attributes the plane carries attr/w and
         the per-pixel value is channel/invw; non-perspective planes
         carry attr directly.  Interpolating attributes in the raster
         kernel replaces the per-pixel vertex-data gathers of classic
         deferred shading — gathers are pathologically slow on TPU
         (no hardware gather unit), planes are pure VPU math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fixedpoint as fp
from .setup import TriSetup, depth_tile_anchor

RECORD_WIDTH = 16
FRECORD_BASE = 9  # b0 plane, b1 plane, invw plane


def frecord_width(num_channels: int) -> int:
    # Rounded up to a multiple of 8: f32 sublane tiling requires slices
    # of (W, 128) HBM records to have W % 8 == 0.
    w = FRECORD_BASE + 3 * num_channels
    return (w + 7) // 8 * 8


FRECORD_WIDTH = frecord_width(0)  # no-varyings layout


SEGMENT_ALIGN = 128  # per-tile segments start at multiples of this (the
# Pallas kernel DMAs 128-record chunks, and Mosaic requires 128-aligned
# offsets/shapes along the minor dimension)


class BinnedTriangles(NamedTuple):
    # Transposed field-major layout: minor dim is the pair index, so the
    # kernel's (W, 128) DMA slices are lane-aligned.
    records: jnp.ndarray  # (RECORD_WIDTH, PADDED_PAIRS) int32
    frecords: jnp.ndarray  # (FRECORD_WIDTH, PADDED_PAIRS) float32
    tile_start: jnp.ndarray  # (num_tiles,) int32 — 128-aligned segment start
    tile_count: jnp.ndarray  # (num_tiles,) int32 — true (unpadded) count
    num_pairs: jnp.ndarray  # () int32 — true pair count (pre-truncation)
    overflowed: jnp.ndarray  # () bool — true pair count exceeded MAXPAIRS


def _pair_records(
    ts: TriSetup,
    tri,
    tile_x,
    tile_y,
    tile_w: int,
    tile_h: int,
    id_offset=0,
    channels=None,
    perspective: bool = True,
):
    """Build raster records for (tile, tri) pairs (vectorized).

    tri, tile_x, tile_y: int32 (P,) arrays (tri may be out of range for
    padding rows; caller overwrites those rows' validity via sorting).
    channels: optional (T, 3, K) f32 per-vertex varying values flattened
    across attributes; emitted as K interpolation planes per pair.
    """
    t = jnp.clip(tri, 0, ts.valid.shape[0] - 1)
    ox = tile_x * tile_w  # tile-origin pixel
    oy = tile_y * tile_h
    ox_fp, oy_fp = fp.pixel_center_fp(ox, oy)

    # Exact edge values at the tile origin, clamped (sign-exact for any
    # pixel within 128px of the anchor), bias folded in.
    xf = ts.xf[t]  # (P, 3)
    yf = ts.yf[t]
    a = ts.a[t]
    b = ts.b[t]
    e = fp.edge_at_point_exact(xf, yf, a, b, ox_fp[:, None], oy_fp[:, None])
    e0 = fp.i64_clamp_to_i32(e, -fp.ANCHOR_CLAMP, fp.ANCHOR_CLAMP) + ts.bias[t]

    # Depth plane value at the tile origin: canonical-anchor evaluation
    # (spec) stepped to the tile origin in exact int32.
    can_x = (ox // fp.DEPTH_TILE) * fp.DEPTH_TILE
    can_y = (oy // fp.DEPTH_TILE) * fp.DEPTH_TILE
    z_can = depth_tile_anchor(
        ts.zq[t, 0], ts.xf[t, 0], ts.yf[t, 0], ts.gx[t], ts.gy[t], ts.zshift[t], can_x, can_y
    )
    dzx = ts.dzdx_q[t]
    dzy = ts.dzdy_q[t]
    zo = z_can + dzx * (ox - can_x) + dzy * (oy - can_y)

    scale = jnp.int32(fp.SUBPIXEL_SCALE)
    zero = jnp.zeros_like(t)
    rec = jnp.stack(
        [
            e0[:, 0],
            e0[:, 1],
            e0[:, 2],
            a[:, 0] * scale,
            a[:, 1] * scale,
            a[:, 2] * scale,
            b[:, 0] * scale,
            b[:, 1] * scale,
            b[:, 2] * scale,
            zo,
            dzx,
            dzy,
            ts.zshift[t],
            t + jnp.int32(id_offset),
            zero,
            zero,
        ],
        axis=-1,
    )

    # Barycentric planes (f32): weight of v0 comes from edge 1, v1 from
    # edge 2 (see setup.barycentrics_f32); exact edge value at the tile
    # origin converted via the deterministic i64 -> f32 split.
    inv_area = ts.inv_area[t]
    e_origin_f = _i64_to_f32_pair(e)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    sc = jnp.float32(fp.SUBPIXEL_SCALE)
    # Barycentric planes of v0 and v1 (b2 = 1 - b0 - b1 in-kernel).
    b0p = (e_origin_f[:, 1] * inv_area, af[:, 1] * sc * inv_area, bf[:, 1] * sc * inv_area)
    b1p = (e_origin_f[:, 2] * inv_area, af[:, 2] * sc * inv_area, bf[:, 2] * sc * inv_area)
    b2p = tuple(-(x0 + x1) for x0, x1 in zip(b0p, b1p))
    b2p = (b2p[0] + 1.0, b2p[1], b2p[2])

    def plane_of(q):
        """Affine plane of per-vertex quantity q (P, 3) via bary planes."""
        return tuple(
            q[:, 0] * b0p[i] + q[:, 1] * b1p[i] + q[:, 2] * b2p[i] for i in range(3)
        )

    iw = ts.inv_w[t]  # (P, 3)
    iwp = plane_of(iw)
    cols = list(b0p) + list(b1p) + list(iwp)
    if channels is not None:
        ch = channels[t]  # (P, 3, K)
        if perspective:
            ch = ch * iw[:, :, None]
        for k in range(ch.shape[-1]):
            cols.extend(plane_of(ch[:, :, k]))
    nch = 0 if channels is None else channels.shape[-1]
    while len(cols) < frecord_width(nch):  # sublane-alignment padding
        cols.append(jnp.zeros_like(inv_area))
    frec = jnp.stack(cols, axis=-1)
    return rec, frec


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
) -> BinnedTriangles:
    """Bin triangles into screen tiles.

    Tile sizes must divide 128 in y and be 128 in x... more precisely the
    anchored-exactness proofs require every pixel of a tile to be within
    128px of both the tile origin and its canonical 128-grid anchor, so
    tile_w and tile_h must each divide 128 (or equal 128).
    """
    if 128 % tile_w and tile_w != 128:
        raise ValueError("tile_w must divide 128")
    if 128 % tile_h and tile_h != 128:
        raise ValueError("tile_h must divide 128")
    num_tx = -(-width // tile_w)
    num_ty = -(-height // tile_h)
    num_tiles = num_tx * num_ty
    num_tris = ts.valid.shape[0]
    if max_pairs is None:
        max_pairs = max(4 * num_tris, 1024)
    padded_pairs = max_pairs + SEGMENT_ALIGN * num_tiles
    fw = frecord_width(0 if channels is None else channels.shape[-1])
    if num_tris == 0:
        return BinnedTriangles(
            records=jnp.zeros((RECORD_WIDTH, padded_pairs), jnp.int32),
            frecords=jnp.zeros((fw, padded_pairs), jnp.float32),
            tile_start=jnp.zeros((num_tiles,), jnp.int32),
            tile_count=jnp.zeros((num_tiles,), jnp.int32),
            num_pairs=jnp.int32(0),
            overflowed=jnp.bool_(False),
        )

    # Tile-space bbox (inclusive) of each valid triangle.
    x0 = ts.bbox[:, 0] // tile_w
    y0 = ts.bbox[:, 1] // tile_h
    x1 = (ts.bbox[:, 2] - 1) // tile_w
    y1 = (ts.bbox[:, 3] - 1) // tile_h
    bw = jnp.where(ts.valid, x1 - x0 + 1, 0)
    bh = jnp.where(ts.valid, y1 - y0 + 1, 0)
    k = bw * bh  # tiles covered per triangle

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(k, dtype=jnp.int32)])
    total = offsets[-1]
    overflowed = total > max_pairs

    # Expand: pair p belongs to triangle tri[p], covering its (p-offset)-th
    # bbox tile in row-major order.
    tri = jnp.repeat(
        jnp.arange(num_tris, dtype=jnp.int32),
        k,
        total_repeat_length=max_pairs,
    )
    # Rows beyond `total` repeat the last triangle; mark them invalid.
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    in_range = pair_idx < total
    seq = pair_idx - offsets[tri]
    bw_t = jnp.maximum(bw[tri], 1)
    tile_y = y0[tri] + seq // bw_t
    tile_x = x0[tri] + seq % bw_t
    tile_id = jnp.where(in_range, tile_y * num_tx + tile_x, jnp.int32(num_tiles))

    # Stable sort by tile keeps pairs in draw order within each tile —
    # the depth-tie semantics of the sequential rasterizer are preserved.
    order = jnp.argsort(tile_id, stable=True)
    tile_id_sorted = tile_id[order]
    records, frecords = _pair_records(
        ts,
        tri[order],
        tile_x[order],
        tile_y[order],
        tile_w,
        tile_h,
        id_offset,
        channels=channels,
        perspective=perspective,
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    sort_start = jnp.searchsorted(tile_id_sorted, tile_range, side="left").astype(jnp.int32)
    sort_end = jnp.searchsorted(tile_id_sorted, tile_range, side="right").astype(jnp.int32)
    count = sort_end - sort_start

    # Re-pack each tile's segment at a SEGMENT_ALIGN-aligned start so the
    # kernel's chunk DMAs have aligned offsets.
    padded_count = (count + SEGMENT_ALIGN - 1) // SEGMENT_ALIGN * SEGMENT_ALIGN
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_count, dtype=jnp.int32)[:-1]]
    )
    pair_valid = tile_id_sorted < num_tiles
    rank = jnp.arange(max_pairs, dtype=jnp.int32) - sort_start[
        jnp.clip(tile_id_sorted, 0, num_tiles - 1)
    ]
    newpos = jnp.where(
        pair_valid,
        tile_start[jnp.clip(tile_id_sorted, 0, num_tiles - 1)] + rank,
        jnp.int32(padded_pairs),  # out of bounds -> dropped by scatter
    )
    records_out = (
        jnp.zeros((RECORD_WIDTH, padded_pairs), jnp.int32)
        .at[:, newpos]
        .set(records.T, mode="drop")
    )
    frecords_out = (
        jnp.zeros((fw, padded_pairs), jnp.float32)
        .at[:, newpos]
        .set(frecords.T, mode="drop")
    )
    return BinnedTriangles(
        records=records_out,
        frecords=frecords_out,
        tile_start=tile_start,
        tile_count=count,
        num_pairs=total,
        overflowed=overflowed,
    )
