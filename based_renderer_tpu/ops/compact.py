"""Covered-tile compaction for deferred shading (net-new vs the
reference: a GPU shades only rasterized quads by construction —
/root/reference/src/main.cpp:1841-1857 just binds the fragment stage —
while a software deferred pass shades the whole framebuffer unless it
compacts).

The fragment pass and its texture taps cost per-PIXEL regardless of
coverage: a full-screen flat tap gather is ~9.5 ms at 2M pixels on v5e
(CLAUDE.md).  Dynamic shapes are unavailable under jit, so compaction is
tile-granular with a STATIC budget:

  1. reduce the draw's coverage mask to per-(8,128)-tile bits;
  2. sort the ~2k tile keys so covered tiles come first (in tile order);
  3. row-gather the first ``budget`` tiles' fragment inputs
     (one wide row gather — the fast gather class, see CLAUDE.md);
  4. shade the compacted (budget, 8, 128) micro-framebuffers with the
     fragment shader vmapped over tiles;
  5. row-scatter the shaded tiles back.

If more tiles are covered than budgeted, the caller's ``lax.cond`` runs
the full-screen pass instead (both branches compile; one executes).
Slots past the covered count hold real-but-uncovered tiles whose mask is
all-false, so shading them is a harmless no-op write-back.

Tile shape is fixed at (8, 128) — the f32 VREG tile, and the raster
kernels' native granularity.  Note for shaders that derive texture LOD
from screen-space UV differences (``texture.lod_from_uv``): under
compaction the derivative field is per-tile, so the last row/column of
each tile clamps one step earlier than full-screen shading would — the
same class of artifact as GPU 2x2-quad derivatives at primitive edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TILE_H = 8
TILE_W = 128


def eligible(h: int, w: int) -> bool:
    return h % TILE_H == 0 and w % TILE_W == 0


def num_tiles(h: int, w: int) -> int:
    return (h // TILE_H) * (w // TILE_W)


def tile_rows(planes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(C, H, W) planar -> (NT, C * TILE_H * TILE_W) tile rows.

    Channel-MAJOR within the row: the relayout permutes only non-minor
    dims (the 128-lane minor stays put), which is 5x faster on TPU than
    the channel-minor variant (whose lane dim collapses to C — measured
    1.58 vs 0.31 ms for 9 channels at 1080p).  A gathered row unpacks to
    a (C, TILE_H, TILE_W) planar micro-framebuffer with one reshape.
    """
    c = planes.shape[0]
    nty, ntx = h // TILE_H, w // TILE_W
    return (
        planes.reshape(c, nty, TILE_H, ntx, TILE_W)
        .transpose(1, 3, 0, 2, 4)
        .reshape(nty * ntx, c * TILE_H * TILE_W)
    )


def untile_rows(rows: jnp.ndarray, c: int, h: int, w: int) -> jnp.ndarray:
    """(NT, C * TILE_H * TILE_W) tile rows -> (C, H, W) planar."""
    nty, ntx = h // TILE_H, w // TILE_W
    return (
        rows.reshape(nty, ntx, c, TILE_H, TILE_W)
        .transpose(2, 0, 3, 1, 4)
        .reshape(c, h, w)
    )


def covered_tile_order(mask: jnp.ndarray, h: int, w: int):
    """Sorted tile ids (covered first, each group in tile order) + count.

    mask: (H, W) bool (pixels this draw may shade).
    Returns (order (NT,) int32 of unique tile ids, count scalar int32).
    """
    nty, ntx = h // TILE_H, w // TILE_W
    nt = nty * ntx
    cov = mask.reshape(nty, TILE_H, ntx, TILE_W).any(axis=(1, 3)).reshape(nt)
    tid = jnp.arange(nt, dtype=jnp.int32)
    order = jax.lax.sort(jnp.where(cov, tid, tid + jnp.int32(nt)))
    return order % jnp.int32(nt), jnp.sum(cov.astype(jnp.int32))


def gather_tiles(rows: jnp.ndarray, sel: jnp.ndarray, c: int) -> jnp.ndarray:
    """Gather selected tile rows -> (B, C, TILE_H, TILE_W) planar."""
    return rows[sel].reshape(sel.shape[0], c, TILE_H, TILE_W)


def scatter_tiles(
    rows: jnp.ndarray, sel: jnp.ndarray, tiles: jnp.ndarray
) -> jnp.ndarray:
    """Scatter (B, C, TILE_H, TILE_W) planar tiles back into tile rows.

    ``sel`` entries are unique (covered_tile_order output), so plain
    set-scatter semantics apply.
    """
    b = tiles.shape[0]
    return rows.at[sel].set(tiles.reshape(b, -1), unique_indices=True)
