"""Per-instance frustum culling: drop whole instances before expansion.

BASELINE config 4 (10k instanced cubes) is binning-dominated: every
instance's 12 triangles are vertex-transformed, set up, and sorted into
(tile, triangle) pairs even when the instance is entirely off-screen.
This module culls instances *before* ``vertex.expand_instances`` feeds
their corner rows into the pipeline, compacting survivors into a
static-size budget so all downstream shapes stay XLA-static.

Correctness contract (renderer tests assert bit-identity):

* The visibility test is CONSERVATIVE: an instance is culled only when
  the convex hull of its transformed mesh bounding box is provably
  outside the view volume with >= ``slack_px`` pixels to spare, so no
  culled instance could have produced coverage.  Each frustum-plane
  functional is linear in homogeneous clip coordinates, so "all 8 hull
  corners strictly outside one plane" implies the same for every point
  of the hull — and the instance's vertices lie inside it whenever the
  vertex stage is affine in "position" (true for every built-in shader;
  ``Pipeline.instance_cull`` is opt-in for exactly this reason).
* Compaction is ORDER-PRESERVING (stable sort), and the renderer carries
  each surviving triangle's ORIGINAL draw-order id through the raster
  records, so depth-tie resolution and the output tri_id buffer are
  bit-identical to the uncull ed render.
* Near-plane: setup drops any triangle with a vertex at w <= w_eps, so
  "all corners w <= w_eps" is also a safe cull (every vertex w is a
  convex combination of corner w's).

The reference has no culling stage at all (its GPU does per-triangle
view-volume clipping in fixed-function hardware after the vertex shader,
configured at /root/reference/src/main.cpp:1742-1789); per-instance
culling is the TPU-native answer to the same workload: shrink the
static triangle stream that the binner must sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import Mesh

W_EPS = 1e-6  # must match setup_triangles' w_eps


def mesh_bbox_corners(mesh: Mesh) -> jnp.ndarray:
    """(8, 4) homogeneous corners of the mesh's object-space AABB."""
    p = mesh.attributes["position"]
    if p.shape[-1] > 3:
        p = p[..., :3]
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    sel = jnp.asarray(
        [[(c >> a) & 1 for a in range(3)] for c in range(8)], jnp.float32
    )
    xyz = lo[None, :] * (1.0 - sel) + hi[None, :] * sel
    return jnp.concatenate([xyz, jnp.ones((8, 1), jnp.float32)], axis=-1)


def instance_visibility(
    shader,
    mesh: Mesh,
    instances: dict,
    uniforms,
    width: int,
    height: int,
    slack_px: float = 2.0,
) -> jnp.ndarray:
    """Conservative per-instance visibility: (I,) bool.

    Runs the draw's own vertex stage on each instance's 8 bounding-box
    corners (proxy attributes: instance attrs broadcast as in
    expand_instances; other per-vertex attrs take the mesh's first row),
    then tests the clip-space hull against the left/right/top/bottom
    frustum planes inset by ``slack_px`` pixels (margin for fixed-point
    snapping) and the near plane (w <= w_eps).
    """
    corners = mesh_bbox_corners(mesh)  # (8, 4)
    num_inst = next(iter(instances.values())).shape[0]
    n = 8
    attrs = {}
    for k, v in mesh.attributes.items():
        # Value is irrelevant for clip position (affine-in-position
        # contract); broadcast row 0 so shapes line up.
        attrs[k] = jnp.broadcast_to(v[0:1], (num_inst * n, v.shape[-1]))
    attrs["position"] = jnp.tile(corners, (num_inst, 1))
    for k, v in instances.items():
        flat = jnp.asarray(v, jnp.float32).reshape(v.shape[0], -1)
        attrs[k] = jnp.repeat(flat, n, axis=0, total_repeat_length=num_inst * n)
    clip, _ = shader.vertex(attrs, uniforms)
    clip = clip.reshape(num_inst, n, 4)
    x, y, w = clip[..., 0], clip[..., 1], clip[..., 3]
    sx = jnp.float32(1.0 + 2.0 * slack_px / width)
    sy = jnp.float32(1.0 + 2.0 * slack_px / height)
    out_left = jnp.all(x + sx * w < 0, axis=1)
    out_right = jnp.all(sx * w - x < 0, axis=1)
    out_top = jnp.all(y + sy * w < 0, axis=1)
    out_bottom = jnp.all(sy * w - y < 0, axis=1)
    out_near = jnp.all(w <= jnp.float32(W_EPS), axis=1)
    return ~(out_left | out_right | out_top | out_bottom | out_near)


def compact_instances(instances: dict, visible: jnp.ndarray, budget: int):
    """Gather visible instances (order-preserving) into ``budget`` slots.

    Returns (compacted instances dict with leading dim ``budget``,
    orig_idx (budget,) int32 original instance indices, overflowed ()
    bool).  Slots past the visible count hold culled instances — they
    are provably coverage-free, so rendering them is harmless (only
    wasted work).  ``overflowed`` is True when visible instances did not
    fit the budget (trailing ones were DROPPED — surfaced exactly like a
    binner pair-budget breach via FrameResult.overflowed).
    """
    num_inst = visible.shape[0]
    budget = min(int(budget), num_inst)
    keys = jnp.where(visible, jnp.int32(0), jnp.int32(1))
    _, orig_idx = jax.lax.sort(
        (keys, jnp.arange(num_inst, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    orig_idx = orig_idx[:budget]
    # ONE fused row gather over all instance attributes (gather
    # discipline: per-column gathers cost ~a full row gather EACH).
    names = sorted(instances)
    flats = [
        jnp.asarray(instances[k], jnp.float32).reshape(len(visible), -1)
        for k in names
    ]
    widths = [f.shape[-1] for f in flats]
    fused = jnp.concatenate(flats, axis=-1)[orig_idx]
    out = {}
    off = 0
    for k, wdt in zip(names, widths):
        v = instances[k]
        out[k] = fused[:, off : off + wdt].reshape((budget,) + v.shape[1:])
        off += wdt
    overflowed = jnp.sum(visible.astype(jnp.int32)) > jnp.int32(budget)
    return out, orig_idx, overflowed
