"""Geometry generators for the demo set (numpy; upload via Renderer).

The reference hard-codes its geometry inside vertex shaders: a 3-vertex
NDC triangle (/root/reference/src/triangle.slang:4-13) and a 36-vertex
unit cube, 6 faces x 2 triangles (/root/reference/src/cube.slang:12-61).
Here the same shapes are mesh data, plus the procedural large meshes the
BASELINE configs 4-5 need (instanced fields, ~1M-triangle surfaces).
"""

from __future__ import annotations

import numpy as np


def triangle_mesh_data():
    """The triangle.slang demo triangle: NDC positions (y-down), one face.

    triangle.slang uses (-0.5, 0.5), (0.5, 0.5), (0.0, -0.5) — in y-down
    screen convention that is two bottom corners and an apex at the top.
    """
    positions = np.array(
        [[-0.5, 0.5, 0.0], [0.5, 0.5, 0.0], [0.0, -0.5, 0.0]], np.float32
    )
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    return {"positions": positions, "color": colors}


def fullscreen_quad_data(uv_tiles: float = 4.0):
    """Two NDC triangles covering the whole screen, with tiled UVs.

    The worst-case texture workload: EVERY pixel samples (no compaction
    escape hatch) — the floor the textured tier of BASELINE config 3
    would hit on a sky/background pass.
    """
    corners = {
        "bl": ((-1.0, 1.0, 0.5), (0.0, uv_tiles)),
        "br": ((1.0, 1.0, 0.5), (uv_tiles, uv_tiles)),
        "tr": ((1.0, -1.0, 0.5), (uv_tiles, 0.0)),
        "tl": ((-1.0, -1.0, 0.5), (0.0, 0.0)),
    }
    order = ["bl", "br", "tr", "bl", "tr", "tl"]
    positions = np.array([corners[k][0] for k in order], np.float32)
    uv = np.array([corners[k][1] for k in order], np.float32)
    return {"positions": positions, "uv": uv}


def cube_mesh_data(size: float = 1.0):
    """Unit cube centered at origin, 6 faces x 2 triangles, non-indexed
    (the cube.slang:12-61 vertex ordering: -Z, +Z, -X, +X, -Y, +Y faces),
    with per-vertex face normals, per-face UVs, and per-face colors."""
    h = np.float32(size * 0.5)
    # Each face: (normal, origin corner, u axis, v axis) -> two triangles.
    faces = [
        # normal,          corner,        u-axis,        v-axis
        ((0, 0, -1), (-h, -h, -h), (2 * h, 0, 0), (0, 2 * h, 0)),  # -Z
        ((0, 0, 1), (-h, -h, h), (2 * h, 0, 0), (0, 2 * h, 0)),  # +Z
        ((-1, 0, 0), (-h, h, h), (0, 0, -2 * h), (0, -2 * h, 0)),  # -X
        ((1, 0, 0), (h, h, h), (0, 0, -2 * h), (0, -2 * h, 0)),  # +X
        ((0, -1, 0), (-h, -h, -h), (2 * h, 0, 0), (0, 0, 2 * h)),  # -Y
        ((0, 1, 0), (-h, h, -h), (2 * h, 0, 0), (0, 0, 2 * h)),  # +Y
    ]
    face_colors = np.array(
        [
            [0.9, 0.2, 0.2],
            [0.2, 0.9, 0.2],
            [0.2, 0.2, 0.9],
            [0.9, 0.9, 0.2],
            [0.9, 0.2, 0.9],
            [0.2, 0.9, 0.9],
        ],
        np.float32,
    )
    quad = np.array([(0, 0), (1, 0), (1, 1), (1, 1), (0, 1), (0, 0)], np.float32)
    pos, nrm, uv, col = [], [], [], []
    for i, (n, c, ua, va) in enumerate(faces):
        n = np.array(n, np.float32)
        c = np.array(c, np.float32)
        ua = np.array(ua, np.float32)
        va = np.array(va, np.float32)
        fp = [c + u * ua + v * va for (u, v) in quad]
        fuv = [(u, v) for (u, v) in quad]
        # Consistent winding: cross(e1, e2) must point along the outward
        # normal for every face, so back-face culling sees a watertight
        # orientation (each triangle reversed independently if needed).
        for tri0 in (0, 3):
            g = np.cross(fp[tri0 + 1] - fp[tri0], fp[tri0 + 2] - fp[tri0])
            if np.dot(g, n) < 0:
                fp[tri0], fp[tri0 + 2] = fp[tri0 + 2], fp[tri0]
                fuv[tri0], fuv[tri0 + 2] = fuv[tri0 + 2], fuv[tri0]
        for k in range(6):
            pos.append(fp[k])
            nrm.append(n)
            uv.append(fuv[k])
            col.append(face_colors[i])
    return {
        "positions": np.stack(pos),
        "normal": np.stack(nrm),
        "uv": np.array(uv, np.float32),
        "color": np.stack(col),
    }


def checkerboard_texture(size: int = 256, squares: int = 8):
    """Classic checkerboard albedo texture, (size, size, 3) float32."""
    ij = np.arange(size)
    cell = (ij[:, None] // (size // squares) + ij[None, :] // (size // squares)) % 2
    base = np.where(cell[..., None] > 0, np.float32(0.9), np.float32(0.25))
    tint = np.array([1.0, 0.85, 0.6], np.float32)
    return (base * tint).astype(np.float32)


def instanced_grid_transforms(count: int, spacing: float = 2.5, seed: int = 0):
    """Per-instance 4x4 transforms for a cube field (BASELINE config 4):
    a sqrt(count)^2 grid with per-instance rotation and color."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(count)))
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    grid = np.stack([xs.ravel()[:count], ys.ravel()[:count]], axis=-1).astype(np.float32)
    grid = (grid - grid.mean(axis=0)) * spacing
    angles = rng.uniform(0, 2 * np.pi, count).astype(np.float32)
    scales = rng.uniform(0.4, 0.9, count).astype(np.float32)
    transforms = np.zeros((count, 4, 4), np.float32)
    ca, sa = np.cos(angles), np.sin(angles)
    transforms[:, 0, 0] = ca * scales
    transforms[:, 0, 2] = sa * scales
    transforms[:, 2, 0] = -sa * scales
    transforms[:, 2, 2] = ca * scales
    transforms[:, 1, 1] = scales
    transforms[:, 0, 3] = grid[:, 0]
    transforms[:, 1, 3] = rng.uniform(-1.0, 1.0, count).astype(np.float32)
    transforms[:, 2, 3] = grid[:, 1]
    transforms[:, 3, 3] = 1.0
    colors = rng.uniform(0.2, 1.0, (count, 3)).astype(np.float32)
    return transforms, colors


def procedural_mesh_data(target_triangles: int = 1_000_000, seed: int = 0):
    """A bunny/dragon-class dense mesh (BASELINE config 5): a displaced
    torus-knot tube surface subdivided to ~target_triangles, with smooth
    normals.  Deterministic; generated at f64 then cast to f32."""
    # Tube around a (p, q) torus knot, displaced by harmonics for organic
    # surface detail.  rings * segs quads -> 2 * rings * segs triangles.
    rings = int(np.sqrt(target_triangles / 2 * 2))  # aspect ~2:1
    segs = max(8, int(target_triangles / (2 * rings)))
    p, q = 2, 3
    t = np.linspace(0, 2 * np.pi, rings, endpoint=False, dtype=np.float64)
    # Knot center curve.
    r = 2.0 + np.cos(q * t)
    cx = r * np.cos(p * t)
    cy = r * np.sin(p * t)
    cz = -np.sin(q * t)
    center = np.stack([cx, cy, cz], axis=-1)  # (rings, 3)
    # Frenet-ish frame.
    d = np.roll(center, -1, axis=0) - np.roll(center, 1, axis=0)
    tangent = d / np.linalg.norm(d, axis=-1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    side = np.cross(tangent, up)
    side /= np.linalg.norm(side, axis=-1, keepdims=True)
    up2 = np.cross(side, tangent)
    phi = np.linspace(0, 2 * np.pi, segs, endpoint=False, dtype=np.float64)
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.02, 0.08, 4)
    freq = rng.integers(3, 9, 4)
    radius = 0.45 + sum(
        a * np.cos(f * phi)[None, :] * np.cos((i + 2) * t)[:, None]
        for i, (a, f) in enumerate(zip(amp, freq))
    )
    ring_pts = (
        center[:, None, :]
        + radius[..., None]
        * (np.cos(phi)[None, :, None] * side[:, None, :] + np.sin(phi)[None, :, None] * up2[:, None, :])
    )  # (rings, segs, 3)
    positions = ring_pts.reshape(-1, 3)

    # Quad grid indices with wraparound in both directions.
    ri = np.arange(rings)
    si = np.arange(segs)
    rr, ss = np.meshgrid(ri, si, indexing="ij")
    v00 = rr * segs + ss
    v01 = rr * segs + (ss + 1) % segs
    v10 = ((rr + 1) % rings) * segs + ss
    v11 = ((rr + 1) % rings) * segs + (ss + 1) % segs
    tris = np.concatenate(
        [np.stack([v00, v10, v11], -1).reshape(-1, 3), np.stack([v00, v11, v01], -1).reshape(-1, 3)]
    ).astype(np.int32)

    # Smooth normals: accumulate face normals at vertices.
    e1 = positions[tris[:, 1]] - positions[tris[:, 0]]
    e2 = positions[tris[:, 2]] - positions[tris[:, 0]]
    fn = np.cross(e1, e2)
    normals = np.zeros_like(positions)
    for k in range(3):
        np.add.at(normals, tris[:, k], fn)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)

    scale = 1.0 / np.abs(positions).max()
    return {
        "positions": (positions * scale).astype(np.float32),
        "normal": normals.astype(np.float32),
        "indices": tris,
    }


def procedural_mesh_device(target_triangles: int = 1_000_000, seed: int = 0):
    """Traceable ON-DEVICE twin of :func:`procedural_mesh_data`.

    Returns a zero-arg function producing the DE-INDEXED per-corner
    attribute dict ``{"position": (3T, 3), "normal": (3T, 3)}`` —
    exactly the layout ``upload_mesh(**procedural_mesh_data(...))``
    reaches after its host-side de-index — built entirely from jnp ops
    so it can run INSIDE a compiled program (``scene.generated_mesh``).

    Why: a 1M-triangle mesh captured as compile-time constants bakes
    ~144 MB of vertex data into every sequence executable (measured:
    ~505 MB raw / ~90 MB compressed cache entries whose remote
    serialize/load dominates benchmark and driver wall time).  Generated
    in-program, the same mesh is ~a kilobyte of code; generation runs
    once per DISPATCH (outside the frame scan), so per-frame cost is
    unchanged.  Values are f32 (not the numpy twin's f64 pipeline), so
    the two meshes agree in shape/topology but differ by float rounding
    — a workload definition, not a bit-contract (the raster bit-identity
    contract starts at the clip-space input).
    """
    import jax.numpy as jnp

    rings = int(np.sqrt(target_triangles / 2 * 2))
    segs = max(8, int(target_triangles / (2 * rings)))
    p, q = 2, 3
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.02, 0.08, 4)
    freq = rng.integers(3, 9, 4)

    def gen():
        t = (
            jnp.arange(rings, dtype=jnp.float32)
            * jnp.float32(2 * np.pi / rings)
        )
        r = 2.0 + jnp.cos(q * t)
        center = jnp.stack(
            [r * jnp.cos(p * t), r * jnp.sin(p * t), -jnp.sin(q * t)], axis=-1
        )  # (rings, 3)
        d = jnp.roll(center, -1, axis=0) - jnp.roll(center, 1, axis=0)
        tangent = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        side = jnp.cross(tangent, jnp.broadcast_to(up, tangent.shape))
        side = side / jnp.linalg.norm(side, axis=-1, keepdims=True)
        up2 = jnp.cross(side, tangent)
        phi = (
            jnp.arange(segs, dtype=jnp.float32) * jnp.float32(2 * np.pi / segs)
        )
        radius = 0.45 + sum(
            jnp.float32(a)
            * jnp.cos(jnp.float32(f) * phi)[None, :]
            * jnp.cos((i + 2) * t)[:, None]
            for i, (a, f) in enumerate(zip(amp, freq))
        )
        ring_pts = center[:, None, :] + radius[..., None] * (
            jnp.cos(phi)[None, :, None] * side[:, None, :]
            + jnp.sin(phi)[None, :, None] * up2[:, None, :]
        )
        positions = ring_pts.reshape(-1, 3)  # (rings*segs, 3)

        ri = jnp.arange(rings, dtype=jnp.int32)
        si = jnp.arange(segs, dtype=jnp.int32)
        rr = jnp.broadcast_to(ri[:, None], (rings, segs))
        ss = jnp.broadcast_to(si[None, :], (rings, segs))
        v00 = rr * segs + ss
        v01 = rr * segs + (ss + 1) % segs
        v10 = ((rr + 1) % rings) * segs + ss
        v11 = ((rr + 1) % rings) * segs + (ss + 1) % segs
        tris = jnp.concatenate(
            [
                jnp.stack([v00, v10, v11], -1).reshape(-1, 3),
                jnp.stack([v00, v11, v01], -1).reshape(-1, 3),
            ]
        )  # (T, 3) int32, same ordering as the numpy twin

        e1 = positions[tris[:, 1]] - positions[tris[:, 0]]
        e2 = positions[tris[:, 2]] - positions[tris[:, 0]]
        fn = jnp.cross(e1, e2)
        normals = jnp.zeros_like(positions)
        for k in range(3):
            normals = normals.at[tris[:, k]].add(fn)
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
        )
        scale = 1.0 / jnp.abs(positions).max()
        positions = positions * scale

        # De-index to the corner-sequential upload layout with ONE fused
        # row gather (gather discipline: one wide row gather, never
        # per-column gathers — ops/binning.py).
        fused = jnp.concatenate([positions, normals], axis=-1)  # (V, 6)
        flat = fused[tris.reshape(-1)]  # (3T, 6)
        return {
            "position": flat[:, :3],
            "normal": flat[:, 3:],
        }

    return gen
