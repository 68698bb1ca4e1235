"""3D transform math (the GLM-equivalent layer).

The reference uses GLM on the host to build ``Uniforms { model, view, proj }``
(/root/reference/src/main.cpp:781-809, 1516-1527) with column-vector math
(``proj * view * model * pos``, /root/reference/src/cube.slang:61) and
column-major matrix layout configured in the Slang session
(/root/reference/src/main.cpp:1611).

Here the same math is pure JAX: matrices are ``(4, 4)`` f32 arrays with the
*mathematical* column-vector convention ``M @ v`` (GLM's ``M * v``).  Batched
vertex transforms are therefore ``verts @ M.T`` — one ``(N, 4) x (4, 4)``
matmul that maps straight onto the MXU.

Clip conventions (framework-wide, documented once here):
  * NDC x: -1 (left) .. +1 (right)
  * NDC y: -1 (top) .. +1 (bottom)  — Vulkan-style y-down
  * NDC z: 0 (near) .. 1 (far)     — Vulkan-style zero-to-one depth
``perspective`` produces a Vulkan-convention matrix (y-down, depth 0..1); the
reference feeds GLM's GL-convention matrix to a Vulkan pipeline unflipped (a
WIP quirk noted in SURVEY.md §2.13); we standardise on the Vulkan convention.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def identity() -> Array:
    return jnp.eye(4, dtype=jnp.float32)


def translate(v, m: Array | None = None) -> Array:
    """GLM ``translate``: post-multiplies ``m`` by a translation by ``v``."""
    v = jnp.asarray(v, jnp.float32)
    t = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(v)
    return t if m is None else jnp.asarray(m, jnp.float32) @ t


def scale(v, m: Array | None = None) -> Array:
    v = jnp.asarray(v, jnp.float32)
    s = jnp.diag(jnp.concatenate([v, jnp.ones((1,), jnp.float32)]))
    return s if m is None else jnp.asarray(m, jnp.float32) @ s


def rotate(angle, axis, m: Array | None = None) -> Array:
    """GLM ``rotate``: rotation by ``angle`` radians about ``axis``.

    Mirrors the reference's per-frame ``rotate_cube`` model-matrix update
    (/root/reference/src/main.cpp:788-809).
    """
    angle = jnp.asarray(angle, jnp.float32)
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    ic = 1.0 - c
    r = jnp.stack(
        [
            jnp.stack([c + x * x * ic, x * y * ic - z * s, x * z * ic + y * s, jnp.zeros_like(c)]),
            jnp.stack([y * x * ic + z * s, c + y * y * ic, y * z * ic - x * s, jnp.zeros_like(c)]),
            jnp.stack([z * x * ic - y * s, z * y * ic + x * s, c + z * z * ic, jnp.zeros_like(c)]),
            jnp.stack([jnp.zeros_like(c)] * 3 + [jnp.ones_like(c)]),
        ]
    ).astype(jnp.float32)
    return r if m is None else jnp.asarray(m, jnp.float32) @ r


def perspective(fovy, aspect, z_near, z_far) -> Array:
    """Vulkan-convention perspective: y-down NDC, depth in [0, 1].

    The reference builds ``glm::perspective(radians(45), w/h, 0.1, 10)``
    (/root/reference/src/main.cpp:1524); this is the same frustum expressed
    in the framework's Vulkan-style clip conventions.
    """
    fovy = jnp.asarray(fovy, jnp.float32)
    f = 1.0 / jnp.tan(fovy / 2.0)
    z_near = jnp.float32(z_near)
    z_far = jnp.float32(z_far)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / jnp.float32(aspect))
    m = m.at[1, 1].set(f)  # y-down handled by the viewport transform sign
    m = m.at[2, 2].set(z_far / (z_far - z_near))
    m = m.at[2, 3].set(-(z_far * z_near) / (z_far - z_near))
    m = m.at[3, 2].set(1.0)
    # Note: this maps view-space +z in front of the camera (left-handed view,
    # matching the reference's view = translate(0,0,-3) then looking at the
    # origin along +z after the model transform).
    return m


def look_at(eye, center, up) -> Array:
    """Right-handed look-at (GLM ``lookAtRH``) adapted to the framework's
    left-handed projection: view-space +z points from eye toward center."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = center - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(up, fwd)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(fwd, right)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(right)
    m = m.at[1, :3].set(true_up)
    m = m.at[2, :3].set(fwd)
    m = m.at[0, 3].set(-jnp.dot(right, eye))
    m = m.at[1, 3].set(-jnp.dot(true_up, eye))
    m = m.at[2, 3].set(-jnp.dot(fwd, eye))
    return m


def transform_points(m: Array, pts: Array) -> Array:
    """Batched ``M @ [p, 1]`` for ``pts`` of shape (N, 3) or (N, 4).

    This is the vertex stage's hot matmul: (N, 4) x (4, 4) on the MXU
    (the TPU analog of the per-vertex ``mul(u.proj, mul(u.view, ...))``
    in /root/reference/src/cube.slang:61).
    """
    pts = jnp.asarray(pts, jnp.float32)
    if pts.shape[-1] == 3:
        pts = jnp.concatenate([pts, jnp.ones((*pts.shape[:-1], 1), jnp.float32)], axis=-1)
    return pts @ m.T


def transform_directions(m: Array, dirs: Array) -> Array:
    """Rotate direction vectors by the upper-3x3 of ``m`` (w = 0)."""
    dirs = jnp.asarray(dirs, jnp.float32)
    return dirs @ m[:3, :3].T


def normal_matrix(model: Array) -> Array:
    """Inverse-transpose upper-3x3 for transforming normals."""
    return jnp.linalg.inv(model[:3, :3]).T
