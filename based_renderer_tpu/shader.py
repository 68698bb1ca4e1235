"""Shader system: vertex/fragment programs as composable Python functions.

The reference compiles Slang modules at runtime (``loadModule("cube")`` →
entry points ``vs``/``ps`` → SPIR-V → ``vk::ShaderModule``,
/root/reference/src/main.cpp:1587-1727).  Here a "shader module" is a pair
of traced JAX functions; "compilation" is jit tracing into the frame
program, and the registry below is the module search path (the analog of
the Slang session's ``src/`` search path, main.cpp:1613-1617).

ABI:
  vertex(attrs, uniforms) -> (clip_pos, varyings)
      attrs:    dict[str, (N, C) f32] per-vertex attributes; always
                contains "position" (N, 3 or 4).  For instanced draws the
                arrays are (I*N, C) with instance attributes pre-broadcast.
      returns:  clip_pos (N, 4) f32, varyings dict[str, (N, C) f32] —
                attributes to interpolate across triangles.
  fragment(frag, uniforms) -> rgba (H, W, 4) f32
      frag: dict of interpolated (H, W, C) varyings plus "tri_id" (H, W)
            int32, "depth" (H, W) f32, "bary" (H, W, 3) f32, and
            "pixel_xy" when requested.

Uniforms are an arbitrary pytree (typically a dict holding the reference's
``Uniforms { model, view, proj }``, main.cpp:781-786, plus textures and
light parameters).  Fragment stages run *deferred*: once per pixel over
the whole framebuffer on the VPU, after visibility is resolved.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from . import math3d
from .ops import texture as tex_ops
from .utils.errors import ShaderError


@dataclass(frozen=True)
class Shader:
    name: str
    vertex: Callable
    fragment: Callable
    # Names of the vertex attributes this shader consumes (besides position).
    attributes: tuple = ()


_REGISTRY: dict[str, Shader] = {}


def register(shader: Shader) -> Shader:
    _REGISTRY[shader.name] = shader
    return shader


def get(name: str) -> Shader:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ShaderError(
            f"unknown shader {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def names() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Shader modules on disk (the Slang-toolchain tier)
# ---------------------------------------------------------------------------

#: Directories searched by :func:`load_module`, the analog of the Slang
#: session's ``src/`` search path (/root/reference/src/main.cpp:1613-1617).
MODULE_SEARCH_PATH: list[str] = ["."]


def load_file(path, name: str | None = None) -> Shader:
    """Compile + register a shader module from a Python source file.

    The reference compiles shader *source on disk* at runtime —
    ``loadModule("cube")`` finds ``cube.slang`` on the session search path,
    compiles it, and binds its ``vs``/``ps`` entry points
    (/root/reference/src/main.cpp:1607-1647); a new material is a new
    source file, no rebuild.  This is that tier for the Python shader ABI:
    the file is exec'd with this module's vocabulary in scope (``Shader``,
    ``register``, ``jnp``, ``math3d``, ``tex_ops``, ``mvp_transform`` —
    normal ``import`` statements also work), and must define ONE of:

      - ``SHADER`` — a :class:`Shader` instance (registered under its own
        ``name``, or under ``name``/the file stem when given namelessly),
      - exactly one module-level :class:`Shader` value, or
      - ``vertex``/``fragment`` callables (plus optional ``ATTRIBUTES``),
        bound as ``Shader(<stem>, vertex, fragment, ATTRIBUTES)``.

    Compile and validation failures raise :class:`ShaderError` carrying
    the source path, the diagnostic, and the registered-module list — the
    ``SLANG_CHECK`` diagnostics path (main.cpp:586-606, 1635-1647).
    """
    src_path = os.fspath(path)
    try:
        with open(src_path) as f:
            src = f.read()
    except OSError as e:
        raise ShaderError(
            f"cannot read shader module {src_path!r}: {e}; "
            f"registered: {sorted(_REGISTRY)}"
        ) from None
    module_name = name or os.path.splitext(os.path.basename(src_path))[0]
    ns: dict = {
        "Shader": Shader,
        "register": register,
        "jnp": jnp,
        "math3d": math3d,
        "tex_ops": tex_ops,
        "mvp_transform": mvp_transform,
        "__name__": f"based_renderer_tpu.shader.modules.{module_name}",
        "__file__": src_path,
    }
    try:
        exec(compile(src, src_path, "exec"), ns)
    except ShaderError:
        raise
    except SyntaxError as e:
        raise ShaderError(
            f"shader module {src_path!r}: {e.__class__.__name__}: {e}"
        ) from e
    except Exception as e:
        raise ShaderError(
            f"shader module {src_path!r} raised during load: "
            f"{e.__class__.__name__}: {e}"
        ) from e

    shd = ns.get("SHADER")
    if not isinstance(shd, Shader):
        # Entry-point precedence: explicit vertex+fragment callables WIN
        # over stray Shader VALUES — a module may import/inspect existing
        # shaders (shader.get(...)) while defining its own entry points,
        # and those references must not hijack the registration.  Shader
        # values are deduplicated by identity so aliasing one Shader to
        # two names still counts as one.
        if callable(ns.get("vertex")) and callable(ns.get("fragment")):
            shd = Shader(
                module_name,
                ns["vertex"],
                ns["fragment"],
                tuple(ns.get("ATTRIBUTES", ())),
            )
        else:
            found: list[Shader] = []
            for k, v in ns.items():
                if isinstance(v, Shader) and k != "Shader" and all(
                    v is not f for f in found
                ):
                    found.append(v)
            if len(found) == 1:
                shd = found[0]
            else:
                raise ShaderError(
                    f"shader module {src_path!r} defines no entry points: "
                    f"expected SHADER, vertex+fragment callables, or a single "
                    f"Shader value (found {len(found)} distinct Shader values"
                    f"{', a vertex callable' if callable(ns.get('vertex')) else ''}"
                    f"{', a fragment callable' if callable(ns.get('fragment')) else ''}); "
                    f"registered: {sorted(_REGISTRY)}"
                )
    if name is not None and shd.name != name:
        shd = Shader(name, shd.vertex, shd.fragment, shd.attributes)
    return register(shd)


def load_module(name: str, search_paths=None) -> Shader:
    """``loadModule("cube")``: find ``<name>.py`` on the search path and
    :func:`load_file` it.  Already-registered names return the registered
    shader without touching the filesystem (module-identity caching, the
    ``vk::PipelineCache``-session analog)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    paths = MODULE_SEARCH_PATH if search_paths is None else list(search_paths)
    for d in paths:
        candidate = os.path.join(d, f"{name}.py")
        if os.path.exists(candidate):
            return load_file(candidate, name=name)
    raise ShaderError(
        f"no shader module {name!r} on search path {paths}; "
        f"registered: {sorted(_REGISTRY)}"
    )


# ---------------------------------------------------------------------------
# Common vertex-stage helpers
# ---------------------------------------------------------------------------


def mvp_transform(attrs, uniforms):
    """clip = proj @ view @ model @ pos — the cube.slang:61 transform, as a
    single fused (N,4)x(4,4) MXU matmul against the combined matrix."""
    mvp = uniforms["proj"] @ uniforms["view"] @ uniforms["model"]
    return math3d.transform_points(mvp, attrs["position"])


# ---------------------------------------------------------------------------
# Built-in shaders (the ports of src/triangle.slang and src/cube.slang,
# plus the richer stages for BASELINE configs 3-5)
# ---------------------------------------------------------------------------

REFERENCE_COLOR = (0.1, 0.2, 0.3, 1.0)  # constant ps color, triangle.slang:17


def _passthrough_vs(attrs, uniforms):
    """NDC passthrough (triangle.slang:4-13: vertices already in NDC)."""
    p = attrs["position"]
    if p.shape[-1] == 3:
        p = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), jnp.float32)], -1)
    elif p.shape[-1] == 2:
        pad = jnp.concatenate(
            [jnp.zeros((*p.shape[:-1], 1), jnp.float32), jnp.ones((*p.shape[:-1], 1), jnp.float32)],
            -1,
        )
        p = jnp.concatenate([p, pad], -1)
    return p, {}


def _const_color_fs(frag, uniforms):
    color = uniforms.get("color", REFERENCE_COLOR) if isinstance(uniforms, dict) else REFERENCE_COLOR
    h, w = frag["tri_id"].shape
    return jnp.broadcast_to(jnp.asarray(color, jnp.float32), (h, w, 4))


register(Shader("flat_ndc", _passthrough_vs, _const_color_fs))
"""The triangle.slang program: NDC positions, constant color."""


def _mvp_vs(attrs, uniforms):
    return mvp_transform(attrs, uniforms), {}


register(Shader("flat_mvp", _mvp_vs, _const_color_fs))
"""The cube.slang program: MVP transform, constant color."""


def _color_vs(attrs, uniforms):
    clip = mvp_transform(attrs, uniforms)
    return clip, {"color": attrs["color"]}


def _vertex_color_fs(frag, uniforms):
    rgb = frag["color"]
    a = jnp.ones((*rgb.shape[:2], 1), jnp.float32)
    return jnp.concatenate([rgb, a], -1)


register(Shader("vertex_color", _color_vs, _vertex_color_fs, attributes=("color",)))
"""Per-vertex color with smooth interpolation (BASELINE config 2)."""


def _ndc_color_vs(attrs, uniforms):
    clip, _ = _passthrough_vs(attrs, uniforms)
    return clip, {"color": attrs["color"]}


register(Shader("ndc_color", _ndc_color_vs, _vertex_color_fs, attributes=("color",)))


def _textured_fullscreen_vs(attrs, uniforms):
    clip, _ = _passthrough_vs(attrs, uniforms)
    # Per-frame UV scroll keeps benchmark frames distinct (elision-proof)
    # and exercises the sampler across the whole mip chain footprint.
    uv = attrs["uv"] + uniforms.get("uv_offset", jnp.zeros((2,), jnp.float32))
    return clip, {"uv": uv}


def _textured_fullscreen_fs(frag, uniforms, separable: bool = True):
    """Full-screen texture fetch: one (bilinear or trilinear) tap per
    pixel plus a scalar tint multiply — the pure sampler-floor workload.
    (The tint keeps frame checksums distinct under UV scrolling: a
    periodic texture's full-screen SUM is shift-invariant, which would
    defeat the bench's elision-proof distinctness check.)

    This shader's companion geometry (geometry.fullscreen_quad_data) maps
    UV axis-aligned to the screen — u varies only with pixel x, v only
    with pixel y — so by default it samples via the separable MXU
    resampler (ops/texture.py sample_separable: one-hot matmuls instead
    of the flat gather, ~10x on v5e), with the LOD computed once from the
    constant UV derivative.  The "textured_fullscreen_gather" variant
    keeps the per-pixel gather path (the general-geometry sampler) for
    A/B measurement and reference.
    """
    tex = uniforms["texture"]
    uv = frag["uv"]
    # Separable fast path only on full-grid evaluation (compacted shading
    # hands 8-row tile fragments where the small one-hots don't pay).
    sep_ok = (
        separable
        and hasattr(tex, "meta")
        and uv.ndim == 3
        and uv.shape[0] >= 64
        and uv.shape[1] >= 64
    )
    if sep_ok:
        u_row = uv[0, :, 0]
        v_col = uv[:, 0, 1]
        lod = None
        if len(tex.meta[2]) > 1:
            th, tw = tex.meta[2][0]
            rho = jnp.maximum(
                jnp.abs(u_row[1] - u_row[0]) * jnp.float32(tw),
                jnp.abs(v_col[1] - v_col[0]) * jnp.float32(th),
            )
            lod = jnp.log2(jnp.maximum(rho, jnp.float32(1e-12)))
        albedo = tex_ops.sample_separable(tex, u_row, v_col, lod)
    elif hasattr(tex, "meta") and len(tex.meta[2]) > 1:
        th, tw = tex.meta[2][0]
        albedo = tex_ops.sample_texture(tex, uv, tex_ops.lod_from_uv(uv, th, tw))
    else:
        albedo = tex_ops.sample_texture(tex, uv)
    rgb = albedo[..., :3] * jnp.float32(uniforms.get("tint", 1.0))
    a = jnp.ones((*rgb.shape[:2], 1), jnp.float32)
    return jnp.concatenate([rgb, a], -1)


register(
    Shader(
        "textured_fullscreen",
        _textured_fullscreen_vs,
        _textured_fullscreen_fs,
        attributes=("uv",),
    )
)


def _textured_fullscreen_gather_fs(frag, uniforms):
    return _textured_fullscreen_fs(frag, uniforms, separable=False)


register(
    Shader(
        "textured_fullscreen_gather",
        _textured_fullscreen_vs,
        _textured_fullscreen_gather_fs,
        attributes=("uv",),
    )
)


def _textured_lit_vs(attrs, uniforms):
    clip = mvp_transform(attrs, uniforms)
    model = uniforms["model"]
    n_mat = math3d.normal_matrix(model)
    normal_ws = attrs["normal"] @ n_mat.T
    return clip, {"uv": attrs["uv"], "normal": normal_ws}


def _textured_lit_fs(frag, uniforms):
    """Sampled albedo * Lambert diffuse (BASELINE config 3).

    Mipmapped textures sample trilinearly with the LOD derived from
    screen-space UV derivatives; otherwise a single bilinear tap."""
    tex = uniforms["texture"]
    uv = frag["uv"]
    if hasattr(tex, "meta") and len(tex.meta[2]) > 1:
        th, tw = tex.meta[2][0]
        albedo = tex_ops.sample_texture(tex, uv, tex_ops.lod_from_uv(uv, th, tw))
    else:
        albedo = tex_ops.sample_texture(tex, uv)
    n = frag["normal"]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    light_dir = uniforms.get("light_dir", jnp.asarray([0.0, 0.0, -1.0], jnp.float32))
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    ndotl = jnp.maximum(jnp.sum(n * (-light_dir), axis=-1, keepdims=True), 0.0)
    ambient = jnp.float32(uniforms.get("ambient", 0.15))
    rgb = albedo[..., :3] * (ambient + (1.0 - ambient) * ndotl)
    a = jnp.ones((*rgb.shape[:2], 1), jnp.float32)
    return jnp.concatenate([rgb, a], -1)


register(
    Shader("textured_lit", _textured_lit_vs, _textured_lit_fs, attributes=("uv", "normal"))
)


def _blinn_phong_vs(attrs, uniforms):
    clip = mvp_transform(attrs, uniforms)
    model = uniforms["model"]
    pos_ws = math3d.transform_points(model, attrs["position"])[..., :3]
    n_mat = math3d.normal_matrix(model)
    normal_ws = attrs["normal"] @ n_mat.T
    out = {"normal": normal_ws, "pos_ws": pos_ws}
    if "color" in attrs:
        out["color"] = attrs["color"]
    return clip, out


def _blinn_phong_fs(frag, uniforms):
    """Blinn-Phong: ambient + diffuse + specular (BASELINE config 5)."""
    n = frag["normal"]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    pos = frag["pos_ws"]
    light_pos = jnp.asarray(uniforms.get("light_pos", [2.0, -2.0, -2.0]), jnp.float32)
    eye_pos = jnp.asarray(uniforms.get("eye_pos", [0.0, 0.0, -3.0]), jnp.float32)
    base = frag.get("color")
    if base is None:
        base = jnp.broadcast_to(
            jnp.asarray(uniforms.get("base_color", [0.7, 0.7, 0.75]), jnp.float32),
            (*n.shape[:2], 3),
        )
    l = light_pos - pos
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
    v = eye_pos - pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    ndotl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
    ndoth = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    shininess = jnp.float32(uniforms.get("shininess", 32.0))
    ambient = jnp.float32(uniforms.get("ambient", 0.1))
    spec = ndoth**shininess
    rgb = base * (ambient + ndotl) + jnp.float32(0.3) * spec
    a = jnp.ones((*rgb.shape[:2], 1), jnp.float32)
    return jnp.concatenate([jnp.clip(rgb, 0.0, 1.0), a], -1)


register(Shader("blinn_phong", _blinn_phong_vs, _blinn_phong_fs, attributes=("normal",)))


def _instanced_color_vs(attrs, uniforms):
    """Per-instance transform (BASELINE config 4) then shared view/proj."""
    from .ops.vertex import apply_instance_transform

    world = apply_instance_transform(attrs)
    vp = uniforms["proj"] @ uniforms["view"]
    clip = world @ vp.T
    out = {}
    if "color" in attrs:
        out["color"] = attrs["color"]
    if "instance_color" in attrs:
        out["color"] = attrs["instance_color"]
    return clip, out


register(
    Shader(
        "instanced_color",
        _instanced_color_vs,
        _vertex_color_fs,
        attributes=("color",),
    )
)
