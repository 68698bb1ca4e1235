"""The demo set: the reference's two demos plus the BASELINE configs.

Each demo returns (pipeline, mesh, uniforms_fn, instances) where
``uniforms_fn(t)`` produces the per-frame uniforms at animation time ``t``
— the analog of the reference's per-frame ``rotate_cube`` update
(/root/reference/src/main.cpp:788-809).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import math3d
from ..pipeline import DepthState, Pipeline
from ..renderer import Renderer
from . import geometry


def triangle_demo(r: Renderer):
    """BASELINE config 1 / triangle.slang: flat NDC triangle, no depth."""
    data = geometry.triangle_mesh_data()
    mesh = r.upload_mesh(data["positions"])
    pipe = Pipeline(shader="flat_ndc", depth=DepthState(test=False, write=False))
    return pipe, mesh, lambda t: {}, None


def cube_demo(r: Renderer, vertex_colors: bool = True):
    """BASELINE config 2 / cube.slang: spinning cube, depth-tested.

    Uniforms mirror the reference: model spins about -Y (rotate_cube,
    main.cpp:792), view = translate z -3 (main.cpp:793, 1523), proj =
    perspective 45 deg (main.cpp:1524 — the initial write; the 180-deg
    per-frame fov at main.cpp:794 is a noted WIP quirk we do not copy).
    """
    data = geometry.cube_mesh_data()
    kwargs = {"color": data["color"]} if vertex_colors else {}
    mesh = r.upload_mesh(data["positions"], **kwargs)
    shader = "vertex_color" if vertex_colors else "flat_mvp"
    pipe = Pipeline(shader=shader, depth=DepthState(test=True, write=True, compare="less"))
    aspect = r.config.width / r.config.height

    def uniforms(t):
        model = math3d.rotate(jnp.float32(t), (0.0, -1.0, 0.0))
        model = math3d.rotate(np.float32(np.radians(-55.0)), (1.0, 0.0, 0.0), model)
        view = math3d.translate((0.0, 0.0, 3.0))  # camera at z=-3 looking +z
        proj = math3d.perspective(np.radians(45.0), aspect, 0.1, 10.0)
        return {"model": model, "view": view, "proj": proj}

    return pipe, mesh, uniforms, None


def textured_cube_demo(r: Renderer):
    """BASELINE config 3: textured + Lambert-lit cube, back-face culled."""
    data = geometry.cube_mesh_data()
    mesh = r.upload_mesh(data["positions"], uv=data["uv"], normal=data["normal"])
    tex = r.upload_texture(geometry.checkerboard_texture(), mipmaps=True)
    pipe = Pipeline(
        shader="textured_lit",
        depth=DepthState(test=True, write=True, compare="less"),
        cull_mode="back",
        front_face="ccw",
        # Texture taps cost per shaded pixel (flat-gather floor), so pay
        # per covered tile: the compacted stream is budget-sized, so a
        # ladder of budgets keeps the tap gather tight as the cube's
        # coverage breathes with rotation (~20-30% of tiles).
        shade_compact=(0.125, 0.25, 0.375, 0.5),
    )
    aspect = r.config.width / r.config.height

    def uniforms(t):
        model = math3d.rotate(jnp.float32(t), (0.0, -1.0, 0.0))
        model = math3d.rotate(np.float32(np.radians(-55.0)), (1.0, 0.0, 0.0), model)
        view = math3d.translate((0.0, 0.0, 3.0))
        proj = math3d.perspective(np.radians(45.0), aspect, 0.1, 10.0)
        return {
            "model": model,
            "view": view,
            "proj": proj,
            "texture": tex,
            "light_dir": jnp.asarray([0.3, 0.4, 1.0], jnp.float32),
            "ambient": 0.15,
        }

    return pipe, mesh, uniforms, None


def textured_fullscreen_demo(r: Renderer):
    """Full-screen textured quad (sky/background tier of BASELINE
    config 3): EVERY pixel takes a texture tap, so compacted shading has
    nothing to skip — this is the sampler-floor workload the covered-tile
    compaction of textured_cube deliberately avoids.  Frames scroll the
    UVs so benchmark sequences stay elision-proof."""
    data = geometry.fullscreen_quad_data()
    mesh = r.upload_mesh(data["positions"], uv=data["uv"])
    tex = r.upload_texture(geometry.checkerboard_texture(), mipmaps=True)
    pipe = Pipeline(
        shader="textured_fullscreen",
        depth=DepthState(test=False, write=False),
    )

    def uniforms(t):
        return {
            "texture": tex,
            "uv_offset": jnp.stack(
                [jnp.float32(t) * 0.11, jnp.float32(t) * 0.07]
            ),
            # See _textured_fullscreen_fs: keeps per-frame checksums
            # distinct (a scrolled periodic texture sums shift-invariant).
            "tint": jnp.float32(0.9) + jnp.float32(0.1) * jnp.sin(jnp.float32(t)),
        }

    return pipe, mesh, uniforms, None


def instanced_demo(r: Renderer, count: int = 10_000):
    """BASELINE config 4: a field of instanced cubes."""
    data = geometry.cube_mesh_data()
    mesh = r.upload_mesh(data["positions"])
    transforms, colors = geometry.instanced_grid_transforms(count)
    instances = {
        "transform": jnp.asarray(transforms.reshape(count, 16)),
        "instance_color": jnp.asarray(colors),
    }
    pipe = Pipeline(
        shader="instanced_color",
        # depth clip=False: the cube field never leaves [0,1] depth, so
        # the per-(row,sample) clip-window test is pure overhead in the
        # MSAA sublane kernel (part of the measured combo win below).
        depth=DepthState(test=True, write=True, compare="less", clip=False),
        cull_mode="back",
        front_face="ccw",
        # The cube field stays inside the view volume: skip the clipper
        # (which would double the triangle stream), and keep a tight pair
        # budget so binner gather traffic tracks real work.
        near_clip=False,
        # Round-5 stage attribution (tools/probe_stages.py instanced:
        # 13.8 ms = 6.5 bin + 6.4 raster + 0.8 vertex) showed the binner
        # scales with BUDGETED slots, so the budgets are tightened to the
        # measured live rate (~0.5-0.55 pairs/tri over the orbit for the
        # backface-culled field): fresh-process v5e arms read 10.95
        # ms/frame at pairs 1.2 / slots 0.6 vs 11.24 at 1.2/0.75 and
        # 13.46 at the old 2.0/1.2.  Full-orbit rates
        # (tools/count_pairs.py, 400 frames): worst 0.5357 pairs/tri
        # (slots 0.6 = 12% headroom), worst extras 0.1460 (pairs 1.2 =
        # 4.7%); pairs 1.1 OVERFLOWS — budget breach is surfaced, never
        # silent.  Taller tiles lose (tile16 13.6, tile32 15.4).
        raster_pairs_factor=1.2,
        # Record-dense scene: the sublane-parallel kernel (no per-record
        # scalar reads) on short tiles, group32 + pallas assembly (the
        # round-4 per-arm winners, tools/probe_inst.py).
        raster_sublane=True,
        raster_group=32,
        raster_assemble="pallas",
        raster_slots_factor=0.6,
        raster_tile=(128, 8),
        # Per-instance frustum culling (Pipeline.instance_cull) is a net
        # LOSS here: the demo orbit keeps ~81-85% of instances visible,
        # and the ~15% stream reduction buys less than the per-frame
        # hull test + table compaction + unhoistable expansion cost
        # (measured on v5e: cull=0.85 14.84 ms vs no-cull 13.71,
        # tools/probe_inst.py).  Enable it for scenes that keep a large
        # off-screen fraction.
    )
    aspect = r.config.width / r.config.height
    extent = float(np.abs(transforms[:, :3, 3]).max()) + 2.0

    def uniforms(t):
        # jnp trig so the function stays traceable: every demo's uniforms
        # fn can run device-side via render_sequence(uniforms_fn=...).
        a = jnp.float32(t) * jnp.float32(0.3)
        eye = jnp.stack(
            [jnp.cos(a) * extent, jnp.float32(-extent * 0.6), jnp.sin(a) * extent]
        ).astype(jnp.float32)
        view = math3d.look_at(eye, (0.0, 0.0, 0.0), (0.0, -1.0, 0.0))
        proj = math3d.perspective(np.radians(60.0), aspect, 0.1, extent * 4.0)
        return {"view": view, "proj": proj}

    return pipe, mesh, uniforms, instances


def big_mesh_demo(r: Renderer, triangles: int = 1_000_000, generated: bool = False):
    """BASELINE config 5: ~1M-triangle mesh with Blinn-Phong shading.

    ``generated=True`` swaps in the on-device generator mesh
    (scene.generated_mesh): ~20x smaller sequence executables (the
    captured mesh bakes ~505 MB raw / ~90 MB compressed constants whose
    remote serialize/load is minutes-slow) at a measured +13-15 ms/frame
    at 1M tris 1080p — every runtime-produced loop-invariant pays a
    per-step in-scan layout conversion that XLA folds away only for
    captured CONSTANTS (fresh v5e arms, tools/probe_capture.py: captured
    53.6-56.3 vs generated/param/carry/AUTO-layout 68.1-69.1).  The
    BASELINE config keeps the captured default: the 60 ms done-bar
    beats tooling wall time."""
    if generated:
        mesh = r.generated_mesh(geometry.procedural_mesh_device(triangles))
        data = None
    else:
        data = geometry.procedural_mesh_data(triangles)
        mesh = r.upload_mesh(
            data["positions"], indices=data["indices"], normal=data["normal"]
        )
    pipe = Pipeline(
        shader="blinn_phong",
        depth=DepthState(test=True, write=True, compare="less"),
        cull_mode="back",
        front_face="ccw",
        # The procedural mesh is fully in front of the camera and its
        # triangles are tiny: skip the clipper.  Back-face culling kills
        # ~48% of triangles and live pairs measure ~0.52-0.55/tri over the
        # spin (tools/probe_earlyz.py), so budget a small extras stream
        # (multi-tile triangles are rare) and slice the sorted stream at
        # 0.6 slots/tri (round-5 arms, v5e fresh-process: 51.7 ms/frame
        # vs 54.5 at 0.65 and ~55.8 at the old 0.7 — the binner is 64%
        # of the frame and its gather + assembly scale with slots; 0.6
        # keeps 6.8% headroom over the worst full-orbit rate 0.5616,
        # and a breach surfaces as overflow, never silently).  Tighter
        # PAIRS budgets fail: 1.05 overflows the extras stream.
        # At 4K the same triangles span more tiles
        # (tools/count_pairs.py, 400-frame full-orbit sweep: worst
        # 0.8483 pairs/tri at 4K MSAA-4x vs 0.5616 at 1080p), so widen
        # both budgets with the framebuffer: 4K slices at 0.9 slots/tri
        # (6.1% headroom; v5e arm: 135.3 ms vs 138.7 at 1.0).
        # Overflow is surfaced if a view ever exceeds them.  The tight
        # factors are measured for ~1M tiny triangles; at toy triangle
        # counts (tests, small demos) each triangle spans more tiles, so
        # fall back to the generous defaults there.
        near_clip=False,
        # The wide tier applies for 4K AND for coverage-MSAA at any
        # size: MSAA pads every bbox (fp.MSAA4_BBOX_PAD_FP), which
        # strictly increases tile-crossing pairs, so the tight non-MSAA
        # 1080p budgets must not key on width alone (full-orbit
        # count_pairs: 1080p MSAA-4x worst 0.6443 pairs/tri and extras
        # 0.1843 — BOTH above the non-MSAA 0.6/1.15 budgets).
        raster_pairs_factor=(
            (1.15 if r.config.width <= 2560 and r.config.msaa == 1 else 1.4)
            if triangles >= 100_000
            else 4.0
        ),
        raster_slots_factor=(
            (0.6 if r.config.width <= 2560 and r.config.msaa == 1 else 0.9)
            if triangles >= 100_000
            else None
        ),
        # 1M-record scenes are kernel- and binner-bound: sublane-parallel
        # raster kernel on short tiles, 64-record groups (measured on v5e:
        # group 8 -> 32 cut the 1M-tri 1080p frame ~10 ms by amortizing
        # per-group coefficient loads/loop control over 4x records;
        # 32 -> 64 buys another ~2 ms — 53.6 vs 55.7 ms/frame,
        # tools/probe_big.py fresh-process arms).
        raster_sublane=True,
        raster_group=64,
        raster_tile=(128, 8),
        # Fused Pallas record assembly: one streaming transpose+re-anchor
        # pass instead of XLA's materialized relayout (measured on v5e:
        # 55.96 -> 53.19 ms/frame at 1M tris, tools/quick_ab.py).
        raster_assemble="pallas",
    )
    aspect = r.config.width / r.config.height

    def uniforms(t):
        model = math3d.rotate(jnp.float32(t * 0.5), (0.0, -1.0, 0.0))
        view = math3d.translate((0.0, 0.0, 2.2))
        proj = math3d.perspective(np.radians(50.0), aspect, 0.1, 10.0)
        return {
            "model": model,
            "view": view,
            "proj": proj,
            "light_pos": jnp.asarray([3.0, -3.0, -3.0], jnp.float32),
            "eye_pos": jnp.asarray([0.0, 0.0, -2.2], jnp.float32),
            "base_color": jnp.asarray([0.55, 0.65, 0.8], jnp.float32),
        }

    return pipe, mesh, uniforms, None


DEMOS = {
    "triangle": triangle_demo,
    "cube": cube_demo,
    "textured_cube": textured_cube_demo,
    "textured_fullscreen": textured_fullscreen_demo,
    "instanced": instanced_demo,
    "big_mesh": big_mesh_demo,
}
