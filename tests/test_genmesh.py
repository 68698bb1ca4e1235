"""Generated meshes (scene.generated_mesh): vertex data defined by code.

A 1M-triangle mesh captured as sequence-program constants bakes ~144 MB
of vertex data into every executable (~505 MB raw, ~90 MB compressed
persistent-cache entries) whose remote serialization dominates benchmark
and driver wall time; a generated mesh is synthesized IN-PROGRAM, once
per dispatch before the frame scan (renderer.render_sequence_multi), so
the executable carries code instead of constants at unchanged per-frame
cost.  Reference analog: the reference hard-codes geometry in shaders
(/root/reference/src/cube.slang:12-61) — geometry-as-code is the native
form here too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos, geometry
from based_renderer_tpu.scene import generated_mesh


def test_device_generator_matches_numpy_twin():
    d = geometry.procedural_mesh_data(2000)
    flat = d["indices"].reshape(-1)
    a = jax.jit(geometry.procedural_mesh_device(2000))()
    assert a["position"].shape == d["positions"][flat].shape
    np.testing.assert_allclose(
        np.asarray(a["position"]), d["positions"][flat], atol=2e-5
    )
    # Normals accumulate many face contributions; f32 vs f64 drift is
    # larger but still far inside shading tolerance.
    np.testing.assert_allclose(
        np.asarray(a["normal"]), d["normal"][flat], atol=5e-3
    )


def test_generated_mesh_shape_validation():
    with pytest.raises(ValueError, match="multiple-of-3"):
        generated_mesh(lambda: {"position": jnp.zeros((4, 3), jnp.float32)})


def test_sequence_synthesizes_in_program():
    """Sequence checksums through the generator path must match eager
    per-frame renders to float rounding, and the captured constants must
    NOT contain the mesh attributes."""
    r = brt.Renderer(brt.RendererConfig(width=128, height=96, raster_backend="pallas"))
    pipe, mesh, uniforms, _ = demos.big_mesh_demo(r, triangles=2000, generated=True)
    assert mesh.generator is not None

    frame_sums = []
    for i in range(3):
        f = r.render_frame(pipe, mesh, uniforms(0.016 * i))
        frame_sums.append(float(np.asarray(f.color_planar).sum()))
    useq = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[uniforms(0.016 * i) for i in range(3)]
    )
    sums = np.asarray(r.render_sequence(pipe, mesh, useq))
    np.testing.assert_allclose(sums, np.asarray(frame_sums), rtol=1e-4)
    # Distinct frames (the elision-proof bench contract holds for
    # generated meshes too).
    assert len(set(np.round(sums, 1))) == 3
    # THE core property: the mesh attributes must not be closure-captured
    # constants.  The seq program's cache key carries the ids of every
    # captured array leaf (render_sequence_multi const_ids); for a
    # generated mesh that set must be EMPTY — if the pop-attrs plumbing
    # regresses, attr arrays reappear here (and if the in-program
    # substitution regressed instead, the render above would fail).
    seq_keys = [k for k in r._program_cache if k[0] == "seq"]
    assert len(seq_keys) == 1
    assert seq_keys[0][4] == (), (
        "generated-mesh attributes leaked into the captured constants: "
        f"{seq_keys[0][4]}"
    )


def test_uploaded_meshes_unchanged():
    data = geometry.cube_mesh_data()
    r = brt.Renderer(brt.RendererConfig(width=64, height=48))
    mesh = r.upload_mesh(data["positions"], color=data["color"])
    assert mesh.generator is None
