"""Shader modules loaded from source files at runtime.

The reference's Slang toolchain compiles shader SOURCE on disk at runtime
(``loadModule("cube")`` against a search path,
/root/reference/src/main.cpp:1607-1647) and reports compile diagnostics
through SLANG_CHECK (main.cpp:586-606).  shader.load_file/load_module is
that tier for the Python ABI: these tests load a module from a temp file,
render with it end-to-end, and prove the error paths speak ShaderError
with the registered-module list.
"""

import numpy as np
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu import shader
from based_renderer_tpu.models import geometry
from based_renderer_tpu.utils.errors import ShaderError


MODULE_SRC = """
# A shader module file: plain functions named vertex/fragment, using the
# vocabulary load_file puts in scope (jnp, mvp_transform, ...).
ATTRIBUTES = ("color",)

def vertex(attrs, uniforms):
    return mvp_transform(attrs, uniforms), {"color": attrs["color"]}

def fragment(frag, uniforms):
    rgb = frag["color"] * jnp.float32(uniforms.get("gain", 1.0))
    a = jnp.ones((*rgb.shape[:2], 1), jnp.float32)
    return jnp.concatenate([rgb, a], -1)
"""

SHADER_VAR_SRC = """
def _vs(attrs, uniforms):
    p = attrs["position"]
    p = jnp.concatenate([p, jnp.ones((*p.shape[:-1], 1), jnp.float32)], -1)
    return p, {}

def _fs(frag, uniforms):
    h, w = frag["tri_id"].shape
    return jnp.broadcast_to(jnp.asarray((0.25, 0.5, 0.75, 1.0), jnp.float32), (h, w, 4))

SHADER = Shader("disk_flat", _vs, _fs)
"""


def _unregister(name):
    shader._REGISTRY.pop(name, None)


def test_load_file_and_render(tmp_path):
    path = tmp_path / "disk_color.py"
    path.write_text(MODULE_SRC)
    try:
        shd = shader.load_file(path)
        assert shd.name == "disk_color"
        assert shd.attributes == ("color",)
        assert shader.get("disk_color") is shd

        # Render the cube demo but through the disk-loaded shader: it is
        # the vertex_color program, so the image must match bit-for-bit.
        import dataclasses

        from based_renderer_tpu.models import demos

        r = brt.Renderer(brt.RendererConfig(width=128, height=96))
        pipe, mesh, uniforms, _ = demos.cube_demo(r)
        ref = r.render_frame(pipe, mesh, uniforms(0.3))
        got = r.render_frame(
            dataclasses.replace(pipe, shader="disk_color"), mesh, uniforms(0.3)
        )
        np.testing.assert_array_equal(ref.color_u8(), got.color_u8())
        assert (np.asarray(got.tri_id) >= 0).any()
    finally:
        _unregister("disk_color")


def test_load_file_shader_variable_and_rename(tmp_path):
    path = tmp_path / "mymod.py"
    path.write_text(SHADER_VAR_SRC)
    try:
        shd = shader.load_file(path)
        assert shd.name == "disk_flat"  # SHADER's own name wins namelessly
        shd2 = shader.load_file(path, name="disk_flat2")
        assert shd2.name == "disk_flat2"
        # Re-exec'd module: same entry-point code, fresh function objects.
        assert shader.get("disk_flat2").fragment.__code__.co_code == shd.fragment.__code__.co_code
    finally:
        _unregister("disk_flat")
        _unregister("disk_flat2")


def test_load_module_search_path(tmp_path):
    (tmp_path / "trimod.py").write_text(SHADER_VAR_SRC)
    try:
        shd = shader.load_module("trimod", search_paths=[str(tmp_path)])
        assert shader.get("trimod") is shd
        # Registered names short-circuit the filesystem.
        assert shader.load_module("trimod", search_paths=["/nonexistent"]) is shd
    finally:
        _unregister("trimod")
    with pytest.raises(ShaderError, match="search path"):
        shader.load_module("no_such_module", search_paths=[str(tmp_path)])


def test_load_file_syntax_error(tmp_path):
    path = tmp_path / "broken.py"
    path.write_text("def vertex(attrs, uniforms:\n    pass\n")
    with pytest.raises(ShaderError, match="SyntaxError"):
        shader.load_file(path)


def test_load_file_runtime_error(tmp_path):
    path = tmp_path / "raises.py"
    path.write_text("raise RuntimeError('boom')\n")
    with pytest.raises(ShaderError, match="boom"):
        shader.load_file(path)


def test_load_file_no_entry_points(tmp_path):
    path = tmp_path / "empty.py"
    path.write_text("x = 1\n")
    with pytest.raises(ShaderError, match="no entry points"):
        shader.load_file(path)
    # Diagnostics carry the registered-module list (the SLANG_CHECK analog).
    with pytest.raises(ShaderError, match="flat_ndc"):
        shader.load_file(path)


def test_load_file_missing_file():
    with pytest.raises(ShaderError, match="cannot read"):
        shader.load_file("/nonexistent/shader_module.py")


def test_entry_points_win_over_imported_shader(tmp_path):
    # A module may import/inspect an existing Shader while defining its
    # own vertex/fragment — the explicit entry points must win, not the
    # stray imported value.
    path = tmp_path / "derived.py"
    path.write_text(
        "from based_renderer_tpu import shader as _s\n"
        "BASE = _s.get('vertex_color')  # inspected, not the entry point\n"
        "def vertex(attrs, uniforms):\n"
        "    return BASE.vertex(attrs, uniforms)\n"
        "def fragment(frag, uniforms):\n"
        "    rgba = BASE.fragment(frag, uniforms)\n"
        "    return rgba * jnp.float32(0.5)\n"
    )
    try:
        shd = shader.load_file(path)
        assert shd.name == "derived"
        assert shd.vertex is not shader.get("vertex_color").vertex
    finally:
        _unregister("derived")


def test_aliased_shader_counts_once(tmp_path):
    path = tmp_path / "aliased.py"
    path.write_text(
        SHADER_VAR_SRC.replace("SHADER = ", "A = ")
        + "B = A\n"  # two names, ONE shader — must still load
    )
    try:
        shd = shader.load_file(path)
        assert shd.name == "disk_flat"
    finally:
        _unregister("disk_flat")
