"""Golden-image regression tests for the demo set.

Coverage/depth buffers are bit-stable by spec, so their hashes are exact
goldens; color is hashed too (deterministic on the pinned CPU backend).
Regenerate after intentional changes with:

    BRT_UPDATE_GOLDENS=1 python -m pytest tests/test_golden.py -q
"""

import hashlib
import json
import os

import numpy as np
import pytest

import based_renderer_tpu as brt
from based_renderer_tpu.models import demos

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_hashes.json")
UPDATE = bool(os.environ.get("BRT_UPDATE_GOLDENS"))


def _hash(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def _load():
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            return json.load(f)
    return {}


def _check(key, frame):
    goldens = _load()
    got = {
        "tri_id": _hash(np.asarray(frame.tri_id)),
        "depth_q": _hash(np.asarray(frame.depth_q)),
        "color": _hash(frame.color_u8()),
    }
    if UPDATE:
        goldens[key] = got
        with open(GOLDEN_PATH, "w") as f:
            json.dump(goldens, f, indent=2, sort_keys=True)
    elif key not in goldens:
        # A missing key must FAIL, never silently record the current
        # output as golden (a bug would become the golden).  Record
        # intentionally with BRT_UPDATE_GOLDENS=1.
        pytest.fail(
            f"no golden recorded for {key!r}; if this case is new or "
            f"golden_hashes.json was lost, regenerate deliberately with "
            f"BRT_UPDATE_GOLDENS=1 python -m pytest tests/test_golden.py"
        )
    assert goldens[key] == got, f"golden mismatch for {key}: {goldens[key]} vs {got}"


CASES = [
    ("triangle", 0.0, {}),
    ("cube", 0.5, {}),
    ("textured_cube", 0.7, {}),
    ("textured_fullscreen", 0.4, {}),
    ("instanced", 0.3, {"count": 32}),
    ("big_mesh", 0.2, {"triangles": 2000}),
]


@pytest.mark.parametrize("name,t,kw", CASES, ids=[c[0] for c in CASES])
def test_demo_golden(name, t, kw):
    r = brt.Renderer(brt.RendererConfig(width=128, height=96))
    pipe, mesh, uniforms, inst = demos.DEMOS[name](r, **kw)
    f = r.render_frame(pipe, mesh, uniforms(t), instances=inst)
    _check(f"{name}_128x96", f)


def test_msaa_golden():
    r = brt.Renderer(brt.RendererConfig(width=128, height=96, msaa=4))
    pipe, mesh, uniforms, _ = demos.DEMOS["cube"](r)
    f = r.render_frame(pipe, mesh, uniforms(0.5))
    _check("cube_128x96_msaa4", f)
