"""HTML snapshot viewer artifact."""

import json
import os

import numpy as np

from vmap_tpu.geometry.primitives import box
from vmap_tpu.utils.viewer import write_snapshot


def test_write_snapshot_and_index(tmp_path):
    m = box([-1, -1, -1], [1, 1, 1])
    m.vertex_colors = np.full((len(m.vertices), 3), 128, np.uint8)
    d = str(tmp_path)
    p = write_snapshot(d, {1: m, 2: None}, frame_id=10)
    assert os.path.exists(p) and p.endswith("viewer.html")
    js = open(os.path.join(d, "meshes_frame_10.js")).read()
    assert js.startswith("VMAP_REGISTER(10,")
    payload = json.loads(js[js.index("[") : js.rindex("]") + 1])
    assert payload[0]["id"] == 1
    assert len(payload[0]["v"]) == 3 * len(m.vertices)
    assert len(payload[0]["f"]) == 3 * len(m.faces)

    # second snapshot extends the frame index
    write_snapshot(d, {1: m}, frame_id=20)
    idx = open(os.path.join(d, "frames_index.js")).read()
    assert json.loads(idx[idx.index("[") : idx.rindex("]") + 1]) == [10, 20]

    html = open(p).read()
    assert "webgl" in html and "VMAP_FRAMES" in html
