import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from vmap_tpu.data.synthetic import SyntheticScene
from vmap_tpu.geometry.mesh import Mesh
from vmap_tpu.utils.vis import label_to_rgb, render_mesh_snapshot, save_frame_debug


def _tri():
    return Mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.2]]),
                np.array([[0, 1, 2]]),
                vertex_colors=np.array([[255, 0, 0]] * 3, np.uint8))


def test_render_mesh_snapshot(tmp_path):
    p = str(tmp_path / "snap.png")
    out = render_mesh_snapshot([_tri()], p)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_render_empty_mesh_ok(tmp_path):
    p = str(tmp_path / "empty.png")
    render_mesh_snapshot([None, Mesh(np.zeros((0, 3)), np.zeros((0, 3), int))], p)
    assert os.path.exists(p)


def test_label_to_rgb():
    inst = np.array([[0, 1], [-1, 1]])
    rgb = label_to_rgb(inst)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0], [30, 30, 30])       # background
    np.testing.assert_array_equal(rgb[1, 0], [200, 40, 40])      # unsure
    np.testing.assert_array_equal(rgb[0, 1], rgb[1, 1])          # same id


def test_save_frame_debug(tmp_path):
    scene = SyntheticScene(width=64, height=48)
    s = scene.frame_sample(0, n_frames=8)
    p = save_frame_debug(s, str(tmp_path / "frame.png"))
    assert os.path.getsize(p) > 5000
