"""ScanNet loader against a tiny on-disk fixture (incl. inf-pose skip and
3D association relabelling)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vmap_tpu.config import Config
from vmap_tpu.data.scannet import ScanNetDataset


W_IMG, H_IMG = 96, 72  # depth resolution (H, W) = (72, 96)


def _write_scannet_fixture(root, n=3, bad_pose_at=None):
    for d in ("color", "depth", "instance-filt", "label-filt", "pose",
              "intrinsic"):
        os.makedirs(f"{root}/{d}", exist_ok=True)
    K = np.array([[80.0, 0, 47.5, 0], [0, 80.0, 35.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(f"{root}/intrinsic/intrinsic_depth.txt", K)
    for i in range(n):
        color = np.full((H_IMG * 2, W_IMG * 2, 3), 120, np.uint8)  # hi-res
        color[30:90, 30:130] = [180, 60, 60]
        depth = np.full((H_IMG, W_IMG), 2000, np.uint16)
        inst = np.zeros((H_IMG, W_IMG), np.uint16)
        inst[15:60, 15:80] = 4          # one big object (raw id 4 -> +1 = 5)
        depth[15:60, 15:80] = 1500
        sem = np.full((H_IMG, W_IMG), 1, np.uint16)   # wall (background)
        sem[15:60, 15:80] = 10          # some object class
        cv2.imwrite(f"{root}/color/{i}.jpg", color)
        cv2.imwrite(f"{root}/depth/{i}.png", depth)
        cv2.imwrite(f"{root}/instance-filt/{i}.png", inst)
        cv2.imwrite(f"{root}/label-filt/{i}.png", sem)
        T = np.eye(4)
        T[0, 3] = 0.05 * i
        if bad_pose_at == i:
            T[1, 3] = np.inf
        np.savetxt(f"{root}/pose/{i}.txt", T)


def _cfg(root, **kw):
    base = dict(dataset_format="ScanNet", dataset_dir=root,
                depth_scale=1e-3, max_depth=6.0, mw=4, mh=4,
                fx=80.0, fy=80.0, cx=47.5 - 4, cy=35.5 - 4)
    base.update(kw)
    return Config(**base)


def test_scannet_loads_and_associates(tmp_path):
    root = str(tmp_path / "scene0000_00")
    _write_scannet_fixture(root)
    ds = ScanNetDataset(_cfg(root))
    assert len(ds) == 3
    s = ds[0]
    w, h = W_IMG - 8, H_IMG - 8            # 4 px edge crop each side
    assert s["image"].shape == (w, h, 3)   # (W, H) layout
    assert s["depth"].shape == (w, h)
    ids = set(np.unique(s["obj"]).tolist()) - {0, -1}
    assert ids == {5}                      # raw 4 shifted +1
    assert 5 in s["bbox_dict"] and 0 in s["bbox_dict"]
    # second frame merges into the same 3D track, keeps the id
    s2 = ds[1]
    ids2 = set(np.unique(s2["obj"]).tolist()) - {0, -1}
    assert ids2 == {5}
    assert ds.assoc.tracks[5].merge_cnt >= 1


def test_scannet_depth_units(tmp_path):
    root = str(tmp_path / "scene")
    _write_scannet_fixture(root, n=1)
    ds = ScanNetDataset(_cfg(root))
    s = ds[0]
    assert abs(s["depth"].max() - 2.0) < 1e-4   # mm -> m


def test_scannet_inf_pose_returns_none(tmp_path):
    """Invalid-pose frames yield None (train.py skips None samples): O(1)
    stack for arbitrarily long invalid runs, no duplicate frame_ids."""
    root = str(tmp_path / "scene_bad")
    _write_scannet_fixture(root, n=3, bad_pose_at=1)
    ds = ScanNetDataset(_cfg(root))
    assert ds[1] is None
    s = ds[2]                                    # next valid frame intact
    assert s["frame_id"] == 2
    np.testing.assert_allclose(s["T"][0, 3], 0.10, atol=1e-6)


def test_scannet_imap_mode(tmp_path):
    root = str(tmp_path / "scene_imap")
    _write_scannet_fixture(root, n=1)
    ds = ScanNetDataset(_cfg(root, imap_mode=True))
    s = ds[0]
    assert set(np.unique(s["obj"]).tolist()) == {0}
    assert list(s["bbox_dict"]) == [0]
