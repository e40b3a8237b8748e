"""Dataset loaders against tiny fixture sequences written to disk."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vmap_tpu.config import Config
from vmap_tpu.data.loader import PrefetchIterator, make_dataset
from vmap_tpu.data.replica import ReplicaDataset


def _write_replica_fixture(root, n=3, w=64, h=48):
    """Tiny Replica-format sequence: a 20x20 object (class 20, inst 7) on a
    wall-class background."""
    os.makedirs(f"{root}/rgb"), os.makedirs(f"{root}/depth")
    os.makedirs(f"{root}/semantic_instance"), os.makedirs(f"{root}/semantic_class")
    poses = []
    for i in range(n):
        rgb = np.full((h, w, 3), 100, np.uint8)
        rgb[10:30, 10:30] = [200, 50, 50]
        depth = np.full((h, w), 2000, np.uint16)   # 2 m
        depth[10:30, 10:30] = 1500
        inst = np.zeros((h, w), np.uint16)
        inst[10:30, 10:30] = 7
        sem = np.full((h, w), 93, np.uint16)       # wall (background class)
        sem[10:30, 10:30] = 20                     # chair-ish
        cv2.imwrite(f"{root}/rgb/rgb_{i}.png", rgb)
        cv2.imwrite(f"{root}/depth/depth_{i}.png", depth)
        cv2.imwrite(f"{root}/semantic_instance/semantic_instance_{i}.png", inst)
        cv2.imwrite(f"{root}/semantic_class/semantic_class_{i}.png", sem)
        T = np.eye(4)
        T[0, 3] = 0.1 * i
        poses.append(T.reshape(-1))
    np.savetxt(f"{root}/traj_w_c.txt", np.stack(poses), delimiter=" ")


@pytest.fixture
def replica_root(tmp_path):
    root = str(tmp_path / "room_0")
    _write_replica_fixture(root)
    return root


def _cfg(root, **kw):
    base = dict(dataset_format="Replica", dataset_dir=root,
                depth_scale=1e-3, max_depth=8.0, W=64, H=48,
                fx=60.0, fy=60.0, cx=31.5, cy=23.5)
    base.update(kw)
    return Config(**base)


def test_replica_loads_frame(replica_root):
    ds = ReplicaDataset(_cfg(replica_root))
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 48, 3)       # (W, H) layout
    assert s["depth"].shape == (64, 48)
    np.testing.assert_allclose(s["depth"][0, 0], 2.0)  # mm -> m
    assert s["obj"].shape == (64, 48)
    # background folded to 0, object instance preserved
    ids = set(np.unique(s["obj"]).tolist())
    assert ids == {0, 7}
    assert 0 in s["bbox_dict"] and 7 in s["bbox_dict"]
    # bbox covers the object (transposed coords: u=w index)
    u0, u1, v0, v1 = s["bbox_dict"][7]
    assert u0 <= 10 and u1 >= 29 and v0 <= 10 and v1 >= 29
    np.testing.assert_allclose(s["T"][0, 3], 0.0)


def test_replica_pose_indexing(replica_root):
    ds = ReplicaDataset(_cfg(replica_root))
    np.testing.assert_allclose(ds[2]["T"][0, 3], 0.2)


def test_replica_imap_mode(replica_root):
    ds = ReplicaDataset(_cfg(replica_root, imap_mode=True))
    s = ds[0]
    assert set(np.unique(s["obj"]).tolist()) == {0}
    assert list(s["bbox_dict"]) == [0]


def test_replica_depth_filter(replica_root):
    ds = ReplicaDataset(_cfg(replica_root, max_depth=1.8))
    s = ds[0]
    # 2 m background got filtered to 0; 1.5 m object stays
    assert s["depth"].max() <= 1.8
    assert (s["depth"] == 0).any()
    assert np.isclose(s["depth"].max(), 1.5, atol=1e-5)


def test_tiny_instances_dropped(tmp_path):
    root = str(tmp_path / "tiny")
    _write_replica_fixture(root, n=1)
    # overwrite instance map with a 4x4 blob (below the 10 px side minimum)
    inst = np.zeros((48, 64), np.uint16)
    inst[5:9, 5:9] = 9
    cv2.imwrite(f"{root}/semantic_instance/semantic_instance_0.png", inst)
    sem = np.full((48, 64), 20, np.uint16)
    cv2.imwrite(f"{root}/semantic_class/semantic_class_0.png", sem)
    ds = ReplicaDataset(_cfg(root))
    s = ds[0]
    assert set(np.unique(s["obj"]).tolist()) == {0}


def test_make_dataset_dispatch(replica_root):
    ds = make_dataset(_cfg(replica_root))
    assert isinstance(ds, ReplicaDataset)
    with pytest.raises(ValueError, match="not found"):
        make_dataset(_cfg(replica_root, dataset_format="Nope"))


def test_prefetch_iterator(replica_root):
    ds = ReplicaDataset(_cfg(replica_root))
    frames = list(PrefetchIterator(ds))
    assert len(frames) == 3
    assert frames[1]["frame_id"] == 1


def test_synthetic_adapter():
    cfg = Config(dataset_format="Synthetic", W=64, H=48, fx=60.0, fy=60.0)
    ds = make_dataset(cfg)
    s = ds[0]
    assert s["image"].shape == (64, 48, 3)
    assert 0 in s["bbox_dict"]


def test_bg_membership_semantics_match_reference(replica_root):
    """Background folding decision vs the reference (dataset.py:105-107):
    the reference tests `unique(sem[mask]) in background_cls_list`, which is
    well-defined ONLY for single-class instances (a multi-class mask makes
    `array in list` raise) — and every real Replica render has one class
    per instance. Our majority-class vote is therefore behaviourally
    IDENTICAL on valid data and additionally robust to mixed masks; this
    test pins both properties."""
    from vmap_tpu.data.replica import ReplicaDataset, BACKGROUND_CLASSES

    # 1. single-class instances: vote == reference membership test
    cfg = _cfg(replica_root)
    ds = ReplicaDataset(cfg)
    s = ds[0]
    # fixture: inst 7 has class 20 (kept), background is wall class (folded)
    assert 7 in np.unique(s["obj"])
    assert set(np.unique(s["obj"])) <= {0, 7}

    # 2. mixed-class mask (would crash the reference): majority decides
    inst = np.zeros((40, 40), np.int32)
    inst[5:25, 5:25] = 9
    sem = np.zeros((40, 40), np.int32)
    sem[:, :] = 20
    # majority of instance 9's pixels are a background class
    bg_cls = next(iter(BACKGROUND_CLASSES))
    sem[5:25, 5:20] = bg_cls       # 15/20 columns background class
    inst_out, bbox = ds._build_instances(inst, sem)
    assert 9 not in np.unique(inst_out)

    sem[5:25, 5:25] = 20           # now fully a foreground class
    inst_out, bbox = ds._build_instances(inst, sem)
    assert 9 in np.unique(inst_out) and 9 in bbox
