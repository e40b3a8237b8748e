"""3D instance association (ScanNet-style) and detection tracking."""

import numpy as np
import pytest

from vmap_tpu.data.association import (AssociationState, associate_frame,
                                       track_detections)


W, H = 160, 120
FX = FY = 50.0
CX, CY = (W - 1) / 2, (H - 1) / 2


def _frame_with_blob(u0, u1, v0, v1, depth_val=2.0):
    depth = np.full((W, H), 3.0, np.float32)
    mask = np.zeros((W, H), bool)
    mask[u0:u1, v0:v1] = True
    depth[mask] = depth_val
    return mask, depth


def test_new_instance_accepted():
    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105)
    out = associate_frame([mask], [5], depth, st, FX, FY, CX, CY, np.eye(4),
                          min_pixels=50)
    assert (out[mask] == 5).all()
    assert 5 in st.tracks and st.tracks[5].bbox3d is not None


def test_consistent_reobservation_merges():
    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105)
    associate_frame([mask], [5], depth, st, FX, FY, CX, CY, np.eye(4),
                    min_pixels=50)
    # same blob again (camera shifted slightly)
    T2 = np.eye(4)
    T2[0, 3] = 0.01
    out = associate_frame([mask], [5], depth, st, FX, FY, CX, CY, T2,
                          min_pixels=50)
    labels = out[mask]
    # core pixels keep the id; rim pixels outside the (eroded-source) box
    # are legitimately marked unsure (-1), never another id
    assert set(np.unique(labels)) <= {5, -1}
    assert (labels == 5).mean() > 0.5
    assert st.tracks[5].merge_cnt >= 1


def test_displaced_reobservation_marked_unsure():
    """Same id, geometry far from the remembered box -> all pixels -1."""
    st = AssociationState()
    mask, depth = _frame_with_blob(30, 130, 20, 100, depth_val=2.0)
    associate_frame([mask], [5], depth, st, FX, FY, CX, CY, np.eye(4),
                    min_pixels=50)
    # teleport the camera 50 m: new points far outside the old box
    T2 = np.eye(4)
    T2[0, 3] = 50.0
    out = associate_frame([mask], [5], depth, st, FX, FY, CX, CY, T2,
                          min_pixels=50)
    assert (out[mask] == -1).all()


def test_tiny_mask_dropped():
    st = AssociationState()
    mask, depth = _frame_with_blob(10, 18, 10, 18)
    out = associate_frame([mask], [5], depth, st, FX, FY, CX, CY, np.eye(4),
                          min_pixels=500)
    assert (out == 0).all()
    assert 5 not in st.tracks


def test_track_detections_assigns_stable_ids():
    """Detector-style input: no ids, only class labels. The same physical
    object must get the same track id across frames."""
    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105, depth_val=2.0)
    out1 = track_detections([mask], [7], depth, st, FX, FY, CX, CY,
                            np.eye(4), min_pixels=100, voxel_size=0.02)
    id1 = out1[mask][0]
    assert id1 > 0
    out2 = track_detections([mask], [7], depth, st, FX, FY, CX, CY,
                            np.eye(4), min_pixels=100, voxel_size=0.02)
    id2 = out2[mask][out2[mask] > 0]
    assert (id2 == id1).all()
    assert len(st.tracks) == 1


def test_track_detections_class_gate():
    """Same geometry, different class -> separate tracks unless affinity
    says otherwise."""
    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105, depth_val=2.0)
    track_detections([mask], [7], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02)
    track_detections([mask], [9], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02)
    assert len(st.tracks) == 2

    st2 = AssociationState()
    affinity = lambda a, b: True  # everything semantically mergeable
    track_detections([mask], [7], depth, st2, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, class_affinity=affinity)
    track_detections([mask], [9], depth, st2, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, class_affinity=affinity)
    assert len(st2.tracks) == 1


def test_feature_affinity_table():
    """FeatureAffinity: per-class embedding table drives merging."""
    from vmap_tpu.data.association import FeatureAffinity
    table = {7: np.array([1.0, 0.0, 0.0]),
             8: np.array([0.96, 0.28, 0.0]),   # cos(7,8) ~ 0.96
             9: np.array([0.0, 0.0, 1.0])}
    aff = FeatureAffinity(table, threshold=0.9)
    assert aff(7, 7) and aff(7, 8) and not aff(7, 9)
    assert not aff(7, 42)  # unknown class: no feature, no merge

    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105, depth_val=2.0)
    track_detections([mask], [7], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, class_affinity=aff)
    track_detections([mask], [8], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, class_affinity=aff)
    track_detections([mask], [9], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, class_affinity=aff)
    assert len(st.tracks) == 2  # 7 and 8 merged; 9 separate


def test_track_detections_per_detection_features():
    """Per-detection embeddings (the reference's CLIP branch): identical
    features merge across different class ids; orthogonal features don't,
    and the track feature running-averages."""
    st = AssociationState()
    mask, depth = _frame_with_blob(20, 140, 15, 105, depth_val=2.0)
    f_a = np.array([1.0, 0.0], np.float32)
    f_b = np.array([0.0, 1.0], np.float32)
    track_detections([mask], [7], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, features=[f_a])
    track_detections([mask], [9], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, features=[f_a])
    assert len(st.tracks) == 1
    track_detections([mask], [7], depth, st, FX, FY, CX, CY, np.eye(4),
                     min_pixels=100, voxel_size=0.02, features=[f_b])
    assert len(st.tracks) == 2
    t1 = st.tracks[1]
    np.testing.assert_allclose(t1.feature, f_a)
