"""Chunker, synthetic data, clip dataset, and loader tests."""

import numpy as np
import pytest

from pmce_tpu.data.chunker import (
    split_into_chunks_mesh,
    split_into_chunks_pose,
    video_groups,
)
from pmce_tpu.data.clip_dataset import ClipDataset, MultiDataset, epoch_iterator
from pmce_tpu.data.synthetic import generate_sequences


def _names(vid, n):
    return [f"s_01_vid_{vid:02d}_ca_04_{i + 1:06d}.jpg" for i in range(n)]


def test_video_groups():
    names = np.array(_names(0, 20) + _names(1, 5) + _names(2, 30))
    groups = video_groups(names)
    assert [len(g) for g in groups] == [20, 5, 30]
    np.testing.assert_array_equal(groups[0], np.arange(20))


def test_chunks_pose_stride1():
    names = np.array(_names(0, 20))
    chunks = split_into_chunks_pose(names, seqlen=16, stride=1)
    # 5 windows, but the VIBE trim drops windows past the last 16-aligned
    # chunk end (frame 15) → only the first window survives.
    assert chunks[0].tolist() == [0, 15]
    assert all(e - s == 15 for s, e in chunks)
    # every retained window ends at or before the vibe boundary
    assert chunks[-1][1] == 15


def test_chunks_pose_short_video_skipped():
    names = np.array(_names(0, 10) + _names(1, 16))
    chunks = split_into_chunks_pose(names, seqlen=16, stride=1)
    # Video 0 (10 frames) skipped; video 1 contributes exactly one window.
    assert len(chunks) == 1
    assert chunks[0].tolist() == [10, 25]


def test_chunks_mesh_drops_missing_mid():
    names = np.array(_names(0, 32))
    has_smpl = np.ones(32, bool)
    has_smpl[8] = False  # mid frame of the first window (0..15, mid=8)
    chunks = split_into_chunks_mesh(names, 16, 1, has_smpl)
    starts = [s for s, _ in chunks]
    assert 0 not in starts


@pytest.fixture(scope="module")
def synth():
    from pmce_tpu.smpl.artifacts import synthetic_artifacts

    art = synthetic_artifacts(seed=0, num_verts=600, num_faces=1200)
    # 17-joint regressor stand-in.
    rng = np.random.default_rng(0)
    jr = rng.random((17, 600)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    data = generate_sequences(art, jr, num_videos=2, frames_per_video=40,
                              seed=0)
    return art, jr, data


def test_synthetic_consistency(synth):
    art, jr, data = synth
    assert len(data) == 80
    # GT joints must be root-relative (joint 0 at origin).
    np.testing.assert_allclose(data.joint_cam[:, 0], 0.0, atol=1e-3)
    # Regressing joints from the mesh reproduces joint_cam (both mm,
    # root-relative by the same root).
    jc = np.einsum("jv,nvk->njk", jr, data.mesh_cam)
    np.testing.assert_allclose(jc - jc[:, :1], data.joint_cam, atol=1e-2)


def test_clip_dataset_batch(synth):
    art, jr, data = synth
    ds = ClipDataset(data, seqlen=16, stride=1)
    assert len(ds) > 0
    batch = ds.get_batch(np.arange(4))
    assert batch["pose2d"].shape == (4, 16, 17, 2)
    assert batch["img_feature"].shape == (4, 16, 2048)
    assert batch["mesh"].shape == (4, 600, 3)
    assert batch["lift_pose3d"].shape == (4, 17, 3)
    assert batch["mesh_valid"].shape == (4, 600, 1)
    # 2D inputs are width-normalized into roughly [-1, 1].
    assert np.abs(batch["pose2d"]).max() < 2.0


def test_epoch_iterator_static_shapes(synth):
    art, jr, data = synth
    ds = ClipDataset(data, seqlen=16, stride=1)
    shapes = set()
    total = 0
    for batch in epoch_iterator(ds, 8, shuffle=True, seed=1,
                                drop_last=False):
        shapes.add(batch["pose2d"].shape)
        total += 1
    assert len(shapes) == 1  # static shapes incl. padded last batch
    assert total == -(-len(ds) // 8)


def test_multi_dataset_mixing(synth):
    art, jr, data = synth
    ds1 = ClipDataset(data, seqlen=16, stride=1)
    ds2 = ClipDataset(data, seqlen=16, stride=2)
    multi = MultiDataset([ds1, ds2], seed=0)
    assert len(multi) == 2 * max(len(ds1), len(ds2))
    batch = multi.sample_batch(16)
    assert batch["pose2d"].shape[0] == 16


def test_chunk_mode_pose_keeps_all_windows(synth):
    """Stage-1 (PoseEst) windows over ALL frames; mesh mode drops windows
    whose mid frame lacks SMPL (reference Human36M/dataset.py:99-103)."""
    art, jr, data = synth
    data.has_smpl = data.has_smpl.copy()
    data.has_smpl[5:15] = False            # knock out some mid frames
    mesh_ds = ClipDataset(data, seqlen=16, stride=1, chunk_mode="mesh")
    pose_ds = ClipDataset(data, seqlen=16, stride=1, chunk_mode="pose")
    assert len(pose_ds) > len(mesh_ds)
    # Matches the pose chunker exactly (incl. its VIBE tail trim) —
    # no windows dropped for missing SMPL.
    assert len(pose_ds) == len(split_into_chunks_pose(
        data.img_names, 16, 1))


def test_epoch_iterator_fills_batches_larger_than_dataset(synth):
    """batch_size >> len(dataset): the wrap pad must cycle the order to
    fill the FULL deficit (order[:deficit] under-filled and broke the
    static batch shape)."""
    art, jr, data = synth
    ds = ClipDataset(data, seqlen=16, stride=8)
    assert 0 < len(ds) < 32
    batches = list(epoch_iterator(ds, 32, shuffle=False, seed=0,
                                  drop_last=False))
    assert len(batches) == 1
    assert batches[0]["pose2d"].shape[0] == 32
    assert batches[0]["_weight"].sum() == len(ds)


def test_mpii3d_test_to_h36m_permutation():
    """spin's 'Head (H36M)' row must land in the h36m NOSE slot via the
    reference's dataset-name walk (MPII3D/dataset.py:35-37,270-271)."""
    from pmce_tpu.data.kp_utils import (
        MPII3D_TEST_TO_H36M,
        convert_kps,
        get_joint_names,
    )

    spin_names = get_joint_names("spin")
    spin = np.zeros((len(spin_names), 3), np.float32)
    spin[spin_names.index("Head (H36M)")] = (7.0, 8.0, 9.0)
    spin[spin_names.index("headtop")] = (1.0, 2.0, 3.0)
    h36m = convert_kps(spin, "spin", "mpii3d_test")[
        list(MPII3D_TEST_TO_H36M)]
    h36m_names = get_joint_names("h36m")
    np.testing.assert_array_equal(h36m[h36m_names.index("nose")],
                                  (7.0, 8.0, 9.0))
    np.testing.assert_array_equal(h36m[h36m_names.index("headtop")],
                                  (1.0, 2.0, 3.0))
    assert sorted(MPII3D_TEST_TO_H36M) == list(range(17))
