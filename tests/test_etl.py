"""End-to-end ETL tests: mock reference-format sources → converter →
packed npz → dataset → batch/evaluate round trip.

The mocks (tests/etl_fixtures.py) generate ground truth through a DIFFERENT
computation path than the converters (world-frame SMPL + camera rotation of
the RESULT, vs the converters' root-pose rotation fix-up + translation
compensation), so agreement validates the conversion math, not just the
plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest

from pmce_tpu.data.datasets import MPII, MPII3D, MSCOCO, PW3D, Human36M
from pmce_tpu.data.etl import (
    convert_coco,
    convert_h36m,
    convert_mpii,
    convert_mpii3d,
    convert_pw3d,
)
from pmce_tpu.data.packed import save_packed
from tests.etl_fixtures import (
    build_coco_mock,
    build_h36m_mock,
    build_mpii3d_train_mock,
    build_mpii3d_val_mock,
    build_mpii_mock,
    build_pw3d_mock,
    small_art,
    small_regressors,
)


@pytest.fixture(scope="module")
def art():
    return small_art()


@pytest.fixture(scope="module")
def regs(art):
    rng = np.random.default_rng(42)
    return small_regressors(art.num_verts, rng)


def gt_results(ds):
    """Build a perfect-prediction result list for a dataset's evaluate()."""
    out = []
    for i in range(len(ds)):
        b = ds.get_batch(np.array([i]))
        out.append({
            "mesh_coord": b["mesh"][0] * 1000.0,
            "mesh_coord_target": b["mesh"][0] * 1000.0,
            "joint_coord": b["lift_pose3d"][0],
            "joint_coord_target": b["lift_pose3d"][0],
        })
    return out


# ---------------------------------------------------------------- Human36M
class TestH36M:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory, art, regs):
        root = str(tmp_path_factory.mktemp("h36m_data"))
        jr_h36m, _ = regs
        truth = build_h36m_mock(root, art, jr_h36m)
        data = convert_h36m(root, "train", art,
                            input_joint_set="human36", subjects=(1, 5))
        return truth, data

    def test_frame_count_and_order(self, converted):
        truth, data = converted
        assert len(data) == len(truth["frames"])
        assert list(data.img_names) == [f["img_name"]
                                        for f in truth["frames"]]

    def test_feature_alignment(self, converted):
        truth, data = converted
        for i, fr in enumerate(truth["frames"]):
            np.testing.assert_array_equal(data.features[i],
                                          truth["feat"][fr["img_name"]])

    def test_joints_match_world_transform(self, converted):
        truth, data = converted
        for i, fr in enumerate(truth["frames"]):
            root = fr["jcam_h36m"][:1]
            np.testing.assert_allclose(
                data.joint_cam_h36m[i], fr["jcam_h36m"] - root,
                atol=1e-2)
            np.testing.assert_allclose(
                data.joint_img[i], fr["jimg"], atol=1e-2)

    def test_mesh_matches_independent_world_path(self, converted):
        """Converter: rotate root pose + translation compensation.
        Mock: SMPL in world frame, rotate the RESULT. Must agree ≤0.1 mm."""
        truth, data = converted
        for i, fr in enumerate(truth["frames"]):
            if not fr["has_smpl"]:
                assert not data.has_smpl[i]
                continue
            root = fr["jcam_h36m"][:1]
            np.testing.assert_allclose(
                data.mesh_cam[i], fr["mesh_cam"] - root, atol=0.1)

    def test_cpn_detections(self, converted):
        truth, data = converted
        for i, fr in enumerate(truth["frames"]):
            np.testing.assert_allclose(data.pose2d_det[i],
                                       fr["jimg"] + 1.5, atol=1e-3)

    def test_packed_round_trip_and_protocol(self, converted, tmp_path,
                                            art, regs):
        truth, data = converted
        jr_h36m, jr_coco = regs
        path = tmp_path / "Human36M_train_packed.npz"
        save_packed(data, path, jr_smpl=art.J_regressor,
                    jr_h36m=jr_h36m, jr_coco=jr_coco)
        ds = Human36M.from_packed(path, split="train", seqlen=4, stride=1)
        assert len(ds) > 0
        # mesh_valid comes from the fitting gate; GT-consistent mocks pass.
        b = ds.get_batch(np.arange(min(4, len(ds))))
        assert b["pose2d"].shape[1:] == (4, 17, 2)
        assert b["mesh_valid"].max() == 1.0
        out = ds.evaluate(gt_results(ds), verbose=False)
        assert out.mpjpe < 1e-3
        assert out.mpvpe < 1e-3


# ------------------------------------------------------------------- PW3D
class TestPW3D:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory, art, regs):
        root = str(tmp_path_factory.mktemp("pw3d_data"))
        jr_h36m, jr_coco = regs
        truth = build_pw3d_mock(root, art, jr_h36m, jr_coco, split="test")
        # Gendered artifacts: reuse the same body for male/female in the
        # mock; the converter exercises the gender dispatch path.
        arts = {"neutral": art, "male": art, "female": art}
        data = convert_pw3d(root, "test", arts)
        return truth, data

    def test_count_and_sorted_order(self, converted):
        truth, data = converted
        assert len(data) == len(truth["frames"])
        paths = sorted(f["path"] for f in truth["frames"])
        assert list(data.img_names) == paths

    def test_mesh_and_features(self, converted):
        truth, data = converted
        by_path = {f["path"]: f for f in truth["frames"]}
        for i, p in enumerate(data.img_names):
            fr = by_path[str(p)]
            root = fr["jcam_h36m"][:1]
            np.testing.assert_allclose(data.mesh_cam[i],
                                       fr["mesh_mm"] - root, atol=0.1)
            np.testing.assert_array_equal(data.features[i], fr["feat"])

    def test_vitpose_det_has_pelvis_neck(self, converted):
        _, data = converted
        assert data.pose2d_det.shape[1] == 19

    def test_protocol_round_trip(self, converted, tmp_path, art, regs):
        _, data = converted
        jr_h36m, jr_coco = regs
        path = tmp_path / "PW3D_test_packed.npz"
        save_packed(data, path, jr_smpl=art.J_regressor,
                    jr_h36m=jr_h36m, jr_coco=jr_coco)
        ds = PW3D.from_packed(path, seqlen=4, stride=1)
        assert len(ds) > 0
        out = ds.evaluate(gt_results(ds), verbose=False)
        assert out.mpjpe < 1e-3


# ----------------------------------------------------------------- MPII3D
class TestMPII3D:
    def test_train(self, tmp_path, art, regs):
        jr_h36m, jr_coco = regs
        root = str(tmp_path / "mpii3d")
        truth = build_mpii3d_train_mock(root, art, jr_h36m, jr_coco)
        data = convert_mpii3d(root, "train", art)
        assert len(data) == len(truth["frames"])
        by = {}
        for fr in truth["frames"]:
            name = (f"{root}/MPI_INF_3DHP/S1/Seq1/imageFrames/"
                    f"video_{fr['vid']}/{str(fr['frame']).zfill(6)}.jpg")
            by[name] = fr
        for i, p in enumerate(data.img_names):
            fr = by[str(p)]
            root_j = fr["jcam_h36m"][:1]
            np.testing.assert_allclose(data.mesh_cam[i],
                                       fr["mesh_cam"] - root_j, atol=0.1)
            np.testing.assert_array_equal(data.features[i], fr["feat"])
        path = tmp_path / "MPII3D_train_packed.npz"
        save_packed(data, path, jr_h36m=jr_h36m, jr_coco=jr_coco)
        ds = MPII3D.from_packed(path, split="train", seqlen=4, stride=2)
        assert len(ds) > 0
        b = ds.get_batch(np.arange(min(2, len(ds))))
        assert b["pose2d"].shape[2] == 19

    def test_val(self, tmp_path, art):
        root = str(tmp_path / "mpii3d_val")
        truth = build_mpii3d_val_mock(root)
        data = convert_mpii3d(root, "val", art)
        assert len(data) == len(truth["names"])
        assert data.joint_cam.shape[1] == 17
        assert np.all(data.mesh_cam == 0)
        path = tmp_path / "MPII3D_val_packed.npz"
        save_packed(data, path)
        ds = MPII3D.from_packed(path, split="val", seqlen=4, stride=1)
        assert ds.is_val
        b = ds.get_batch(np.arange(min(2, len(ds))))
        assert np.all(b["mesh_valid"] == 0)   # val: mesh targets zeroed


# ------------------------------------------------------------- COCO, MPII
class TestStaticImages:
    def test_coco(self, tmp_path, art, regs):
        jr_h36m, jr_coco = regs
        root = str(tmp_path / "coco")
        truth = build_coco_mock(root, art, jr_h36m, jr_coco)
        data = convert_coco(root, art, jr_h36m, jr_coco)
        assert len(data) == len(truth["frames"])
        for i, fr in enumerate(truth["frames"]):
            np.testing.assert_array_equal(data.features[i], fr["feat"])
            # SMPLify gate: planted good/bad fits must split validities.
            assert data.mesh_valid[i] == (1.0 if fr["good"] else 0.0)
        # Detector-noise synthesis must actually perturb the GT joints
        # (a zero validity column once made it a silent no-op).
        assert np.abs(data.pose2d_det[:, :17]
                      - data.joint_img[:, :17]).max() > 0.0
        path = tmp_path / "COCO_train_packed.npz"
        save_packed(data, path, jr_h36m=jr_h36m, jr_coco=jr_coco)
        ds = MSCOCO.from_packed(path, seqlen=4)
        assert len(ds) == len(data)        # every image is one window
        b = ds.get_batch(np.arange(2))
        # static images: the window repeats one frame T times
        np.testing.assert_array_equal(b["pose2d"][:, 0], b["pose2d"][:, 1])

    def test_mpii(self, tmp_path, art, regs):
        jr_h36m, jr_coco = regs
        root = str(tmp_path / "mpii")
        truth = build_mpii_mock(root, art, jr_h36m, jr_coco)
        data = convert_mpii(root, art, jr_h36m, jr_coco)
        assert len(data) == len(truth["frames"])
        for i, fr in enumerate(truth["frames"]):
            np.testing.assert_array_equal(data.features[i], fr["feat"])
        assert data.mesh_valid is None     # MPII has no fitting gate
        assert np.abs(data.pose2d_det[:, :17]
                      - data.joint_img[:, :17]).max() > 0.0
        path = tmp_path / "MPII_train_packed.npz"
        save_packed(data, path, jr_h36m=jr_h36m, jr_coco=jr_coco)
        ds = MPII.from_packed(path, seqlen=4)
        b = ds.get_batch(np.arange(2))
        assert np.all(b["mesh_valid"] == 1.0)


# ------------------------------------------------------------ factory path
def test_factory_prefers_packed(tmp_path, art, regs, monkeypatch):
    from pmce_tpu.core.config import Config
    from pmce_tpu.data import factory

    jr_h36m, jr_coco = regs
    root = str(tmp_path / "h36m_src")
    build_h36m_mock(root, art, jr_h36m)
    data = convert_h36m(root, "train", art, subjects=(1, 5))
    cfg = Config()
    cfg.data_dir = str(tmp_path)
    cfg.DATASET.seqlen = 4
    save_packed(data, tmp_path / "Human36M_train_packed.npz",
                jr_smpl=art.J_regressor, jr_h36m=jr_h36m, jr_coco=jr_coco)
    ds = factory.build_dataset("Human36M", cfg, art, "train")
    # Packed data, not the synthetic fixture: names come from the mock.
    assert str(ds.data.img_names[0]).startswith("s_01_act_02")


def test_factory_errors_on_missing_packed_with_explicit_dir(tmp_path, art):
    """An explicitly-configured data_dir with no packed npz must hard-error,
    never silently fall back to synthetic fixtures (silent-drift hazard)."""
    from pmce_tpu.core.config import Config
    from pmce_tpu.data import factory

    cfg = Config()
    cfg.data_dir = str(tmp_path / "nonexistent_drop")
    cfg.DATASET.seqlen = 4
    with pytest.raises(FileNotFoundError, match="explicitly configured"):
        factory.build_dataset("Human36M", cfg, art, "train")


def test_factory_synthetic_paths_logged(tmp_path, art, capsys):
    """Default config quietly falls back to fixtures but SAYS so; the
    synthetic flag keeps working under an explicit data_dir."""
    from pmce_tpu.core.config import Config
    from pmce_tpu.data import factory

    cfg = Config()
    cfg.DATASET.seqlen = 4
    cfg.DATASET.synthetic_samples = 32
    factory.build_dataset("COCO", cfg, art, "train")
    assert "COCO/train ← synthetic fixtures (no packed npz" in \
        capsys.readouterr().out

    cfg.data_dir = str(tmp_path / "nonexistent_drop")
    cfg.DATASET.synthetic = True
    factory.build_dataset("COCO", cfg, art, "train")
    assert "DATASET.synthetic: true" in capsys.readouterr().out
