"""Mock dataset sources in the reference's EXACT on-disk formats.

Each builder writes a tiny but structurally faithful copy of what the
reference loads (COCO-format annotation JSONs, joblib feature DBs,
NeuralAnnot/SMPLify fit JSONs, CPN/ViTPose detection JSONs), with ground
truth generated through the SMPL layer so converter outputs can be checked
against independently-computed values (world-frame SMPL + camera transform
vs the converter's root-rotation fix-up path).
"""

from __future__ import annotations

import json
import os
import os.path as osp

import joblib
import numpy as np

from pmce_tpu.data.etl.common import smpl_verts_joints
from pmce_tpu.smpl.artifacts import synthetic_artifacts


def small_art(seed=0):
    return synthetic_artifacts(seed=seed, num_verts=120, num_faces=200)


def small_regressors(V, rng):
    def make(k):
        jr = np.zeros((k, V), np.float32)
        for j in range(k):
            idx = rng.choice(V, size=4, replace=False)
            w = rng.random(4).astype(np.float32)
            jr[j, idx] = w / w.sum()
        return jr
    return make(17), make(17)  # h36m-17 and coco-17 (pre pelvis/neck)


def rot_xyz(rx, ry, rz):
    cx, sx, cy, sy, cz, sz = (np.cos(rx), np.sin(rx), np.cos(ry),
                              np.sin(ry), np.cos(rz), np.sin(rz))
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def _project(jcam_mm, f, c):
    z = jcam_mm[:, 2]
    return np.stack([jcam_mm[:, 0] / z * f[0] + c[0],
                     jcam_mm[:, 1] / z * f[1] + c[1]], axis=1)


def build_h36m_mock(root: str, art, jr_h36m, seed=0):
    """Write a mock h36m_data tree: 2 train subjects (1, 5), 1 action, 1
    subaction, 2 cameras, 12 frames (6 sampled per camera). Returns the
    ground-truth world model for independent verification."""
    rng = np.random.default_rng(seed)
    data_path = root
    annot_path = osp.join(root, "annotations")
    os.makedirs(annot_path, exist_ok=True)

    subjects = [1, 5]
    cams = [1, 4]
    n_frames = 12
    f = np.array([1100.0, 1100.0], np.float32)
    c = np.array([500.0, 500.0], np.float32)

    cameras = {
        1: {"R": rot_xyz(0.05, 0.1, -0.03).tolist(),
            "t": [100.0, -50.0, 4500.0], "f": f.tolist(), "c": c.tolist()},
        4: {"R": rot_xyz(-0.04, 0.6, 0.02).tolist(),
            "t": [-80.0, 30.0, 5200.0], "f": f.tolist(), "c": c.tolist()},
    }

    truth = {"frames": [], "feat": {}}
    all_feat_entries = []   # (img_name, feature) for EVERY frame — the
    # reference's feat_cnt walk steps by the sampling ratio through a
    # name-sorted all-frames feature DB.
    for subject in subjects:
        images, annots = [], []
        joint_3d = {"2": {"1": {}}}
        smpl = {"2": {"1": {}}}
        aid = subject * 1000

        # Per-frame world model (shared across cameras).
        frames = []
        for frame in range(n_frames):
            pose = rng.normal(scale=0.3, size=72).astype(np.float32)
            shape = rng.normal(scale=0.5, size=10).astype(np.float32)
            trans = np.array([0.1 * frame, 0.02 * subject, 0.5],
                             np.float32)
            has_smpl = not (subject == 5 and frame == 4)
            verts_m, _ = smpl_verts_joints(art, pose[None], shape[None])
            verts_w = (verts_m[0] + trans) * 1000.0          # world mm
            jw_h36m = jr_h36m @ verts_w                       # [17, 3] mm
            joint_3d["2"]["1"][str(frame)] = jw_h36m.tolist()
            if has_smpl:
                smpl["2"]["1"][str(frame)] = {
                    "pose": pose.tolist(), "shape": shape.tolist(),
                    "trans": trans.tolist(),
                }
            frames.append((frame, has_smpl, verts_w, jw_h36m))

        # Annotations ordered per camera-sequence, frames ascending — the
        # ordering the reference's feature walk requires.
        for cam in cams:
            R = np.asarray(cameras[cam]["R"], np.float32)
            t = np.asarray(cameras[cam]["t"], np.float32)
            for frame, has_smpl, verts_w, jw_h36m in frames:
                img_name = (f"s_{subject:02d}_act_02_subact_01_"
                            f"ca_{cam:02d}_{frame + 1:06d}.jpg")
                image_id = aid
                images.append({
                    "id": image_id, "file_name": img_name,
                    "width": 1000, "height": 1002,
                    "frame_idx": frame, "subject": subject,
                    "action_idx": 2, "subaction_idx": 1, "cam_idx": cam,
                })
                jcam = jw_h36m @ R.T + t
                jimg = _project(jcam, f, c)
                annots.append({
                    "id": aid, "image_id": image_id,
                    "bbox": [float(jimg[:, 0].min()),
                             float(jimg[:, 1].min()),
                             float(np.ptp(jimg[:, 0]) + 1),
                             float(np.ptp(jimg[:, 1]) + 1)],
                })
                aid += 1
                feat = rng.normal(size=2048).astype(np.float32)
                all_feat_entries.append((img_name, feat))
                if frame % 2 == 0:
                    truth["feat"][img_name] = feat
                    mesh_cam_w = verts_w @ R.T + t   # world→cam, mm
                    truth["frames"].append(dict(
                        img_name=img_name, subject=subject, cam=cam,
                        frame=frame, has_smpl=has_smpl,
                        jcam_h36m=jcam, jimg=jimg,
                        mesh_cam=mesh_cam_w))
        with open(osp.join(annot_path,
                           f"Human36M_subject{subject}_data.json"),
                  "w") as fh:
            json.dump({"images": images, "annotations": annots}, fh)
        with open(osp.join(annot_path,
                           f"Human36M_subject{subject}_camera.json"),
                  "w") as fh:
            json.dump({str(k): v for k, v in cameras.items()}, fh)
        with open(osp.join(annot_path,
                           f"Human36M_subject{subject}_joint_3d.json"),
                  "w") as fh:
            json.dump(joint_3d, fh)
        with open(osp.join(
                annot_path,
                f"Human36M_subject{subject}_SMPL_NeuralAnnot.json"),
                "w") as fh:
            json.dump(smpl, fh)

    # Feature DB sorted by name + the start-idx walk index.
    all_feat_entries.sort(key=lambda e: e[0])
    names = np.array([e[0] for e in all_feat_entries])
    feats = np.stack([e[1] for e in all_feat_entries])
    joblib.dump({"features": feats, "img_name": names},
                osp.join(data_path, "h36m_train_imgfeat_db_concat.pt"))
    start_idx: dict = {}
    for i, n in enumerate(names):
        # s_SS_act_AA_subact_BB_ca_CC_FFFFFF.jpg
        parts = str(n).split("_")
        subject, act = str(int(parts[1])), str(int(parts[3]))
        subact, cam = str(int(parts[5])), str(int(parts[7]))
        frame = int(str(n)[-10:-4]) - 1
        if frame == 0:
            start_idx.setdefault(subject, {}).setdefault(
                act, {}).setdefault(subact, {})[cam] = i
    with open(osp.join(data_path,
                       "Human36M_train_start_idx_tight.json"), "w") as fh:
        json.dump(start_idx, fh)

    # CPN detections: GT 2D + small fixed offset.
    cpn = {}
    for fr in truth["frames"]:
        cpn[fr["img_name"]] = (fr["jimg"] + 1.5).tolist()
    with open(osp.join(data_path,
                       "Human36M_train_cpn_joint_2d.json"), "w") as fh:
        json.dump(cpn, fh)
    return truth


def build_pw3d_mock(root: str, art, jr_h36m, jr_coco, split="test",
                    seed=1):
    """Mock pw3d_data: 2 sequences × 8 frames × 1 person."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    f = np.array([1000.0, 1000.0], np.float32)
    c = np.array([400.0, 400.0], np.float32)

    images, annots = [], []
    coco_cam: dict = {}
    gt_coco_img: dict = {}
    h36m_cam: dict = {}
    feats: dict = {}
    vit = []
    truth = {"frames": []}
    aid = 0
    genders = {"seq_a": "male", "seq_b": "female"}
    for seq in ("seq_a", "seq_b"):
        for frame in range(8):
            img_name = f"image_{frame:05d}.jpg"
            pose = rng.normal(scale=0.3, size=72).astype(np.float32)
            shape = rng.normal(scale=0.5, size=10).astype(np.float32)
            trans = np.array([0.05 * frame, 0.0, 4.0], np.float32)
            verts_m, _ = smpl_verts_joints(art, pose[None], shape[None],
                                           trans[None])
            mesh_mm = verts_m[0] * 1000.0
            jh = jr_h36m @ mesh_mm
            jc17 = jr_coco @ mesh_mm
            pelvis = (jc17[11] + jc17[12]) / 2
            neck = (jc17[5] + jc17[6]) / 2
            jc = np.concatenate([jc17, pelvis[None], neck[None]])
            jimg = _project(jc, f, c)

            images.append({"id": aid, "file_name": img_name,
                           "width": 800, "height": 800,
                           "sequence": seq})
            annots.append({
                "id": aid, "image_id": aid, "person_id": 0,
                "smpl_param": {
                    "pose": pose.tolist(), "shape": shape.tolist(),
                    "trans": trans.tolist(), "gender": genders[seq]},
            })
            fidx = str(frame)
            coco_cam.setdefault(seq, {}).setdefault(fidx, {})["0"] = (
                jc.tolist())
            gt_coco_img.setdefault(seq, {}).setdefault(fidx, {})["0"] = (
                jimg.tolist())
            h36m_cam.setdefault(seq, {}).setdefault(fidx, {})["0"] = (
                jh.tolist())
            feat = rng.normal(size=2048).astype(np.float32)
            feats[f"{seq}_0_{frame}"] = feat.tolist()
            vit.append({"annotation_id": aid,
                        "keypoints": np.concatenate(
                            [jimg[:17] + 2.0,
                             np.ones((17, 1), np.float32)],
                            axis=1).tolist()})
            truth["frames"].append(dict(
                path=osp.join("0", seq, img_name), mesh_mm=mesh_mm,
                jcam_h36m=jh, feat=feat, gender=genders[seq]))
            aid += 1

    def dump(obj, name):
        with open(osp.join(root, name), "w") as fh:
            json.dump(obj, fh)

    dump({"images": images, "annotations": annots},
         f"3DPW_latest_{split}.json")
    dump(coco_cam, f"3DPW_{split}_joint_coco_cam.json")
    dump(gt_coco_img, f"3DPW_{split}_gt_joint_coco_img.json")
    dump(h36m_cam, f"3DPW_{split}_joint_h36m_cam.json")
    dump(feats, f"3DPW_{split}_img_feat.json")
    if split == "train":
        noise = {s: {f_: {p: (np.asarray(v)[:, :2] + 1.0).tolist()
                          for p, v in d.items()}
                     for f_, d in per.items()}
                 for s, per in gt_coco_img.items()}
        dump(noise, f"3DPW_{split}_joint_coco_img_noise.json")
    else:
        dump(vit, f"vitpose_3dpw_{split}_output.json")
    return truth


def build_mpii3d_train_mock(root: str, art, jr_h36m, jr_coco, seed=2):
    """Mock MPI-INF-3DHP train: 1 subject, 1 seq, 2 cams, 8 frames."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    f, c = [1200.0, 1200.0], [1024.0, 1024.0]
    R1 = rot_xyz(0.1, -0.2, 0.05)
    # [subject][seq][vid] nesting (MPI-INF-3DHP_camera.json).
    cams = {"1": {"1": {"0": {"R": R1.tolist(),
                              "t": [50.0, 20.0, 3800.0],
                              "focal": f, "princpt": c,
                              "img_shape": [2048, 2048]},
                        "1": {"R": rot_xyz(0, 0.9, 0).tolist(),
                              "t": [-60.0, 10.0, 4100.0],
                              "focal": f, "princpt": c,
                              "img_shape": [2048, 2048]}}}}
    images, annots = [], []
    smpl: dict = {"1": {"1": {}}}
    coco_cam: dict = {}
    gt_coco_img: dict = {}
    h36m_cam: dict = {}
    noise_2d: dict = {}
    feat_names, feat_vals = [], []
    truth = {"frames": []}
    aid = 0
    frames = []
    for frame in range(8):
        pose = rng.normal(scale=0.3, size=72).astype(np.float32)
        shape = rng.normal(scale=0.5, size=10).astype(np.float32)
        trans = np.array([0.02 * frame, 0.01, 0.3], np.float32)
        smpl["1"]["1"][str(frame)] = {"pose": pose.tolist(),
                                      "shape": shape.tolist(),
                                      "trans": trans.tolist()}
        verts_m, _ = smpl_verts_joints(art, pose[None], shape[None])
        verts_w = (verts_m[0] + trans) * 1000.0
        frames.append((frame, verts_w))
    for vid in ("0", "1"):
        cam = cams["1"]["1"][vid]
        R = np.asarray(cam["R"], np.float32)
        t = np.asarray(cam["t"], np.float32)
        fx = np.asarray(cam["focal"], np.float32)
        cx = np.asarray(cam["princpt"], np.float32)
        for frame, verts_w in frames:
            mesh_cam_mm = verts_w @ R.T + t
            jh = jr_h36m @ mesh_cam_mm
            jc17 = jr_coco @ mesh_cam_mm
            pelvis = (jc17[11] + jc17[12]) / 2
            neck = (jc17[5] + jc17[6]) / 2
            jc = np.concatenate([jc17, pelvis[None], neck[None]])
            jimg = _project(jc, fx, cx)
            images.append({"id": aid, "subject_idx": 1, "seq_idx": 1,
                           "cam_idx": int(vid), "frame_idx": frame,
                           "width": 2048, "height": 2048})
            annots.append({"id": aid, "image_id": aid})
            fidx = str(frame)
            coco_cam.setdefault("1", {}).setdefault("1", {}).setdefault(
                vid, {})[fidx] = jc.tolist()
            gt_coco_img.setdefault("1", {}).setdefault("1", {}).setdefault(
                vid, {})[fidx] = jimg.tolist()
            h36m_cam.setdefault("1", {}).setdefault("1", {}).setdefault(
                vid, {})[fidx] = jh.tolist()
            noise_2d.setdefault("1", {}).setdefault("1", {}).setdefault(
                vid, {})[fidx] = (jimg + 1.0).tolist()
            name = osp.join("data/mpii_3d", "S1", "Seq1",
                            f"video_{vid}", str(frame).zfill(6) + ".jpg")
            feat = rng.normal(size=2048).astype(np.float32)
            feat_names.append(name)
            feat_vals.append(feat)
            truth["frames"].append(dict(
                vid=vid, frame=frame, mesh_cam=mesh_cam_mm,
                jcam_h36m=jh, feat=feat))
            aid += 1

    def dump(obj, name):
        with open(osp.join(root, name), "w") as fh:
            json.dump(obj, fh)

    dump({"images": images, "annotations": annots}, "MPI-INF-3DHP.json")
    dump(smpl, "MPI-INF-3DHP_SMPL_NeuralAnnot.json")
    dump(cams, "MPI-INF-3DHP_camera.json")
    dump(coco_cam, "MPII3D_train_joint_coco_cam.json")
    dump(gt_coco_img, "MPII3D_train_gt_joint_coco_img.json")
    dump(h36m_cam, "MPII3D_train_joint_h36m_cam.json")
    dump(noise_2d, "MPII3D_train_joint_coco_img_noise.json")
    joblib.dump({"img_name": np.array(feat_names),
                 "features": np.stack(feat_vals)},
                osp.join(root, "mpii3d_train_scale12_db.pt"))
    return truth


def build_mpii3d_val_mock(root: str, seed=3, n=20):
    """Mock MPII3D val: SPIN-order joints3D db + ViTPose json."""
    from pmce_tpu.data.kp_utils import get_joint_names

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    n_spin = len(get_joint_names("spin"))
    names, j3ds, feats, vit = [], [], [], []
    for i in range(n):
        name = f"val_video_0/img_{i:06d}.jpg"
        j3d = rng.normal(scale=0.4, size=(n_spin, 3)).astype(np.float32)
        kp = np.abs(rng.normal(scale=100, size=(17, 3))).astype(np.float32)
        names.append(name)
        j3ds.append(j3d)
        feats.append(rng.normal(size=2048).astype(np.float32))
        vit.append({"image_name": name, "keypoints": kp.tolist()})
    joblib.dump({"img_name": np.array(names),
                 "features": np.stack(feats),
                 "joints3D": np.stack(j3ds)},
                osp.join(root, "mpii3d_val_scale12_db.pt"))
    with open(osp.join(root, "vitpose_mpii3d_val_output.json"), "w") as fh:
        json.dump(vit, fh)
    return {"names": names, "j3ds": j3ds}


def build_coco_mock(root: str, art, jr_h36m, jr_coco, seed=4, n=12):
    """Mock COCO train2014 annotations + SMPLify fits + feature db."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    images, annots = [], []
    smplify: dict = {}
    feat_aids, feat_vals = [], []
    truth = {"frames": []}
    s_cam, t_cam = 140.0, np.array([320.0, 240.0], np.float32)
    for i in range(n):
        aid = 100 + i
        images.append({"id": i, "file_name": f"COCO_train2014_{i:012d}.jpg",
                       "width": 640, "height": 480})
        pose = rng.normal(scale=0.3, size=72).astype(np.float32)
        shape = rng.normal(scale=0.5, size=10).astype(np.float32)
        # Projected SMPL COCO joints (the converter's own projection) so
        # the mock can plant GOOD fits (even i) and BAD fits (odd i).
        verts_m, _ = smpl_verts_joints(art, pose[None], shape[None])
        jc17 = jr_coco @ (verts_m[0] * 1000.0)
        jimg17 = (jc17[:, :2] / 1000.0) * s_cam + t_cam
        offset = 0.1 if i % 2 == 0 else 300.0
        kp = np.concatenate(
            [jimg17 + offset, np.ones((17, 1), np.float32)], axis=1)
        ann = {"id": aid, "image_id": i, "iscrowd": 0,
               "num_keypoints": 17,
               "keypoints": kp.reshape(-1).tolist(),
               "bbox": [50.0, 40.0, 200.0, 300.0]}
        if i == 3:     # exercised skip: crowd annotation
            ann["iscrowd"] = 1
        annots.append(ann)
        if i == 5:     # exercised skip: no SMPLify fit
            feat_aids.append(aid)
            feat_vals.append(np.zeros(2048, np.float32))
            continue
        smplify[str(aid)] = {
            "smpl_param": {"pose": pose.tolist(), "shape": shape.tolist()},
            "cam_param": {"s": [s_cam], "t": t_cam.tolist()},
        }
        feat = rng.normal(size=2048).astype(np.float32)
        feat_aids.append(aid)
        feat_vals.append(feat)
        if ann["iscrowd"] == 0:
            truth["frames"].append(dict(aid=aid, pose=pose, shape=shape,
                                        feat=feat, good=(i % 2 == 0)))
    with open(osp.join(root, "person_keypoints_train2014.json"),
              "w") as fh:
        json.dump({"images": images, "annotations": annots}, fh)
    with open(osp.join(root, "coco_smplify_train.json"), "w") as fh:
        json.dump(smplify, fh)
    # Feature db rows align with non-crowd annotation order (aid asserts).
    keep = [j for j, a in enumerate(annots) if not a["iscrowd"]]
    joblib.dump({"img_name": np.array([f"i{j}" for j in keep]),
                 "features": np.stack([feat_vals[j] for j in keep]),
                 "aid": np.array([feat_aids[j] for j in keep])},
                osp.join(root, "coco_train_db.pt"))
    return truth


def build_mpii_mock(root: str, art, jr_h36m, jr_coco, seed=5, n=10):
    """Mock MPII train annotations + NeuralAnnot fits + feature db."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    images, annots = [], []
    fits: dict = {}
    feat_aids, feat_vals = [], []
    truth = {"frames": []}
    for i in range(n):
        aid = 200 + i
        images.append({"id": i, "file_name": f"images/{i:09d}.jpg",
                       "width": 1280, "height": 720})
        annots.append({"id": aid, "image_id": i, "iscrowd": 0,
                       "num_keypoints": 16,
                       "bbox": [100.0, 80.0, 300.0, 400.0]})
        pose = rng.normal(scale=0.3, size=72).astype(np.float32)
        shape = rng.normal(scale=0.5, size=10).astype(np.float32)
        trans = np.array([0.01 * i, 0.0, 4.0], np.float32)
        fits[str(aid)] = {
            "smpl_param": {"pose": pose.tolist(), "shape": shape.tolist(),
                           "trans": trans.tolist()},
            "cam_param": {"focal": [1500.0, 1500.0],
                          "princpt": [640.0, 360.0]},
        }
        feat = rng.normal(size=2048).astype(np.float32)
        feat_aids.append(aid)
        feat_vals.append(feat)
        truth["frames"].append(dict(aid=aid, pose=pose, shape=shape,
                                    trans=trans, feat=feat))
    with open(osp.join(root, "train.json"), "w") as fh:
        json.dump({"images": images, "annotations": annots}, fh)
    with open(osp.join(root, "MPII_train_SMPL_NeuralAnnot.json"),
              "w") as fh:
        json.dump(fits, fh)
    joblib.dump({"img_name": np.array([str(i) for i in range(n)]),
                 "features": np.stack(feat_vals),
                 "aid": np.array(feat_aids)},
                osp.join(root, "mpii_train_db.pt"))
    return truth
