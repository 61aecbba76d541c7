"""SMPL layer parity: JAX forward vs independent float64 numpy oracle."""

import jax.numpy as jnp
import numpy as np

from pmce_tpu.smpl.artifacts import kintree_levels, synthetic_artifacts
from pmce_tpu.smpl.layer import SMPLModel, regress_joints, smpl_forward

from oracles import smpl_forward_np


def _random_pose(rng, batch):
    pose = rng.normal(scale=0.4, size=(batch, 72)).astype(np.float32)
    betas = rng.normal(scale=1.0, size=(batch, 10)).astype(np.float32)
    trans = rng.normal(scale=0.5, size=(batch, 3)).astype(np.float32)
    return pose, betas, trans


def test_forward_matches_oracle(rng, smpl_artifacts, smpl_model):
    pose, betas, trans = _random_pose(rng, 4)
    verts, joints = smpl_forward(smpl_model, jnp.asarray(pose),
                                 jnp.asarray(betas), jnp.asarray(trans))
    verts_np, joints_np = smpl_forward_np(smpl_artifacts, pose, betas, trans)
    # float32 device vs float64 oracle: agreement well under 0.01 mm.
    np.testing.assert_allclose(np.asarray(verts), verts_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), joints_np, atol=1e-5)


def test_forward_no_trans(rng, smpl_artifacts, smpl_model):
    pose, betas, _ = _random_pose(rng, 2)
    verts, joints = smpl_forward(smpl_model, jnp.asarray(pose),
                                 jnp.asarray(betas))
    verts_np, joints_np = smpl_forward_np(smpl_artifacts, pose, betas, None)
    np.testing.assert_allclose(np.asarray(verts), verts_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(joints), joints_np, atol=1e-5)


def test_zero_pose_is_rest(smpl_artifacts, smpl_model):
    pose = jnp.zeros((1, 72))
    betas = jnp.zeros((1, 10))
    verts, joints = smpl_forward(smpl_model, pose, betas)
    np.testing.assert_allclose(
        np.asarray(verts[0]), smpl_artifacts.v_template, atol=1e-5
    )
    rest_joints = smpl_artifacts.J_regressor @ smpl_artifacts.v_template
    np.testing.assert_allclose(np.asarray(joints[0]), rest_joints, atol=1e-5)


def test_global_rotation_rotates_everything(rng, smpl_model):
    """A root-only rotation must rigidly rotate the rest mesh about joint 0."""
    pose = np.zeros((1, 72), dtype=np.float32)
    pose[0, :3] = [0.0, np.pi / 2, 0.0]
    verts, joints = smpl_forward(smpl_model, jnp.asarray(pose),
                                 jnp.zeros((1, 10)))
    verts0, joints0 = smpl_forward(smpl_model, jnp.zeros((1, 72)),
                                   jnp.zeros((1, 10)))
    root = np.asarray(joints0[0, 0])
    R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], dtype=np.float64)
    expected = (np.asarray(verts0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=1e-4)


def test_kintree_levels():
    art = synthetic_artifacts(num_verts=96, num_faces=24)
    levels = kintree_levels(art.kintree_parents)
    assert list(levels[0]) == [0]
    seen = set()
    for lvl in levels:
        for j in lvl:
            if j != 0:
                assert int(art.kintree_parents[j]) in seen
            seen.add(int(j))
    assert seen == set(range(24))


def test_regress_joints(rng, smpl_artifacts, smpl_model):
    verts = rng.normal(size=(2, smpl_artifacts.num_verts, 3)).astype(np.float32)
    out = regress_joints(smpl_model.J_regressor, jnp.asarray(verts))
    expected = np.einsum("jv,bvc->bjc", smpl_artifacts.J_regressor, verts)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
