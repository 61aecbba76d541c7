"""Mesh coarsening operator tests."""

import jax.numpy as jnp
import numpy as np

from pmce_tpu.smpl import mesh as mesh_lib


def _small_coarsening():
    return mesh_lib.synthetic_coarsening(sizes=(600, 150, 40))


def test_shapes_and_row_stochastic():
    m = _small_coarsening()
    assert m.sizes == (600, 150, 40)
    for d in m.D:
        np.testing.assert_allclose(d.sum(axis=1), 1.0, atol=1e-5)
    for u in m.U:
        np.testing.assert_allclose(u.sum(axis=1), 1.0, atol=1e-5)


def test_downsample_upsample(rng):
    m = _small_coarsening()
    x = rng.normal(size=(2, 600, 3)).astype(np.float32)
    d1 = mesh_lib.downsample(m, jnp.asarray(x), 0, 1)
    assert d1.shape == (2, 150, 3)
    d2 = mesh_lib.downsample(m, d1, 1, 2)
    assert d2.shape == (2, 40, 3)
    # Matches plain matmuls.
    np.testing.assert_allclose(
        np.asarray(d2), np.einsum("cm,bmk->bck", m.D[1],
                                  np.einsum("mf,bfk->bmk", m.D[0], x)),
        atol=1e-5,
    )
    up = mesh_lib.upsample(m, d2, 2, 0)
    assert up.shape == (2, 600, 3)


def test_constant_field_preserved(rng):
    """Row-stochastic operators preserve constant vertex fields exactly."""
    m = _small_coarsening()
    x = jnp.ones((1, 600, 3)) * 3.5
    d = mesh_lib.downsample(m, x, 0, 2)
    np.testing.assert_allclose(np.asarray(d), 3.5, atol=1e-5)
    u = mesh_lib.upsample(m, d, 2, 0)
    np.testing.assert_allclose(np.asarray(u), 3.5, atol=1e-5)


def test_save_load(tmp_path):
    m = _small_coarsening()
    p = str(tmp_path / "coarse.npz")
    m.save(p)
    m2 = mesh_lib.MeshCoarsening.load(p)
    for a, b in zip(m.D, m2.D):
        np.testing.assert_allclose(a, b)


def test_nearest_joint(rng):
    joints = rng.normal(size=(17, 3))
    verts = joints[np.arange(40) % 17] + rng.normal(scale=1e-4, size=(40, 3))
    rel = mesh_lib.nearest_joint_per_vertex(joints, verts)
    np.testing.assert_array_equal(rel, np.arange(40) % 17)


def test_artifacts_save_load(tmp_path, smpl_artifacts):
    p = str(tmp_path / "smpl.npz")
    smpl_artifacts.save(p)
    from pmce_tpu.smpl.artifacts import SMPLArtifacts

    art2 = SMPLArtifacts.load(p)
    np.testing.assert_allclose(art2.v_template, smpl_artifacts.v_template)
    np.testing.assert_array_equal(art2.kintree_parents,
                                  smpl_artifacts.kintree_parents)
