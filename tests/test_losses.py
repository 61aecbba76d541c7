"""Loss-function tests: reference semantics and gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.core import losses


def test_coord_l1_mask_semantics(rng):
    """Mask multiplies BOTH pred and target; mean over ALL elements."""
    pred = rng.normal(size=(2, 5, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 5, 3)).astype(np.float32)
    valid = np.ones((2, 5, 1), np.float32)
    valid[0, :2] = 0.0
    out = float(losses.coord_l1(jnp.asarray(pred), jnp.asarray(gt),
                                jnp.asarray(valid)))
    ref = np.abs(pred * valid - gt * valid).mean()
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_normal_loss_zero_for_identical(rng, smpl_artifacts):
    v = rng.normal(size=(2, smpl_artifacts.num_verts, 3)).astype(np.float32)
    faces = jnp.asarray(smpl_artifacts.faces)
    # Identical meshes: predicted edges lie in the GT face plane → |cos| is
    # 0 only for the two spanning edges; the third edge also lies in-plane.
    out = float(losses.normal_loss(jnp.asarray(v), jnp.asarray(v), faces))
    assert out < 1e-5


def test_edge_length_loss(rng, smpl_artifacts):
    v = rng.normal(size=(1, smpl_artifacts.num_verts, 3)).astype(np.float32)
    faces = jnp.asarray(smpl_artifacts.faces)
    assert float(losses.edge_length_loss(jnp.asarray(v), jnp.asarray(v),
                                         faces)) == 0.0
    # Uniform scaling by 2 changes every edge length by its own length.
    out = float(losses.edge_length_loss(jnp.asarray(2 * v), jnp.asarray(v),
                                        faces))
    assert out > 0


def test_laplacian(rng, smpl_artifacts):
    L = losses.build_laplacian(smpl_artifacts.faces,
                               smpl_artifacts.num_verts)
    v = rng.normal(size=(2, smpl_artifacts.num_verts, 3)).astype(np.float32)
    out = float(losses.laplacian_loss(jnp.asarray(L), jnp.asarray(v)))
    assert np.isfinite(out) and out >= 0
    # A constant mesh has zero Laplacian coordinates.
    const = jnp.ones((1, smpl_artifacts.num_verts, 3))
    assert float(losses.laplacian_loss(jnp.asarray(L), const)) < 1e-8


def test_total_loss_terms_and_edge_gate(rng, smpl_artifacts):
    B, V, J = 2, smpl_artifacts.num_verts, 17
    mesh = rng.normal(size=(B, V, 3)).astype(np.float32) * 0.1
    gt_mesh = mesh * 1.2 + 0.01  # scaled → nonzero edge-length deltas
    evo = rng.normal(size=(B, J, 3)).astype(np.float32) * 0.1
    pose3d = rng.normal(size=(B, J, 3)).astype(np.float32) * 100
    gt_lift = rng.normal(size=(B, J, 3)).astype(np.float32) * 100
    gt_reg = rng.normal(size=(B, J, 3)).astype(np.float32) * 100
    ones_j = jnp.ones((B, J, 1))
    ones_v = jnp.ones((B, V, 1))
    jreg = rng.random(size=(J, V)).astype(np.float32)
    jreg /= jreg.sum(1, keepdims=True)
    faces = jnp.asarray(smpl_artifacts.faces)

    args = (jnp.asarray(mesh), jnp.asarray(evo), jnp.asarray(pose3d),
            jnp.asarray(gt_mesh), jnp.asarray(gt_lift), jnp.asarray(gt_reg),
            ones_v, ones_j, ones_j, faces, jnp.asarray(jreg),
            0.1, 20.0, 1e-3)
    total_on, terms = losses.pmce_total_loss(*args, use_edge_loss=1.0)
    total_off, _ = losses.pmce_total_loss(*args, use_edge_loss=0.0)
    np.testing.assert_allclose(
        float(total_on - total_off), float(terms["edge"]),
        rtol=1e-3, atol=1e-6)
    expected = sum(float(terms[k]) for k in
                   ("vertex", "normal", "edge", "reg_joint", "evo_joint",
                    "lift_joint"))
    np.testing.assert_allclose(float(total_on), expected, rtol=1e-5)


def test_losses_differentiable(rng, smpl_artifacts):
    faces = jnp.asarray(smpl_artifacts.faces)
    v = jnp.asarray(rng.normal(size=(1, smpl_artifacts.num_verts, 3)),
                    jnp.float32)
    gt = v + 0.01

    g = jax.grad(lambda x: losses.normal_loss(x, gt, faces))(v)
    assert bool(jnp.all(jnp.isfinite(g)))
    g = jax.grad(lambda x: losses.edge_length_loss(x, gt, faces))(v)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_fused_face_losses_match(rng, smpl_artifacts):
    """build_face_losses must match the separate losses in value AND grad."""
    import jax
    import jax.numpy as jnp

    faces = smpl_artifacts.faces
    V = smpl_artifacts.num_verts
    fused = losses.build_face_losses(faces, V)
    m = jnp.asarray(rng.normal(size=(2, V, 3)), jnp.float32) * 0.1
    gt = m * 1.15 + 0.01
    faces_j = jnp.asarray(faces)

    ln_f, le_f = fused(m, gt)
    np.testing.assert_allclose(
        float(ln_f), float(losses.normal_loss(m, gt, faces_j)), rtol=1e-5)
    np.testing.assert_allclose(
        float(le_f), float(losses.edge_length_loss(m, gt, faces_j)),
        rtol=1e-5)

    def tot_fused(x):
        a, b = fused(x, gt)
        return 0.1 * a + 20.0 * b

    def tot_ref(x):
        return (0.1 * losses.normal_loss(x, gt, faces_j)
                + 20.0 * losses.edge_length_loss(x, gt, faces_j))

    ga = jax.grad(tot_fused)(m)
    gb = jax.grad(tot_ref)(m)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=2e-4, rtol=1e-3)
    # gt gradient contract: fused returns zeros for the target argument.
    ggt = jax.grad(
        lambda g: 0.1 * fused(m, g)[0] + 20.0 * fused(m, g)[1])(gt)
    np.testing.assert_allclose(np.asarray(ggt), 0.0)
