"""Parity against the ACTUAL reference sources (round-3 verdict weak #8).

tests/torch_reference.py re-declares the reference compute graph, so a
misreading of /root/reference replicated in both the oracle and the JAX
model would pass parity silently. Here the reference's own
lib/models/{PMCE,PoseEstimation,CoevoDecoder}.py are imported and run
(tests/reference_source.py provides the ~60-LoC timm shim + cfg stub +
synthetic on-disk artifacts in the reference's exact formats), and three
implementations must agree on identical weights:

    reference-source torch  ==  in-repo torch oracle  ==  JAX model

The decoder hard-codes its flagship widths (6890 in upsample_conv /
linear_cur*, 1024 GRU — CoevoDecoder.py:213-224), so the whole-PMCE test
runs at full flagship size (slow tier); the lifter, which is fully
parameterized, gets a fast-tier reduced-size test too.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from import_torch_checkpoint import import_pmce, import_pose_lifter  # noqa: E402

import torch_reference as oracle  # noqa: E402
from reference_source import load_reference_models  # noqa: E402

from pmce_tpu.models.pmce import PMCE  # noqa: E402
from pmce_tpu.models.pose_lifter import PoseLifter  # noqa: E402
from pmce_tpu.smpl.mesh import synthetic_coarsening  # noqa: E402


def _randomize(model: torch.nn.Module, seed: int) -> None:
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=gen) * 0.02)


def test_lifter_parity_reference_source(tmp_path):
    """Reference-source GraphormerNet == in-repo oracle == JAX PoseLifter
    at reduced width (embed 64, depth 3, J=17, T=16)."""
    rng = np.random.default_rng(11)
    mean_verts = rng.standard_normal((97, 3)).astype(np.float32) * 0.1
    jr = rng.random((17, 97)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    coarse = synthetic_coarsening(sizes=(97, 61, 31))

    with load_reference_models(tmp_path, mean_verts, jr,
                               coarse.D[0], coarse.D[1],
                               joint_dim=32, vertx_dim=32) as (
            _, PoseEstimation, _):
        ref = PoseEstimation.get_model(num_joint=17, embed_dim=64, depth=3,
                                       pretrained=False)
        _randomize(ref, 5)
        ref.eval()
        pose2d = rng.standard_normal((2, 16, 17, 2), dtype=np.float32)
        img_feat = rng.standard_normal((2, 16, 2048), dtype=np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(pose2d),
                          torch.from_numpy(img_feat)).numpy()
        sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    # in-repo oracle accepts the reference state_dict verbatim (strict).
    om = oracle.GraphormerNet(num_frames=16, num_joints=17, embed_dim=64,
                              depth=3)
    om.load_state_dict(sd, strict=True)
    om.eval()
    with torch.no_grad():
        out_oracle = om(torch.from_numpy(pose2d),
                        torch.from_numpy(img_feat)).numpy()
    np.testing.assert_allclose(out_oracle, out_ref, atol=1e-4, rtol=1e-4,
                               err_msg="in-repo oracle drifted from the "
                                       "reference sources")

    # JAX model through the real checkpoint mapping.
    params = import_pose_lifter({k: v.numpy() for k, v in sd.items()},
                                depth=3)
    jm = PoseLifter(num_joints=17, embed_dim=64, depth=3)
    out_jax = np.asarray(jm.apply({"params": params}, jnp.asarray(pose2d),
                                  jnp.asarray(img_feat), True))
    assert np.abs(out_ref).mean() > 1e-3
    np.testing.assert_allclose(out_jax, out_ref, atol=1e-4, rtol=1e-4,
                               err_msg="JAX lifter diverges from the "
                                       "reference sources")


@pytest.mark.slow
def test_whole_pmce_parity_reference_source(tmp_path):
    """Reference-source PMCE == in-repo oracle == JAX at FLAGSHIP size
    (embed 256, 431/6890 vertices, GRU 1024) on identical weights."""
    rng = np.random.default_rng(23)
    mean_verts = rng.standard_normal((6890, 3)).astype(np.float32) * 0.1
    jr = rng.random((17, 6890)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    coarse = synthetic_coarsening(sizes=(6890, 1723, 431))

    pose2d = rng.standard_normal((2, 16, 17, 2), dtype=np.float32)
    img_feat = rng.standard_normal((2, 16, 2048), dtype=np.float32)

    with load_reference_models(tmp_path, mean_verts, jr,
                               coarse.D[0], coarse.D[1],
                               joint_dim=64, vertx_dim=64) as (
            PMCE_ref, _, _):
        tm = PMCE_ref.get_model(num_joint=17, embed_dim=256, depth=3)
        # The reference leaves vj_relation as a float64 numpy array
        # (graph_utils.build_verts_joints_relation:33) and indexes a torch
        # tensor with it (CoevoDecoder.py:232) — torch 1.x coerced, this
        # torch raises. Integer-cast in place; values are whole numbers.
        vj = tm.pose_mesh_coevo.vj_relation.astype(np.int64)
        tm.pose_mesh_coevo.vj_relation = vj
        _randomize(tm, 7)
        tm.eval()
        with torch.no_grad():
            mesh_r, pose_r, pose3d_r = tm(torch.from_numpy(pose2d),
                                          torch.from_numpy(img_feat))
        sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}

    ref_out = (mesh_r.numpy(), pose_r.numpy(), pose3d_r.numpy())
    vj_relation = tuple(int(i) for i in vj)

    # --- in-repo torch oracle on the same weights ------------------------
    om = oracle.PMCE(17, 256, 3, vj_relation, num_vertx=431,
                     num_verts_full=6890, joint_dim=64, vertx_dim=64,
                     gru_hidden=1024, seqlen=16)
    missing, unexpected = om.load_state_dict(sd, strict=False)
    # Exact non-parameter delta: the reference keeps the 431-vertex mesh
    # template as a buffer it never uses in forward (CoevoDecoder.py:203);
    # the oracle keeps vj_relation as a buffer instead.
    assert set(missing) == {"pose_mesh_coevo.vj_relation"}, missing
    assert set(unexpected) == {"pose_mesh_coevo.init_vertices"}, unexpected
    om.eval()
    with torch.no_grad():
        oracle_out = tuple(t.numpy() for t in om(
            torch.from_numpy(pose2d), torch.from_numpy(img_feat)))
    for name, a, b in zip(("mesh", "evo_pose", "pose3d"), oracle_out,
                          ref_out):
        np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4,
            err_msg=f"{name}: in-repo oracle drifted from reference source")

    # --- JAX model through the real checkpoint mapping -------------------
    params = import_pmce({k: v.numpy() for k, v in sd.items()}, depth=3)
    jm = PMCE(num_joint=17, embed_dim=256, depth=3, vj_relation=vj_relation,
              num_vertx=431, num_verts_full=6890, joint_dim=64,
              vertx_dim=64, gru_hidden=1024, seqlen=16)
    jax_out = tuple(np.asarray(t) for t in jm.apply(
        {"params": params}, jnp.asarray(pose2d), jnp.asarray(img_feat),
        True))
    for name, a, b in zip(("mesh", "evo_pose", "pose3d"), jax_out, ref_out):
        assert np.abs(b).mean() > 1e-3, f"{name}: degenerate reference out"
        np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4,
            err_msg=f"{name}: JAX diverges from the reference sources")
