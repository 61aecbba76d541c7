"""Independent float64 numpy oracles for numeric parity tests.

These re-derive the SMPL forward pass and rotation conversions directly from
the published model equations (SMPL, Loper et al. 2015) in plain numpy — an
implementation independent of both the reference repo and the JAX framework
under test — and serve as the ground truth the JAX code must match.
"""

from __future__ import annotations

import numpy as np


def rodrigues_np(axisang: np.ndarray) -> np.ndarray:
    """Axis-angle [N, 3] → rotation matrices [N, 3, 3] (float64).

    Half-angle quaternion construction with the same 1e-8 regularizer used
    on-device, so near-zero rotations agree.
    """
    axisang = axisang.astype(np.float64)
    angle = np.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = np.concatenate([np.cos(half), np.sin(half) * axis], axis=-1)
    quat = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z),
            2 * (w * z + x * y), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    return R


def smpl_forward_np(art, pose: np.ndarray, betas: np.ndarray,
                    trans: np.ndarray | None = None):
    """SMPL forward in float64 numpy, sequential kinematic chain.

    Args:
      art: SMPLArtifacts.
      pose: [B, 72]; betas: [B, 10]; trans: optional [B, 3].

    Returns:
      (verts [B, V, 3], joints [B, J, 3]) float64.
    """
    B = pose.shape[0]
    J = art.J_regressor.shape[0]
    V = art.v_template.shape[0]
    parents = art.kintree_parents

    v_template = art.v_template.astype(np.float64)
    shapedirs = art.shapedirs.astype(np.float64)
    posedirs = art.posedirs.astype(np.float64)
    J_reg = art.J_regressor.astype(np.float64)
    weights = art.lbs_weights.astype(np.float64)

    verts_out = np.zeros((B, V, 3))
    joints_out = np.zeros((B, J, 3))
    for b in range(B):
        R = rodrigues_np(pose[b].reshape(J, 3))  # [J,3,3]
        pose_map = (R[1:] - np.eye(3)).reshape(-1)  # [207]

        v_shaped = v_template + shapedirs @ betas[b].astype(np.float64)
        j_rest = J_reg @ v_shaped  # [J,3]
        v_posed = v_shaped + posedirs @ pose_map

        # Sequential chain, parent before child.
        A = np.zeros((J, 4, 4))
        A[0, :3, :3] = R[0]
        A[0, :3, 3] = j_rest[0]
        A[0, 3, 3] = 1.0
        for i in range(1, J):
            rel = np.zeros((4, 4))
            rel[:3, :3] = R[i]
            rel[:3, 3] = j_rest[i] - j_rest[parents[i]]
            rel[3, 3] = 1.0
            A[i] = A[parents[i]] @ rel
        joints = A[:, :3, 3].copy()

        A_skin = A.copy()
        A_skin[:, :3, 3] -= np.einsum("jmk,jk->jm", A[:, :3, :3], j_rest)

        T = np.einsum("vj,jmn->vmn", weights, A_skin)  # [V,4,4]
        verts = (
            np.einsum("vmk,vk->vm", T[:, :3, :3], v_posed) + T[:, :3, 3]
        )

        if trans is not None:
            verts = verts + trans[b]
            joints = joints + trans[b]
        verts_out[b] = verts
        joints_out[b] = joints
    return verts_out, joints_out


def similarity_align_np(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Procrustes similarity alignment of A onto B, [N, 3] each (float64).

    Same formulation as the framework's batched version (H = AᵀB/n, SVD,
    det sign fix on the last singular vector, scale = Σs / var(A)).
    """
    A = A.astype(np.float64)
    B = B.astype(np.float64)
    n = A.shape[0]
    mu_a, mu_b = A.mean(0), B.mean(0)
    H = (A - mu_a).T @ (B - mu_b) / n
    U, s, Vh = np.linalg.svd(H)
    V = Vh.T
    R = V @ U.T
    if np.linalg.det(R) < 0:
        s[-1] = -s[-1]
        V[:, -1] = -V[:, -1]
        R = V @ U.T
    var_a = np.var(A, axis=0).sum()
    c = s.sum() / var_a
    t = -c * R @ mu_a + mu_b
    return (c * R @ A.T).T + t


def layer_norm_np(x, gamma, beta, eps=1e-6):
    """Standard (biased-variance) LayerNorm over the last axis, float64."""
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return gamma * (x - mu) / np.sqrt(var + eps) + beta


def ada_layer_norm_np(x, gamma, beta, eps=1e-6):
    """AdaLayerNorm semantics: unbiased std, eps added OUTSIDE the sqrt.

    Matches /root/reference/lib/models/CoevoDecoder.py:23-29 (torch
    ``x.std(-1)`` defaults to the unbiased estimator, and the reference
    divides by ``std + eps`` rather than ``sqrt(var + eps)``).
    """
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    std = x.std(-1, ddof=1, keepdims=True)
    return gamma * (x - mu) / (std + eps) + beta


def softmax_np(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def attention_np(x, wq, wk, wv, wo, bq, bk, bv, bo, num_heads):
    """Multi-head self-attention, float64 (pre-softmax scale 1/sqrt(dh)).

    x: [B, N, C]; wq/wk/wv/wo: [C, C]; biases: [C].
    """
    B, N, C = x.shape
    dh = C // num_heads
    q = (x @ wq + bq).reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)
    k = (x @ wk + bk).reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)
    v = (x @ wv + bv).reshape(B, N, num_heads, dh).transpose(0, 2, 1, 3)
    attn = softmax_np((q @ k.transpose(0, 1, 3, 2)) * dh ** -0.5)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    return out @ wo + bo


def gru_cell_np(x, h, w_ih, w_hh, b_ih, b_hh):
    """One GRU step with torch gate conventions (r, z, n ordering).

    x: [B, I]; h: [B, H]; w_ih: [3H, I]; w_hh: [3H, H]; b_*: [3H].
    """
    H = h.shape[-1]
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = gi[:, :H], gi[:, H:2 * H], gi[:, 2 * H:]
    h_r, h_z, h_n = gh[:, :H], gh[:, H:2 * H], gh[:, 2 * H:]
    r = 1.0 / (1.0 + np.exp(-(i_r + h_r)))
    z = 1.0 / (1.0 + np.exp(-(i_z + h_z)))
    n = np.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h
