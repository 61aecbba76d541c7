"""Torch re-declaration of the FULL reference PMCE forward (test oracle).

This module rebuilds, in torch, the exact compute graph of the reference
model stack — /root/reference/lib/models/PMCE.py:7-26,
PoseEstimation.py:13-120 and CoevoDecoder.py:16-251 — including the timm
pieces the reference imports (``Mlp``/``Attention``/``DropPath`` from
timm.models.vision_transformer; ~60 LoC, vendored here because timm is not
installed in this image). Parameter names match the reference's state_dict
layout so weights flow through the real checkpoint mapping
(tools/import_torch_checkpoint.import_pmce) untouched.

Deviations from the reference, all non-numerical:
- einops rearranges are expressed as reshape/permute (same layouts);
- ``Pose2Mesh`` takes its vertex-template metadata (``vj_relation``,
  ``num_vertx``, ``num_verts_full``, GRU width) as constructor args instead
  of loading .npy artifacts from disk (CoevoDecoder.py:199-209);
- everything runs on CPU in eval mode (Dropout/DropPath are no-ops, exactly
  as at reference inference time).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Vendored timm semantics (timm.models.vision_transformer Mlp/Attention and
# timm.models.layers DropPath), as imported by the reference at
# PoseEstimation.py:9-10 and CoevoDecoder.py:6-7.
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features, act_layer=nn.GELU,
                 drop=0.0):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, in_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class TimmAttention(nn.Module):
    """timm's fused-qkv multi-head self-attention."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = self.attn_drop(attn.softmax(dim=-1))
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj_drop(self.proj(x))


class DropPath(nn.Module):
    """Stochastic depth; identity in eval mode (the only mode used here)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if not self.training or self.drop_prob == 0.0:
            return x
        keep = 1.0 - self.drop_prob
        mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
        return x * mask / keep


# ---------------------------------------------------------------------------
# Stage 1: GraphormerNet (PoseEstimation.py:13-120)
# ---------------------------------------------------------------------------

class LifterBlock(nn.Module):
    """Pre-norm transformer block (PoseEstimation.py:13-29)."""

    def __init__(self, dim, num_heads, mlp_ratio=2.0, qkv_bias=True,
                 drop_path=0.0, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or (lambda d: nn.LayerNorm(d, eps=1e-6))
        self.norm1 = norm_layer(dim)
        self.attn = TimmAttention(dim, num_heads=num_heads,
                                  qkv_bias=qkv_bias)
        self.drop_path = DropPath(drop_path) if drop_path > 0 else nn.Identity()
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


class GraphormerNet(nn.Module):
    """Spatio-temporal 2D→3D lifter (PoseEstimation.py:31-120)."""

    def __init__(self, num_frames=16, num_joints=17, embed_dim=256, depth=3,
                 num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                 drop_path_rate=0.2):
        super().__init__()
        norm_layer = lambda d: nn.LayerNorm(d, eps=1e-6)  # noqa: E731
        self.depth = depth
        self.joint_embed = nn.Linear(2, embed_dim)
        self.imgfeat_embed = nn.Linear(2048, embed_dim)
        self.spatial_pos_embed = nn.Parameter(
            torch.zeros(1, num_joints, embed_dim))
        self.temporal_pos_embed = nn.Parameter(
            torch.zeros(1, num_frames, embed_dim))
        self.pos_drop = nn.Dropout(0.0)
        dpr = torch.linspace(0, drop_path_rate, depth).tolist()
        self.SpatialBlocks = nn.ModuleList([
            LifterBlock(embed_dim, num_heads, mlp_ratio, qkv_bias, dpr[i],
                        norm_layer) for i in range(depth)])
        self.TemporalBlocks = nn.ModuleList([
            LifterBlock(embed_dim, num_heads, mlp_ratio, qkv_bias, dpr[i],
                        norm_layer) for i in range(depth)])
        self.norm_s = norm_layer(embed_dim)
        self.norm_t = norm_layer(embed_dim)
        # torch default LayerNorm eps (1e-5) in the head — a reference quirk
        # (regression is built with bare nn.LayerNorm, PoseEstimation.py:64).
        self.regression = nn.Sequential(
            nn.LayerNorm(embed_dim), nn.Linear(embed_dim, 3))
        self.fusion = nn.Conv2d(num_frames, 1, kernel_size=1)

    def forward(self, x, img_feat):
        b, t, j, _ = x.shape
        # SpaTemHead (PoseEstimation.py:76-93)
        x = self.joint_embed(x.reshape(b * t, j, -1))
        x = x + self.imgfeat_embed(img_feat).reshape(b * t, 1, -1)
        x = x + self.spatial_pos_embed
        x = self.norm_s(self.SpatialBlocks[0](self.pos_drop(x)))
        c = x.shape[-1]
        x = x.reshape(b, t, j, c).permute(0, 2, 1, 3).reshape(b * j, t, c)
        x = x + self.temporal_pos_embed
        x = self.norm_t(self.TemporalBlocks[0](self.pos_drop(x)))
        # remaining interleaved pairs (PoseEstimation.py:99-107)
        for i in range(1, self.depth):
            x = x.reshape(b, j, t, c).permute(0, 2, 1, 3).reshape(b * t, j, c)
            x = self.norm_s(self.SpatialBlocks[i](x))
            x = x.reshape(b, t, j, c).permute(0, 2, 1, 3).reshape(b * j, t, c)
            x = self.norm_t(self.TemporalBlocks[i](x))
        x = x.reshape(b, j, t, c).permute(0, 2, 1, 3)     # [b, t, j, c]
        x = self.regression(x).view(b, t, j, -1)
        return self.fusion(x).squeeze(1)                  # [b, j, 3] (mm)


# ---------------------------------------------------------------------------
# Stage 2: Pose2Mesh (CoevoDecoder.py:16-251)
# ---------------------------------------------------------------------------

class AdaLayerNorm(nn.Module):
    """Image-feature-conditioned LN; unbiased std, eps OUTSIDE the sqrt
    (CoevoDecoder.py:16-29). ``cond_dim`` is 2048 in the reference (the
    BiGRU's 2×1024 output width); parameterized for reduced-size tests."""

    def __init__(self, num_features, eps=1e-6, cond_dim=2048):
        super().__init__()
        self.mlp_gamma = nn.Linear(cond_dim, num_features)
        self.mlp_beta = nn.Linear(cond_dim, num_features)
        self.eps = eps

    def forward(self, x, img_feat):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)
        gamma = self.mlp_gamma(img_feat).unsqueeze(1)
        beta = self.mlp_beta(img_feat).unsqueeze(1)
        return gamma * (x - mean) / (std + self.eps) + beta


class CrossAttention(nn.Module):
    """Q from one stream, K/V from the other; V keeps its own width
    (CoevoDecoder.py:31-64)."""

    def __init__(self, dim, v_dim, kv_num, num_heads=8, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.kv_num = kv_num
        self.scale = (dim // num_heads) ** -0.5
        self.wq = nn.Linear(dim, dim, bias=qkv_bias)
        self.wk = nn.Linear(dim, dim, bias=qkv_bias)
        self.wv = nn.Linear(v_dim, v_dim, bias=qkv_bias)
        self.proj = nn.Linear(v_dim, dim)

    def forward(self, xq, xk, xv):
        B, N, C = xq.shape
        H, M = self.num_heads, self.kv_num
        v_dim = xv.shape[-1]
        q = self.wq(xq).reshape(B, N, H, C // H).permute(0, 2, 1, 3)
        k = self.wk(xk).reshape(B, M, H, C // H).permute(0, 2, 1, 3)
        v = self.wv(xv).reshape(B, M, H, v_dim // H).permute(0, 2, 1, 3)
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, v_dim)
        return self.proj(x)


class CrossAttentionBlock(nn.Module):
    """AdaLN'd cross-attention + FFN (CoevoDecoder.py:66-89)."""

    def __init__(self, q_dim, k_dim, v_dim, kv_num, num_heads,
                 mlp_ratio=4.0, qkv_bias=True, drop_path=0.2, cond_dim=2048):
        super().__init__()
        self.normq = AdaLayerNorm(q_dim, cond_dim=cond_dim)
        self.normk = AdaLayerNorm(k_dim, cond_dim=cond_dim)
        self.normv = AdaLayerNorm(v_dim, cond_dim=cond_dim)
        self.attn = CrossAttention(q_dim, v_dim, kv_num, num_heads, qkv_bias)
        self.drop_path = DropPath(drop_path) if drop_path > 0 else nn.Identity()
        self.norm2 = AdaLayerNorm(q_dim, cond_dim=cond_dim)
        self.mlp = Mlp(q_dim, int(q_dim * mlp_ratio))

    def forward(self, xq, xk, xv, img_feat):
        xq = xq + self.drop_path(self.attn(
            self.normq(xq, img_feat), self.normk(xk, img_feat),
            self.normv(xv, img_feat)))
        return xq + self.drop_path(self.mlp(self.norm2(xq, img_feat)))


class AdaBlock(nn.Module):
    """Self-attention block with AdaLayerNorms (CoevoDecoder.py:91-110)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                 drop_path=0.2, cond_dim=2048):
        super().__init__()
        self.norm1 = AdaLayerNorm(dim, cond_dim=cond_dim)
        self.attn = TimmAttention(dim, num_heads=num_heads,
                                  qkv_bias=qkv_bias)
        self.drop_path = DropPath(drop_path) if drop_path > 0 else nn.Identity()
        self.norm2 = AdaLayerNorm(dim, cond_dim=cond_dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, img_feat):
        x = x + self.drop_path(self.attn(self.norm1(x, img_feat)))
        return x + self.drop_path(self.mlp(self.norm2(x, img_feat)))


class CoevoBlock(nn.Module):
    """Bidirectional joint↔vertex co-evolution (CoevoDecoder.py:137-191)."""

    def __init__(self, num_joint, num_vertx, joint_dim=64, vertx_dim=64,
                 cond_dim=2048):
        super().__init__()
        joint_heads, vertx_heads = 8, 2
        self.joint_proj = nn.Linear(3, joint_dim)
        self.vertx_proj = nn.Linear(3, vertx_dim)
        self.joint_pos_embed = nn.Parameter(
            torch.randn(1, num_joint, joint_dim))
        self.vertx_pos_embed = nn.Parameter(
            torch.randn(1, num_vertx, vertx_dim))
        self.j_Q_embed = nn.Parameter(torch.randn(1, num_joint, joint_dim))
        self.v_Q_embed = nn.Parameter(torch.randn(1, num_vertx, vertx_dim))
        self.proj_v2j_dim = nn.Linear(vertx_dim, joint_dim)
        self.proj_j2v_dim = nn.Linear(joint_dim, vertx_dim)
        self.v2j_K_embed = nn.Parameter(torch.randn(1, num_vertx, joint_dim))
        self.j2v_K_embed = nn.Parameter(torch.randn(1, num_joint, vertx_dim))
        self.joint_SA_FFN = AdaBlock(joint_dim, joint_heads,
                                     cond_dim=cond_dim)
        self.vertx_SA_FFN = AdaBlock(vertx_dim, vertx_heads,
                                     cond_dim=cond_dim)
        self.joint_CA_FFN = CrossAttentionBlock(
            joint_dim, joint_dim, vertx_dim, num_vertx, joint_heads,
            cond_dim=cond_dim)
        self.vertx_CA_FFN = CrossAttentionBlock(
            vertx_dim, vertx_dim, joint_dim, num_joint, vertx_heads,
            cond_dim=cond_dim)
        self.proj_joint_feat2coor = nn.Linear(joint_dim, 3)
        self.proj_vertx_feat2coor = nn.Linear(vertx_dim, 3)

    def forward(self, joint, vertx, img_feat):
        joint_feat = self.joint_proj(joint) + self.joint_pos_embed
        vertx_feat = self.vertx_proj(vertx) + self.vertx_pos_embed
        # Simultaneous update: both cross-attentions consume the PRE-update
        # features of the other stream (CoevoDecoder.py:183-184).
        joint_feat, vertx_feat = (
            self.joint_CA_FFN(joint_feat + self.j_Q_embed,
                              self.proj_v2j_dim(vertx_feat) + self.v2j_K_embed,
                              vertx_feat, img_feat),
            self.vertx_CA_FFN(vertx_feat + self.v_Q_embed,
                              self.proj_j2v_dim(joint_feat) + self.j2v_K_embed,
                              joint_feat, img_feat),
        )
        joint_feat = self.joint_SA_FFN(joint_feat, img_feat)
        vertx_feat = self.vertx_SA_FFN(vertx_feat, img_feat)
        joint = self.proj_joint_feat2coor(joint_feat) + joint[:, :, :3]
        vertx = self.proj_vertx_feat2coor(vertx_feat) + vertx[:, :, :3]
        return joint, vertx


class Pose2Mesh(nn.Module):
    """Co-evolution decoder (CoevoDecoder.py:193-251). Template metadata
    (431-vertex nearest-joint relation) is injected instead of loaded from
    .npy artifacts."""

    def __init__(self, num_joint, vj_relation, num_vertx=431,
                 num_verts_full=6890, joint_dim=64, vertx_dim=64,
                 gru_hidden=1024, seqlen=16):
        super().__init__()
        self.seqlen = seqlen
        self.register_buffer(
            "vj_relation", torch.as_tensor(vj_relation, dtype=torch.long))
        cond_dim = gru_hidden * 2
        self.coevoblock1 = CoevoBlock(num_joint, num_vertx, joint_dim,
                                      vertx_dim, cond_dim)
        self.coevoblock2 = CoevoBlock(num_joint, num_vertx, joint_dim,
                                      vertx_dim, cond_dim)
        self.coevoblock3 = CoevoBlock(num_joint, num_vertx, joint_dim,
                                      vertx_dim, cond_dim)
        self.upsample_conv = nn.Conv1d(num_vertx, num_verts_full,
                                       kernel_size=3, padding=1)
        self.gru_cur = nn.GRU(input_size=2048, hidden_size=gru_hidden,
                              bidirectional=True, num_layers=2)
        self.linear_cur1 = nn.Linear(gru_hidden * 2, num_verts_full)
        self.linear_cur2 = nn.Linear(gru_hidden * 2, num_verts_full)
        self.linear_cur3 = nn.Linear(gru_hidden * 2, num_verts_full)

    def forward(self, joints, img_feats):
        y, _ = self.gru_cur(img_feats.permute(1, 0, 2))   # [T, B, 2H]
        img_feat = y[self.seqlen // 2]
        vertxs = joints[:, self.vj_relation, :3]
        # Every block re-consumes the ORIGINAL lifted joints; only vertices
        # chain (CoevoDecoder.py:235-237).
        joints1, vertxs = self.coevoblock1(joints, vertxs, img_feat)
        joints2, vertxs = self.coevoblock2(joints, vertxs, img_feat)
        joints3, vertxs = self.coevoblock3(joints, vertxs, img_feat)
        vertxs = self.upsample_conv(vertxs)
        mid = F.relu(img_feat)
        res = torch.cat([self.linear_cur1(mid).unsqueeze(-1),
                         self.linear_cur2(mid).unsqueeze(-1),
                         self.linear_cur3(mid).unsqueeze(-1)], dim=-1)
        return joints3, vertxs + res


class PMCE(nn.Module):
    """Composed two-stage model (PMCE.py:7-20)."""

    def __init__(self, num_joint, embed_dim, depth, vj_relation,
                 num_vertx=431, num_verts_full=6890, joint_dim=64,
                 vertx_dim=64, gru_hidden=1024, seqlen=16):
        super().__init__()
        self.num_joint = num_joint
        self.pose_lifter = GraphormerNet(
            num_frames=seqlen, num_joints=num_joint, embed_dim=embed_dim,
            depth=depth)
        self.pose_mesh_coevo = Pose2Mesh(
            num_joint, vj_relation, num_vertx, num_verts_full, joint_dim,
            vertx_dim, gru_hidden, seqlen)

    def forward(self, pose2d, img_feat):
        pose3d = self.pose_lifter(pose2d, img_feat)
        pose3d = pose3d.reshape(-1, self.num_joint, 3)
        cam_pose, cam_mesh = self.pose_mesh_coevo(pose3d / 1000, img_feat)
        return cam_mesh, cam_pose, pose3d
