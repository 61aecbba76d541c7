#!/usr/bin/env python
"""Import reference torch checkpoints into pmce-tpu flax parameter trees.

Maps the reference's state_dict layout (/root/reference/lib/models/
PoseEstimation.py + CoevoDecoder.py module names; checkpoints saved by
main/train.py:57-64) onto this framework's parameter tree:

- torch ``Linear.weight`` [out, in] → flax ``Dense.kernel`` [in, out];
- timm fused-qkv attention maps 1:1 (q/k/v splits match the flax module);
- ``LayerNorm.weight`` → ``scale``;
- GRU ``weight_ih_l{k}[_reverse]`` → ``l{k}_{fwd,bwd}.ih.kernel`` (T);
- ``Conv1d.weight`` [out, in, k] → flax ``Conv.kernel`` [k, in, out];
- ``fusion`` Conv2d(T→1, 1×1) → the [T] fusion weight vector + scalar bias;
- DataParallel ``module.`` prefixes are stripped (reference
  funcs_utils.py:65-70).

Usage:
  python tools/import_torch_checkpoint.py ckpt.pth.tar out.ckpt \
      --model pmce --num-joint 19
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _strip_module(sd: dict) -> dict:
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _a(w) -> np.ndarray:
    return np.asarray(w)


def _dense(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]),
            "bias": _a(sd[f"{name}.bias"])}


def _ln(sd, name):
    return {"scale": _a(sd[f"{name}.weight"]),
            "bias": _a(sd[f"{name}.bias"])}


def _adaln(sd, name):
    return {"mlp_gamma": _dense(sd, f"{name}.mlp_gamma"),
            "mlp_beta": _dense(sd, f"{name}.mlp_beta")}


def _attn(sd, name):
    return {"qkv": _dense(sd, f"{name}.qkv"),
            "proj": _dense(sd, f"{name}.proj")}


def _mlp(sd, name):
    return {"fc1": _dense(sd, f"{name}.fc1"),
            "fc2": _dense(sd, f"{name}.fc2")}


def _block(sd, name):
    """timm-style Block with plain LayerNorms."""
    return {"norm1": _ln(sd, f"{name}.norm1"),
            "attn": _attn(sd, f"{name}.attn"),
            "norm2": _ln(sd, f"{name}.norm2"),
            "mlp": _mlp(sd, f"{name}.mlp")}


def _ada_block(sd, name):
    """Self-attention block with AdaLayerNorm conditioning."""
    return {"norm1": _adaln(sd, f"{name}.norm1"),
            "attn": _attn(sd, f"{name}.attn"),
            "norm2": _adaln(sd, f"{name}.norm2"),
            "mlp": _mlp(sd, f"{name}.mlp")}


def _cross_attn(sd, name):
    return {"wq": _dense(sd, f"{name}.wq"),
            "wk": _dense(sd, f"{name}.wk"),
            "wv": _dense(sd, f"{name}.wv"),
            "proj": _dense(sd, f"{name}.proj")}


def _ca_block(sd, name):
    return {"normq": _adaln(sd, f"{name}.normq"),
            "normk": _adaln(sd, f"{name}.normk"),
            "normv": _adaln(sd, f"{name}.normv"),
            "norm2": _adaln(sd, f"{name}.norm2"),
            "attn": _cross_attn(sd, f"{name}.attn"),
            "mlp": _mlp(sd, f"{name}.mlp")}


def import_pose_lifter(sd: dict, depth: int = 3) -> dict:
    """GraphormerNet state_dict → PoseLifter params."""
    out = {
        "joint_embed": _dense(sd, "joint_embed"),
        "imgfeat_embed": _dense(sd, "imgfeat_embed"),
        "spatial_pos_embed": _a(sd["spatial_pos_embed"]),
        "temporal_pos_embed": _a(sd["temporal_pos_embed"]),
        "norm_s": _ln(sd, "norm_s"),
        "norm_t": _ln(sd, "norm_t"),
        "head_norm": _ln(sd, "regression.0"),
        "head_proj": _dense(sd, "regression.1"),
        # Conv2d(T→1, 1×1): weight [1, T, 1, 1] → [T]; bias [1].
        "fusion_weight": _a(sd["fusion.weight"]).reshape(-1),
        "fusion_bias": _a(sd["fusion.bias"]).reshape(1),
    }
    for i in range(depth):
        out[f"spatial_block{i}"] = _block(sd, f"SpatialBlocks.{i}")
        out[f"temporal_block{i}"] = _block(sd, f"TemporalBlocks.{i}")
    return out


def _gru(sd: dict, name: str, num_layers: int = 2) -> dict:
    out = {}
    for layer in range(num_layers):
        for suffix, tag in (("", "fwd"), ("_reverse", "bwd")):
            out[f"l{layer}_{tag}"] = {
                "ih": {
                    "kernel": _t(sd[f"{name}.weight_ih_l{layer}{suffix}"]),
                    "bias": _a(sd[f"{name}.bias_ih_l{layer}{suffix}"]),
                },
                "hh": {
                    "kernel": _t(sd[f"{name}.weight_hh_l{layer}{suffix}"]),
                    "bias": _a(sd[f"{name}.bias_hh_l{layer}{suffix}"]),
                },
            }
    return out


def _coevo_block(sd: dict, name: str) -> dict:
    return {
        "joint_proj": _dense(sd, f"{name}.joint_proj"),
        "vertx_proj": _dense(sd, f"{name}.vertx_proj"),
        "joint_pos_embed": _a(sd[f"{name}.joint_pos_embed"]),
        "vertx_pos_embed": _a(sd[f"{name}.vertx_pos_embed"]),
        "j_Q_embed": _a(sd[f"{name}.j_Q_embed"]),
        "v_Q_embed": _a(sd[f"{name}.v_Q_embed"]),
        "v2j_K_embed": _a(sd[f"{name}.v2j_K_embed"]),
        "j2v_K_embed": _a(sd[f"{name}.j2v_K_embed"]),
        "proj_v2j_dim": _dense(sd, f"{name}.proj_v2j_dim"),
        "proj_j2v_dim": _dense(sd, f"{name}.proj_j2v_dim"),
        "joint_CA_FFN": _ca_block(sd, f"{name}.joint_CA_FFN"),
        "vertx_CA_FFN": _ca_block(sd, f"{name}.vertx_CA_FFN"),
        "joint_SA_FFN": _ada_block(sd, f"{name}.joint_SA_FFN"),
        "vertx_SA_FFN": _ada_block(sd, f"{name}.vertx_SA_FFN"),
        "proj_joint_feat2coor": _dense(sd, f"{name}.proj_joint_feat2coor"),
        "proj_vertx_feat2coor": _dense(sd, f"{name}.proj_vertx_feat2coor"),
    }


def import_coevo_decoder(sd: dict, num_blocks: int = 3) -> dict:
    out = {"gru_cur": _gru(sd, "gru_cur")}
    for i in range(1, num_blocks + 1):
        out[f"coevoblock{i}"] = _coevo_block(sd, f"coevoblock{i}")
    # Conv1d(431→6890, k=3): [out, in, k] → [k, in, out].
    out["upsample_conv"] = {
        "kernel": np.ascontiguousarray(
            np.asarray(sd["upsample_conv.weight"]).transpose(2, 1, 0)),
        "bias": _a(sd["upsample_conv.bias"]),
    }
    for i in (1, 2, 3):
        out[f"linear_cur{i}"] = _dense(sd, f"linear_cur{i}")
    return out


def import_pmce(sd: dict, depth: int = 3) -> dict:
    sd = _strip_module(sd)
    lifter_sd = {k[len("pose_lifter."):]: v for k, v in sd.items()
                 if k.startswith("pose_lifter.")}
    coevo_sd = {k[len("pose_mesh_coevo."):]: v for k, v in sd.items()
                if k.startswith("pose_mesh_coevo.")}
    return {
        "pose_lifter": import_pose_lifter(lifter_sd, depth),
        "pose_mesh_coevo": import_coevo_decoder(coevo_sd),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--model", choices=["pmce", "pose"], default="pmce")
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()
    sys.path.insert(0, ".")

    import torch

    from pmce_tpu.core.checkpoint import save_checkpoint

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw)
    sd = {k: v.numpy() for k, v in _strip_module(sd).items()}
    if args.model == "pmce":
        params = import_pmce(sd, args.depth)
    else:
        params = import_pose_lifter(sd, args.depth)
    import os

    out_dir = os.path.dirname(args.out) or "."
    written = save_checkpoint(out_dir, epoch=int(raw.get("epoch", 0)),
                              end_epoch=-1, payload={"params": params})
    # Honor the requested FILE name (save_checkpoint writes the epoch-
    # numbered name; the tool previously printed a path it never created).
    if os.path.abspath(written) != os.path.abspath(args.out):
        os.replace(written, args.out)
    print(f"imported {len(sd)} tensors → {args.out}")


if __name__ == "__main__":
    main()
