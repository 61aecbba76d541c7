"""Import SPIN (ResNet-50 HMR) and ViTPose torch checkpoints.

Mappings:
- SPIN: the reference demo loads ``spin_model_checkpoint.pth.tar['model']``
  into its HMR (torchvision-style names, /root/reference/lib/models/
  spin.py:18-143,356-361). conv weights [out,in,kh,kw] → NHWC [kh,kw,in,out];
  BatchNorm weight/bias → scale/bias and running stats → batch_stats;
  ``layer{s}.{b}`` → ``layer{s}_{b}``; ``downsample.0/1`` →
  ``down_conv``/``down_bn``; regressor fc1/fc2/decpose/decshape/deccam.
- ViTPose: the mmpose state dict the reference demo loads
  (/root/reference/main/run_demo.py:218-231): ``backbone.patch_embed.proj``,
  ``backbone.pos_embed`` (a leading cls slot, if present, is dropped),
  ``backbone.blocks.{i}`` transformer blocks, ``backbone.last_norm``,
  ``keypoint_head.deconv_layers.{0,3}`` (ConvTranspose2d) + BN
  ``{1,4}``, ``keypoint_head.final_layer``.

Usage:
  python tools/import_backbones.py spin ckpt.pth.tar out_dir
  python tools/import_backbones.py vitpose vitpose-h.pth out_dir
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse

import numpy as np


def _conv(w) -> np.ndarray:
    """torch Conv2d [out, in, kh, kw] → flax [kh, kw, in, out]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _deconv(w) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] → flax ConvTranspose kernel
    [kh, kw, OUT, IN] — the layout ``transpose_kernel=True`` expects (the
    flax flag that matches torch's gradient-of-conv definition)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _a(w) -> np.ndarray:
    return np.asarray(w)


def _dense(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]),
            "bias": _a(sd[f"{name}.bias"])}


def _bn(sd, name):
    params = {"scale": _a(sd[f"{name}.weight"]),
              "bias": _a(sd[f"{name}.bias"])}
    stats = {"mean": _a(sd[f"{name}.running_mean"]),
             "var": _a(sd[f"{name}.running_var"])}
    return params, stats


# --------------------------------------------------------------------- SPIN
def import_resnet50(sd: dict, layers=(3, 4, 6, 3)) -> dict:
    """Torchvision-style ResNet-50 state dict → ResNet50 flax variables."""
    params: dict = {"conv1": {"kernel": _conv(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for stage, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            p: dict = {}
            s: dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _conv(sd[f"{src}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                p["down_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = _bn(sd, f"{src}.downsample.1")
            params[dst] = p
            stats[dst] = s
    return {"params": params, "batch_stats": stats}


def import_spin_hmr(sd: dict, layers=(3, 4, 6, 3)) -> dict:
    """SPIN HMR checkpoint['model'] → HMR flax variables."""
    trunk = import_resnet50(sd, layers)
    params = {"backbone": trunk["params"],
              "regressor": {n: _dense(sd, n) for n in
                            ("fc1", "fc2", "decpose", "decshape", "deccam")}}
    return {"params": params,
            "batch_stats": {"backbone": trunk["batch_stats"]}}


# ------------------------------------------------------------------ ViTPose
def import_vitpose(sd: dict, depth: int) -> dict:
    """mmpose ViTPose state dict → ViTPose flax variables."""
    b = "backbone"
    pos = _a(sd[f"{b}.pos_embed"])
    params: dict = {
        "patch_embed": {
            "kernel": _conv(sd[f"{b}.patch_embed.proj.weight"]),
            "bias": _a(sd[f"{b}.patch_embed.proj.bias"]),
        },
        "norm": {"scale": _a(sd[f"{b}.last_norm.weight"]),
                 "bias": _a(sd[f"{b}.last_norm.bias"])},
    }
    stats: dict = {}

    for i in range(depth):
        src = f"{b}.blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": _a(sd[f"{src}.norm1.weight"]),
                      "bias": _a(sd[f"{src}.norm1.bias"])},
            "attn": {"qkv": _dense(sd, f"{src}.attn.qkv"),
                     "proj": _dense(sd, f"{src}.attn.proj")},
            "norm2": {"scale": _a(sd[f"{src}.norm2.weight"]),
                      "bias": _a(sd[f"{src}.norm2.bias"])},
            "mlp": {"fc1": _dense(sd, f"{src}.mlp.fc1"),
                    "fc2": _dense(sd, f"{src}.mlp.fc2")},
        }

    # mmpose ViT keeps a leading cls-token slot in pos_embed; drop it.
    # (ViTPose's forward adds pos_embed[:, 1:] to the patch tokens.)
    params["pos_embed"] = pos[:, 1:] if pos.shape[1] % 2 == 1 else pos

    h = "keypoint_head"
    for j, src_idx in enumerate((0, 3)):
        params[f"deconv{j}"] = {
            "kernel": _deconv(sd[f"{h}.deconv_layers.{src_idx}.weight"])}
        params[f"deconv_bn{j}"], stats[f"deconv_bn{j}"] = _bn(
            sd, f"{h}.deconv_layers.{src_idx + 1}")
    params["final"] = {"kernel": _conv(sd[f"{h}.final_layer.weight"]),
                       "bias": _a(sd[f"{h}.final_layer.bias"])}
    return {"params": params, "batch_stats": stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["spin", "vitpose"])
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--depth", type=int, default=32,
                    help="ViT depth (32 = huge)")
    args = ap.parse_args()

    import torch

    from pmce_tpu.core.checkpoint import save_checkpoint

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw.get("state_dict", raw))
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    if args.model == "spin":
        variables = import_spin_hmr(sd)
    else:
        variables = import_vitpose(sd, depth=args.depth)
    save_checkpoint(args.out_dir, epoch=0, end_epoch=-1,
                    payload={"variables": variables})
    print(f"imported {len(sd)} tensors → {args.out_dir}")


if __name__ == "__main__":
    main()
