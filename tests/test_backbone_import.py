"""Torch-oracle tests for the SPIN ResNet-50 and ViTPose weight importers.

Tiny torch models are declared here with EXACTLY the reference state-dict
naming (torchvision-style HMR trunk, mmpose-style ViT + heatmap head),
randomly initialized, and compared against the flax models after the
mapping in tools/import_backbones.py. This is the real-checkpoint drill at
reduced width/depth — what validates that real SPIN / ViTPose-Huge weights
load correctly.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn as tnn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from import_backbones import (  # noqa: E402
    import_resnet50,
    import_spin_hmr,
    import_vitpose,
)

from pmce_tpu.models.spin import HMR, ResNet50  # noqa: E402
from pmce_tpu.models.vitpose import ViTPose, ViTPoseConfig  # noqa: E402

torch.manual_seed(0)


# ----------------------------------------------------------- torch oracles
class TorchBottleneck(tnn.Module):
    """Standard torchvision bottleneck (the reference re-declares it,
    /root/reference/lib/models/spin.py:18-56)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        residual = self.downsample(x) if self.downsample else x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + residual)


class TorchTrunk(tnn.Module):
    """ResNet trunk with torchvision naming, parameterizable depth."""

    def __init__(self, layers, width=8):
        super().__init__()
        self.inplanes = width
        self.conv1 = tnn.Conv2d(3, width, 7, stride=2, padding=3,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        planes = [width, width * 2, width * 4, width * 8]
        for s, (p, n) in enumerate(zip(planes, layers), start=1):
            setattr(self, f"layer{s}",
                    self._make_layer(p, n, stride=1 if s == 1 else 2))

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride,
                                  downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in (1, 2, 3, 4):
            x = getattr(self, f"layer{s}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(module):
    """Non-trivial running stats so the stats mapping is actually tested."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d,)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


# ------------------------------------------------------------------- tests
class TestResNetImport:
    LAYERS = (1, 1, 1, 1)
    WIDTH = 8

    @pytest.fixture(scope="class")
    def pair(self):
        tm = TorchTrunk(self.LAYERS, self.WIDTH).eval()
        _randomize_bn_stats(tm)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = import_resnet50(sd, self.LAYERS)
        fm = ResNet50(layers=self.LAYERS, width=self.WIDTH)
        return tm, fm, variables

    def test_tree_matches_init(self, pair):
        _, fm, variables = pair
        init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 48)))
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, variables))

    def test_forward_matches_torch(self, pair):
        tm, fm, variables = pair
        x = torch.randn(2, 3, 64, 48)
        with torch.no_grad():
            y_t = tm(x).numpy()
        y_j = np.asarray(fm.apply(variables, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)


class TestSPINImport:
    def test_hmr_regressor_roundtrip(self):
        """Regressor Dense mapping: torch Linear stack vs flax on the
        imported weights (trunk covered by TestResNetImport)."""
        layers, width = (1, 1, 1, 1), 8
        tm = TorchTrunk(layers, width).eval()
        _randomize_bn_stats(tm)
        feat_dim = width * 8 * 4
        reg = tnn.ModuleDict({
            "fc1": tnn.Linear(feat_dim + 24 * 6 + 13, 32),
            "fc2": tnn.Linear(32, 32),
            "decpose": tnn.Linear(32, 24 * 6),
            "decshape": tnn.Linear(32, 10),
            "deccam": tnn.Linear(32, 3),
        })
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        sd.update({f"{n}.{p}": v.detach().numpy()
                   for n, m in reg.items()
                   for p, v in m.state_dict().items()})
        variables = import_spin_hmr(sd, layers)
        model = HMR(layers=layers, width=width, hidden=32)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 48)))
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, variables))
        out = model.apply(variables, jnp.zeros((2, 3, 64, 48)))
        assert out["rotmat"].shape == (2, 24, 3, 3)


class TestViTPoseImport:
    CFG = ViTPoseConfig(img_size=(64, 48), patch_size=16, embed_dim=32,
                        depth=2, num_heads=2, deconv_channels=16)

    @pytest.fixture(scope="class")
    def pair(self):
        c = self.CFG
        gh, gw = c.grid
        n = gh * gw
        blocks = []
        sd = {}
        pe = tnn.Conv2d(3, c.embed_dim, c.patch_size, stride=c.patch_size)
        sd.update({f"backbone.patch_embed.proj.{k}": v.detach().numpy()
                   for k, v in pe.state_dict().items()})
        # mmpose keeps a cls slot in pos_embed; forward uses [:, 1:].
        pos = torch.randn(1, n + 1, c.embed_dim)
        sd["backbone.pos_embed"] = pos.numpy()
        for i in range(c.depth):
            blk = {
                "norm1": tnn.LayerNorm(c.embed_dim, eps=1e-6),
                "attn.qkv": tnn.Linear(c.embed_dim, 3 * c.embed_dim),
                "attn.proj": tnn.Linear(c.embed_dim, c.embed_dim),
                "norm2": tnn.LayerNorm(c.embed_dim, eps=1e-6),
                "mlp.fc1": tnn.Linear(c.embed_dim,
                                      int(c.embed_dim * c.mlp_ratio)),
                "mlp.fc2": tnn.Linear(int(c.embed_dim * c.mlp_ratio),
                                      c.embed_dim),
            }
            blocks.append(blk)
            for name, m in blk.items():
                sd.update({f"backbone.blocks.{i}.{name}.{k}":
                           v.detach().numpy()
                           for k, v in m.state_dict().items()})
        last_norm = tnn.LayerNorm(c.embed_dim, eps=1e-6)
        sd.update({f"backbone.last_norm.{k}": v.detach().numpy()
                   for k, v in last_norm.state_dict().items()})

        dc0 = tnn.ConvTranspose2d(c.embed_dim, c.deconv_channels, 4,
                                  stride=2, padding=1, bias=False)
        bn0 = tnn.BatchNorm2d(c.deconv_channels)
        dc1 = tnn.ConvTranspose2d(c.deconv_channels, c.deconv_channels, 4,
                                  stride=2, padding=1, bias=False)
        bn1 = tnn.BatchNorm2d(c.deconv_channels)
        fin = tnn.Conv2d(c.deconv_channels, c.num_keypoints, 1)
        with torch.no_grad():
            for bn in (bn0, bn1):
                bn.running_mean.normal_(0, 0.5)
                bn.running_var.uniform_(0.5, 2.0)
        for idx, m in ((0, dc0), (1, bn0), (3, dc1), (4, bn1)):
            sd.update({f"keypoint_head.deconv_layers.{idx}.{k}":
                       v.detach().numpy()
                       for k, v in m.state_dict().items()})
        sd.update({f"keypoint_head.final_layer.{k}": v.detach().numpy()
                   for k, v in fin.state_dict().items()})

        def torch_forward(x):
            with torch.no_grad():
                h = pe(x)                                    # [N, C, gh, gw]
                h = h.flatten(2).transpose(1, 2)             # [N, n, C]
                h = h + pos[:, 1:]
                for blk in blocks:
                    a = blk["norm1"](h)
                    B, N, C = a.shape
                    qkv = blk["attn.qkv"](a).reshape(
                        B, N, 3, c.num_heads, C // c.num_heads
                    ).permute(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    attn = (q @ k.transpose(-2, -1)) * (
                        (C // c.num_heads) ** -0.5)
                    attn = attn.softmax(dim=-1)
                    a = (attn @ v).transpose(1, 2).reshape(B, N, C)
                    h = h + blk["attn.proj"](a)
                    m = blk["norm2"](h)
                    m = blk["mlp.fc2"](
                        torch.nn.functional.gelu(blk["mlp.fc1"](m)))
                    h = h + m
                h = last_norm(h)
                h = h.transpose(1, 2).reshape(1 if h.shape[0] == 1
                                              else h.shape[0],
                                              c.embed_dim, gh, gw)
                h = torch.relu(bn0.eval()(dc0(h)))
                h = torch.relu(bn1.eval()(dc1(h)))
                return fin(h)

        variables = import_vitpose(sd, depth=c.depth)
        return torch_forward, variables

    def test_tree_matches_init(self, pair):
        _, variables = pair
        model = ViTPose(self.CFG)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 3, *self.CFG.img_size)))
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, variables))

    def test_forward_matches_torch(self, pair):
        torch_forward, variables = pair
        x = torch.randn(2, 3, *self.CFG.img_size)
        y_t = torch_forward(x).numpy()
        model = ViTPose(self.CFG)
        y_j = np.asarray(model.apply(variables, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-4)
