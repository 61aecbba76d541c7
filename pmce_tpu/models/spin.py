"""ResNet-50 image encoder + iterative SMPL regressor (SPIN/HMR family).

Architecture parity target: /root/reference/lib/models/spin.py:18-306 —
a standard Bottleneck ResNet-50 trunk whose global-average-pooled 2048-d
feature (a) feeds the PMCE pipeline as the per-frame image feature and
(b) optionally drives a 3-iteration SMPL parameter regressor (24×6d pose +
10 shape + 3 weak-perspective camera), as in the SPIN checkpoint the
reference demo loads.

TPU notes: NHWC layout (XLA's native conv layout on TPU), BatchNorm with
frozen statistics at inference, the whole per-clip feature extraction is
one batched jitted call (the reference runs crop batches of 256 through
torch).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.ops.geometry import rot6d_to_rotmat

# Mean SMPL parameters would normally come from smpl_mean_params.npz; a
# neutral initialization (identity 6d rotations, zero shape, unit cam) is
# used when the artifact is absent. Kept as NUMPY: a module-level jnp op
# would initialize the JAX backend as an import side effect, breaking any
# entry point that must call jax.distributed.initialize() first.

_IDENT_6D = np.tile(np.asarray([1.0, 0, 0, 1.0, 0, 0], np.float32), 24)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        conv = lambda *a, **k: nn.Conv(*a, dtype=self.dtype, **k)  # noqa
        residual = x
        out = conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = conv(self.planes, (3, 3), strides=self.stride,
                   padding=1, use_bias=False, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = conv(self.planes * 4, (1, 1), use_bias=False,
                   name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1),
                            strides=self.stride, use_bias=False,
                            name="down_conv")(x)
            residual = norm("down_bn")(residual)
        return nn.relu(out + residual)


class ResNet50(nn.Module):
    """Bottleneck ResNet-50 trunk → 2048-d GAP feature.

    ``width`` scales all stages (64 = the real ResNet-50; tests shrink it).
    """

    layers: tuple = (3, 4, 6, 3)
    width: int = 64
    # Compute dtype (params stay f32). bf16 is the serving policy: conv
    # stacks ride the MXU at 2x; the GAP output is emitted f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, 3, 224, 224] (channel-first like the reference input) or
        [N, 224, 224, 3]; returns [N, width*32] (2048 at full width)."""
        if x.shape[1] == 3:
            x = jnp.transpose(x, (0, 2, 3, 1))           # → NHWC
        x = nn.Conv(self.width, (7, 7), strides=2, padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = tuple(self.width * m for m in (1, 2, 4, 8))
        for stage, (p, n_blocks) in enumerate(zip(planes, self.layers)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(p, stride=stride, downsample=(b == 0),
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
        # GAP accumulates and emits f32 regardless of compute dtype.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [N, 2048]


class SMPLRegressor(nn.Module):
    """Iterative (3-step) SMPL parameter regressor on a 2048-d feature."""

    n_iter: int = 3
    hidden: int = 1024

    @nn.compact
    def __call__(self, feat, init_pose=None, init_shape=None,
                 init_cam=None, train: bool = False):
        B = feat.shape[0]
        pose = (init_pose if init_pose is not None
                else jnp.tile(jnp.asarray(_IDENT_6D)[None], (B, 1)))
        shape = (init_shape if init_shape is not None
                 else jnp.zeros((B, 10)))
        cam = (init_cam if init_cam is not None
               else jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1)))

        fc1 = nn.Dense(self.hidden, name="fc1")
        fc2 = nn.Dense(self.hidden, name="fc2")
        decpose = nn.Dense(24 * 6, name="decpose",
                           kernel_init=nn.initializers.xavier_uniform())
        decshape = nn.Dense(10, name="decshape",
                            kernel_init=nn.initializers.xavier_uniform())
        deccam = nn.Dense(3, name="deccam",
                          kernel_init=nn.initializers.xavier_uniform())
        drop = nn.Dropout(0.5, deterministic=not train)

        for _ in range(self.n_iter):
            xc = jnp.concatenate([feat, pose, shape, cam], axis=1)
            xc = drop(fc1(xc))
            xc = drop(fc2(xc))
            pose = decpose(xc) + pose
            shape = decshape(xc) + shape
            cam = deccam(xc) + cam

        rotmat = rot6d_to_rotmat(pose.reshape(B * 24, 6)).reshape(
            B, 24, 3, 3)
        return {"rotmat": rotmat, "shape": shape, "cam": cam,
                "pose6d": pose}


class HMR(nn.Module):
    """Full HMR: ResNet-50 trunk + iterative regressor."""

    layers: tuple = (3, 4, 6, 3)
    width: int = 64
    hidden: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feat = ResNet50(layers=self.layers, width=self.width,
                        name="backbone")(x, train)
        out = SMPLRegressor(hidden=self.hidden,
                            name="regressor")(feat, train=train)
        if return_features:
            return feat, out
        return out


def feature_extractor_apply(params, images) -> jax.Array:
    """Jittable 2048-d feature extraction (reference spin.py:129-143)."""
    return ResNet50().apply(params, images)
