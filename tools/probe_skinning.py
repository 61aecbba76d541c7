"""Honest TPU timing: XLA two-step LBS vs the fused Pallas skinning kernel.

Decides the verdict's 'restructure to win or demote' question with forced-
execution timing (lazy scalar accumulation, one readback per trial).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import json
import sys
import time

import faulthandler

faulthandler.dump_traceback_later(560)


def main(B: int = 256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.kernels import fused_skinning
    from pmce_tpu.smpl.layer import SMPLModel, apply_skinning, skinning_transforms

    art = ensure_cached_artifacts()
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        model = SMPLModel.from_artifacts(art)
        pose = jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32)
        betas = jnp.asarray(rng.normal(size=(B, 10)), jnp.float32)
        v_posed, A_skin, _ = skinning_transforms(model, pose, betas)
        v_posed, A_skin = np.asarray(v_posed), np.asarray(A_skin)
    dev = jax.devices()[0]
    v_dev = jax.device_put(jnp.asarray(v_posed), dev)
    a_dev = jax.device_put(jnp.asarray(A_skin), dev)
    w_dev = jax.device_put(jnp.asarray(np.asarray(model.lbs_weights)), dev)

    @jax.jit
    def xla_path(v, a, w):
        return jnp.sum(apply_skinning(v, a, w))

    @jax.jit
    def pallas_path(v, a, w):
        return jnp.sum(fused_skinning(v, a, w))

    for name, f in (("xla", xla_path), ("pallas", pallas_path)):
        ref = float(f(v_dev, a_dev, w_dev))
        rates = []
        for _ in range(3):
            acc = f(v_dev, a_dev, w_dev) * 0.0
            t0 = time.time()
            for _ in range(32):
                acc = acc + f(v_dev, a_dev, w_dev)
            _ = float(acc)
            rates.append((time.time() - t0) / 32 * 1e3)
        print(json.dumps({"path": name, "batch": B,
                          "ms": round(float(np.median(rates)), 3),
                          "checksum": ref}), flush=True)


if __name__ == "__main__":
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
