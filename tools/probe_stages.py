"""One-off probe: per-stage timing of the PMCE forward on TPU (honest)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import faulthandler
import json
import sys
import time

faulthandler.dump_traceback_later(560)


def main(dtype_name: str, B: int, fused: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.models.coevo import CoevolutionDecoder
    from pmce_tpu.models.layers import BiGRU
    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.models.pose_lifter import PoseLifter
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    pmce, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                          dtype=dtype)

    rng = np.random.default_rng(0)
    T, J = 16, 19
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    def bench_one(name, model, init_args, call_args):
        with jax.default_device(cpu):
            params = jax.jit(model.init, backend="cpu")(
                jax.random.PRNGKey(0), *init_args)
        params = jax.device_put(params, dev)
        args = jax.device_put(call_args, dev)

        def f(params, *a):
            out = model.apply(params, *a)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        jf = jax.jit(f)
        _ = float(jf(params, *args))
        rates = []
        for _ in range(3):
            # Lazy accumulation + ONE readback: per-call host syncs cost
            # ~30 ms RTT over the dev tunnel and would swamp the compute.
            acc = jf(params, *args) * 0.0
            t0 = time.time()
            for _ in range(16):
                acc = acc + jf(params, *args)
            _ = float(acc)
            rates.append((time.time() - t0) / 16 * 1000.0)
        print(json.dumps({"stage": name, "dtype": dtype_name, "batch": B,
                          "fused": fused,
                          "ms": round(float(np.median(rates)), 2)}),
              flush=True)

    pose2d = np.random.default_rng(0).normal(size=(B, T, J, 2)).astype(np.float32)
    img_feat = rng.normal(size=(B, T, 2048)).astype(np.float32)
    pose3d = rng.normal(size=(B, J, 3)).astype(np.float32)

    lifter = PoseLifter(num_joints=J, num_frames=T, embed_dim=256, depth=3,
                        dtype=dtype, fused_attn=fused)
    bench_one("lifter", lifter, (jnp.zeros((1, T, J, 2)), jnp.zeros((1, T, 2048))),
              (pose2d, img_feat))

    dec = CoevolutionDecoder(num_joint=J, vj_relation=pmce.vj_relation,
                             num_vertx=431, num_verts_full=6890, seqlen=T,
                             dtype=dtype, fused_attn=fused)
    bench_one("decoder", dec, (jnp.zeros((1, J, 3)), jnp.zeros((1, T, 2048))),
              (pose3d, img_feat))

    gru = BiGRU(hidden_dim=1024, num_layers=2, dtype=dtype)
    x_tb = rng.normal(size=(T, B, 2048)).astype(np.float32)
    bench_one("bigru", gru, (jnp.zeros((T, 1, 2048)),), (x_tb,))


if __name__ == "__main__":
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        main(parts[0], int(parts[1]),
             fused=len(parts) > 2 and parts[2] == "fused")
