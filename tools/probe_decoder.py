"""One-off probe: decoder-internals timing on TPU (honest forced timing).

Breaks CoevolutionDecoder cost into: BiGRU, one CoevoBlock, the three
CoevoBlocks' sub-pieces (vertex SA block, vertex CA block, joint blocks),
and the upsample/residual tail — so kernel work targets the measured
bottleneck, not a guess.

Usage: python tools/probe_decoder.py bf16:256 [f32:256 ...]
"""

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

    from pmce_tpu.models.coevo import CoevoBlock, CoevolutionDecoder
    from pmce_tpu.models.layers import (
        AdaBlock,
        BiGRU,
        CrossAttentionBlock,
    )

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    rng = np.random.default_rng(0)
    T, J, V = 16, 19, 431
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

    joints = rng.normal(size=(B, J, 3)).astype(np.float32)
    vertx = rng.normal(size=(B, V, 3)).astype(np.float32)
    cond = rng.normal(size=(B, 2048)).astype(np.float32)
    feats = rng.normal(size=(B, T, 2048)).astype(np.float32)
    vtok = rng.normal(size=(B, V, 64)).astype(np.float32)
    jtok = rng.normal(size=(B, J, 64)).astype(np.float32)

    vj = tuple(int(i) for i in rng.integers(0, J, size=V))

    dec = CoevolutionDecoder(num_joint=J, vj_relation=vj, num_vertx=V,
                             num_verts_full=6890, seqlen=T, dtype=dtype,
                             fused_attn=fused)
    bench_one("decoder_total", dec,
              (jnp.zeros((1, J, 3)), jnp.zeros((1, T, 2048))),
              (joints, feats))

    gru = BiGRU(hidden_dim=1024, num_layers=2, dtype=dtype)
    bench_one("bigru", gru, (jnp.zeros((T, 1, 2048)),),
              (np.swapaxes(feats, 0, 1).copy(),))

    blk = CoevoBlock(J, V, dtype=dtype, fused=fused)
    bench_one("coevoblock_x1", blk,
              (jnp.zeros((1, J, 3)), jnp.zeros((1, V, 3)),
               jnp.zeros((1, 2048))),
              (joints, vertx, cond))

    vsa = AdaBlock(64, 2, 4.0, qkv_bias=True, dtype=dtype, fused=fused)
    bench_one("vertx_SA_FFN", vsa,
              (jnp.zeros((1, V, 64)), jnp.zeros((1, 2048))), (vtok, cond))

    jsa = AdaBlock(64, 8, 4.0, qkv_bias=True, dtype=dtype, fused=fused)
    bench_one("joint_SA_FFN", jsa,
              (jnp.zeros((1, J, 64)), jnp.zeros((1, 2048))), (jtok, cond))

    vca = CrossAttentionBlock(q_dim=64, k_dim=64, v_dim=64, num_heads=2,
                              qkv_bias=True, dtype=dtype)
    bench_one("vertx_CA_FFN", vca,
              (jnp.zeros((1, V, 64)), jnp.zeros((1, J, 64)),
               jnp.zeros((1, J, 64)), jnp.zeros((1, 2048))),
              (vtok, jtok, jtok, cond))

    jca = CrossAttentionBlock(q_dim=64, k_dim=64, v_dim=64, num_heads=8,
                              qkv_bias=True, dtype=dtype)
    bench_one("joint_CA_FFN", jca,
              (jnp.zeros((1, J, 64)), jnp.zeros((1, V, 64)),
               jnp.zeros((1, V, 64)), jnp.zeros((1, 2048))),
              (jtok, vtok, vtok, cond))


if __name__ == "__main__":
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        main(parts[0], int(parts[1]),
             fused=len(parts) > 2 and parts[2] == "fused")
