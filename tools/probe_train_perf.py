"""Honest PMCE TRAIN-step timing on the real chip: f32 vs bf16+fused.

Same forced-execution protocol as probe_honest.py (on this platform only a
host readback proves device execution): every optimization step's loss is
chained into an accumulator and ``float(acc)`` closes the timed region, so
all dispatched steps must have run. The returned TrainState threads through
the loop, so steps are serially dependent anyway — the readback just pins
the tail.

Usage: python tools/probe_train_perf.py --batch 32 --iters 16
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmce_tpu.core.trainer import TrainState, make_pmce_train_step
from pmce_tpu.models.pmce import create_pmce
from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
from pmce_tpu.smpl.mesh import ensure_cached_coarsening
from pmce_tpu.utils import compile_cache


def make_batch(rng, B, T=16, J=17, V=6890):
    return {
        "pose2d": jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32),
        "img_feature": jnp.asarray(rng.normal(size=(B, T, 2048)),
                                   jnp.float32),
        "mesh": jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32),
        "lift_pose3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "reg_pose3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "mesh_valid": jnp.ones((B, V, 1), jnp.float32),
        "lift_pose3d_valid": jnp.ones((B, J, 1), jnp.float32),
        "reg_pose3d_valid": jnp.ones((B, J, 1), jnp.float32),
    }


def probe(dtype, fused, B, iters, trials=3):
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    rng = np.random.default_rng(0)
    jr = rng.random((17, art.num_verts)).astype(np.float32)
    jr /= jr.sum(1, keepdims=True)
    model, _ = create_pmce(num_joint=17, art=art, coarsening=coarse,
                           joint_regressor_h36m=jr,
                           dtype=dtype, fused_attn=fused)
    tx = optax.adam(1e-4)
    step = make_pmce_train_step(model, tx, jnp.asarray(art.faces),
                                jnp.asarray(jr), 0.1, 20.0, 1e-3)

    batches = [make_batch(rng, B) for _ in range(2)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batches[0]["pose2d"],
                                 batches[0]["img_feature"])["params"]
    state = TrainState(params=params, opt_state=jax.jit(tx.init)(params),
                       step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(1)
    gate = jnp.asarray(0.0)

    # Warm-up compile + one forced execution.
    state, loss, _ = step(state, batches[0], key, gate)
    float(loss)

    times = []
    for _ in range(trials):
        acc = loss * 0.0
        t0 = time.time()
        for i in range(iters):
            state, loss, _ = step(state, batches[i % 2], key, gate)
            acc = acc + loss
        _ = float(acc)   # forces every dispatched step to have executed
        times.append((time.time() - t0) / iters)
    ms = min(times) * 1e3
    return ms, B / (ms * 1e-3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    compile_cache.enable()

    results = {}
    for name, dtype, fused in [
        ("f32", None, False),
        ("bf16+fused", jnp.bfloat16, True),
    ]:
        ms, sps = probe(dtype, fused, args.batch, args.iters)
        results[name] = ms
        print(f"train[{name:10s}] B={args.batch}: {ms:8.2f} ms/step  "
              f"{sps:8.1f} samples/s", flush=True)

    if args.batch == 128:
        # Record the canonical (B=128) row into PERF.json — the README
        # training row is generated from it (tests/test_perf_docs.py).
        from pmce_tpu.utils import perf

        perf.record("train_step", {
            "batch": args.batch,
            "f32_ms": round(results["f32"], 2),
            "bf16_fused_ms": round(results["bf16+fused"], 2),
            "speedup_vs_f32": round(
                results["f32"] / results["bf16+fused"], 2),
            "source": "tools/probe_train_perf.py --batch 128",
        })


if __name__ == "__main__":
    main()
