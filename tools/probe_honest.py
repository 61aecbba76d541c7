"""Honest PMCE forward timing on the real chip.

On this axon platform ``jax.block_until_ready`` returns before device
execution finishes (verified round 1: it reported an impossible 3.4 PFLOP/s).
The only trustworthy sync is reading a device-computed value back to the
host. Protocol here: every dispatched forward contributes a scalar
(sum of all three outputs) to a lazily-chained accumulator; ``float(acc)``
inside the timed region forces every forward to have executed.

Reports per config: ms/call, mid-frames/s, implied TFLOP/s from XLA's own
cost_analysis (sanity bound: must be below chip peak), and bf16-vs-f32
output deltas.
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

from pmce_tpu.models.pmce import create_pmce
from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
from pmce_tpu.smpl.mesh import ensure_cached_coarsening
from pmce_tpu.utils import compile_cache


def build(dtype, fused):
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    model, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                           dtype=dtype, fused_attn=fused)
    return model


def probe(model, params, inputs, iters=32, trials=3):
    @jax.jit
    def fwd_probe(params, pose2d, img_feat):
        mesh, evo, pose3d = model.apply(params, pose2d, img_feat)
        return (jnp.sum(mesh.astype(jnp.float32))
                + jnp.sum(evo.astype(jnp.float32))
                + jnp.sum(pose3d.astype(jnp.float32)))

    # Warm up + grab cost analysis.
    lowered = fwd_probe.lower(params, *inputs[0])
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", 0.0) if cost else 0.0
    float(fwd_probe(params, *inputs[0]))

    times = []
    for _ in range(trials):
        acc = fwd_probe(params, *inputs[0]) * 0.0
        t0 = time.time()
        for i in range(iters):
            acc = acc + fwd_probe(params, *inputs[i % len(inputs)])
        _ = float(acc)   # forces every dispatched forward to execute
        times.append((time.time() - t0) / iters)
    ms = min(times) * 1e3
    return ms, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    compile_cache.enable()

    B, T, J = args.batch, 16, 19
    rng = np.random.default_rng(0)
    inputs = [
        (jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32),
         jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32))
        for _ in range(4)
    ]

    results = {}
    outputs = {}
    for name, dtype, fused in [
        ("f32", None, False),
        ("f32+fused", None, True),
        ("bf16", jnp.bfloat16, False),
        ("bf16+fused", jnp.bfloat16, True),
    ]:
        model = build(dtype, fused)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, T, J, 2)),
                                     jnp.zeros((1, T, 2048)))
        ms, flops = probe(model, params, inputs, iters=args.iters)
        fps = B / (ms * 1e-3)
        tflops = flops / (ms * 1e-3) / 1e12
        results[name] = (ms, fps, tflops)
        print(f"{name:12s}: {ms:8.2f} ms/call  {fps:10.1f} mid-frames/s  "
              f"{tflops:6.2f} TFLOP/s (XLA cost {flops/1e12:.3f} TF/call)",
              flush=True)
        # Accuracy check: full outputs on one batch (small readback).
        mesh, evo, pose3d = jax.jit(model.apply)(params, *inputs[0])
        outputs[name] = np.asarray(mesh, dtype=np.float64)

    ref = outputs["f32"]
    for name, m in outputs.items():
        if name == "f32":
            continue
        d = np.abs(m - ref)
        print(f"mesh delta vs f32 [{name}]: mean {d.mean()*1000:.4f} mm, "
              f"max {d.max()*1000:.4f} mm")


if __name__ == "__main__":
    main()
