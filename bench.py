"""Benchmark: flagship PMCE mesh-recovery throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measured quantity: end-to-end PMCE inference (Stage-1 spatio-temporal
lifting + Stage-2 co-evolution decoding to the full 6890-vertex mesh, 103 M
params) in recovered mid-frames per second on one chip.

Protocol: batch 256 clips, 8 DISTINCT random input sets cycled over 32
pipelined dispatches, one final block (keeps the device queue full — the
serving pattern); params passed as jit arguments (weight-free HLO); fp32
params with default matmul precision on the big dense layers and pinned
f32 on the geometry-critical attention paths.

Baseline for ``vs_baseline``: the reference publishes no numbers
(BASELINE.md); 3500 mid-frames/s is our estimate of the reference's
torch/cu113 PMCE forward throughput on its RTX 3090 (batch 64, ~15-20 ms
per forward, as a generous reading). The demo-pipeline north star (≥5× the
~sub-FPS reference demo) is covered separately by
``main/run_demo.py --synthetic`` which reports end-to-end frames/s.
"""

from __future__ import annotations

import json
import time

REFERENCE_BASELINE_FPS = 3500.0


def main() -> None:
    import jax

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    model, _assets = create_pmce(num_joint=19, art=art, coarsening=coarse)

    rng = np.random.default_rng(0)
    B, T, J = 256, 16, 19
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, J, 2)),
        jnp.zeros((1, T, 2048)))
    fwd = jax.jit(model.apply)

    inputs = [
        (jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32),
         jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32))
        for _ in range(8)
    ]
    out = fwd(params, *inputs[0])
    jax.block_until_ready(out)

    # Median of several trials: the dev tunnel adds run-to-run dispatch
    # jitter, the device-side time does not vary.
    iters = 32
    rates = []
    for _ in range(5):
        t0 = time.time()
        outs = [fwd(params, *inputs[i % 8]) for i in range(iters)]
        jax.block_until_ready(outs)
        rates.append(B * iters / (time.time() - t0))
    fps = float(np.median(rates))

    print(json.dumps({
        "metric": "pmce_mesh_recovery_throughput",
        "value": round(fps, 1),
        "unit": "mid-frames/s/chip (batch 256 pipelined, fp32 params, "
                "6890-vert mesh)",
        "vs_baseline": round(fps / REFERENCE_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
