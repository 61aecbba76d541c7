"""Benchmark: flagship PMCE mesh-recovery throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measured quantity: end-to-end PMCE inference (Stage-1 lifting + Stage-2
co-evolution decoding to the full 6890-vertex mesh) — the per-window model
work of the reference's demo/eval path — in mid-frames per second on one
chip, batch 64, steady state.

Baseline for ``vs_baseline``: the reference publishes no demo FPS
(BASELINE.md); we use 30 frames/s as a generous stand-in for the
RTX-3090 end-to-end demo rate (the reference demo runs ViTPose-Huge
frame-by-frame plus a 300-step camera optimization per window, well below
30 FPS in practice). The north-star target is ≥5× that, i.e. ≥150.
"""

from __future__ import annotations

import json
import time

REFERENCE_BASELINE_FPS = 30.0


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
    B, T, J = 64, 16, 19
    pose2d = jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32)
    img_feat = jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pose2d, img_feat)

    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    out = fwd(params, pose2d, img_feat)
    jax.block_until_ready(out)

    # Steady state: enough iterations to amortize dispatch.
    iters = 50
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, pose2d, img_feat)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    fps = B / dt

    print(json.dumps({
        "metric": "pmce_mesh_recovery_throughput",
        "value": round(fps, 1),
        "unit": "mid-frames/s/chip (batch 64, fp32, 6890-vert mesh)",
        "vs_baseline": round(fps / REFERENCE_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
