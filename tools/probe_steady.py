"""One-off probe: steady-state serving throughput via an in-graph batch loop.

bench.py dispatches one XLA program per batch; wall−device shows a ~1.7 ms
per-iteration gap at B=256 (≈10%). This probe runs N batches inside ONE
jitted program (lax.scan over pre-staged inputs), eliminating every
inter-program boundary — the busy-server steady state. If the scan rate
matches bench.py's, the gap is measurement overhead; if it's ~10% higher,
the gap is real device idle between programs (dispatch/infeed), and a
production server would pipeline it away.

Usage: python tools/probe_steady.py [nbatch]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    nbatch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    model, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                           dtype=jnp.bfloat16, fused_attn=True)
    rng = np.random.default_rng(0)
    B, T, J = 256, 16, 19
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, J, 2)),
        jnp.zeros((1, T, 2048)))

    pose2d = jnp.asarray(rng.normal(size=(nbatch, B, T, J, 2)), jnp.float32)
    imf = jnp.asarray(rng.normal(size=(nbatch, B, T, 2048)), jnp.float32)

    @jax.jit
    def steady(params, pose2d, imf):
        def body(acc, inp):
            p2, f = inp
            mesh, evo, pose3d = model.apply(params, p2, f)
            return (acc + jnp.sum(mesh.astype(jnp.float32))
                    + jnp.sum(evo.astype(jnp.float32))
                    + jnp.sum(pose3d.astype(jnp.float32))), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (pose2d, imf))
        return acc

    _ = float(steady(params, pose2d, imf))
    rates = []
    for _ in range(5):
        t0 = time.time()
        acc = steady(params, pose2d, imf)
        _ = float(acc)
        rates.append(B * nbatch / (time.time() - t0))
    print(json.dumps({
        "metric": "steady_state_scan_throughput",
        "nbatch": nbatch,
        "fps": round(float(np.median(rates)), 1),
    }))


if __name__ == "__main__":
    main()
