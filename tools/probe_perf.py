"""One-off perf probe: honest f32 vs bf16 PMCE forward throughput on TPU.

Forces device execution by reading back a device-side scalar per dispatch
(block_until_ready does NOT wait for execution on the axon platform —
VERDICT.md "What's weak" #1).
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


def measure(dtype_name: str, B: int, iters: int = 32, trials: int = 5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening

    fused = dtype_name.endswith("f")
    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name.rstrip("f") or "f32"]
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    model, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                           dtype=dtype, fused_attn=fused)

    rng = np.random.default_rng(0)
    T, J = 16, 19
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0), jnp.zeros((1, T, J, 2)),
            jnp.zeros((1, T, 2048)))
        inputs = [
            (jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32),
             jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32))
            for _ in range(8)
        ]
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    inputs = jax.device_put(inputs, dev)

    def fwd_scalar(params, pose2d, img_feat):
        mesh, evo, pose3d = model.apply(params, pose2d, img_feat)
        # Tiny reduction over every output: forces full execution on
        # readback while keeping the D2H transfer at 4 bytes.
        return (jnp.sum(mesh.astype(jnp.float32))
                + jnp.sum(evo.astype(jnp.float32))
                + jnp.sum(pose3d.astype(jnp.float32)))

    f = jax.jit(fwd_scalar)
    t0 = time.time()
    _ = float(f(params, *inputs[0]))
    compile_s = time.time() - t0

    lowered = f.lower(params, *inputs[0]).compile()
    try:
        flops = lowered.cost_analysis()["flops"]
    except Exception:
        flops = float("nan")

    rates = []
    for _ in range(trials):
        t0 = time.time()
        outs = [f(params, *inputs[i % 8]) for i in range(iters)]
        total = sum(float(o) for o in outs)  # readback forces execution
        dt = time.time() - t0
        rates.append(B * iters / dt)
    fps = float(np.median(rates))
    return {
        "dtype": dtype_name, "batch": B, "fps": round(fps, 1),
        "ms_per_call": round(B * 1000.0 / fps, 2),
        "tflops_per_s": round(flops * fps / B / 1e12, 2),
        "flops_per_call": flops, "compile_s": round(compile_s, 1),
        "checksum": total,
    }


if __name__ == "__main__":
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    for spec in sys.argv[1:]:
        dt, b = spec.split(":")
        r = measure(dt, int(b))
        print(json.dumps(r), flush=True)
