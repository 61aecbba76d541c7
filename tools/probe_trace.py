"""One-off: capture a jax.profiler trace of the bf16 PMCE forward on TPU."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import faulthandler
import sys
import time

faulthandler.dump_traceback_later(560)


def main(out_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmce_tpu.models.pmce import create_pmce
    from pmce_tpu.smpl.artifacts import ensure_cached_artifacts
    from pmce_tpu.smpl.mesh import ensure_cached_coarsening
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    art = ensure_cached_artifacts()
    coarse = ensure_cached_coarsening()
    model, _ = create_pmce(num_joint=19, art=art, coarsening=coarse,
                           dtype=jnp.bfloat16, fused_attn=True)
    rng = np.random.default_rng(0)
    B, T, J = 256, 16, 19
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init, backend="cpu")(
            jax.random.PRNGKey(0), jnp.zeros((1, T, J, 2)),
            jnp.zeros((1, T, 2048)))
        pose2d = jnp.asarray(rng.normal(size=(B, T, J, 2)), jnp.float32)
        img_feat = jnp.asarray(rng.normal(size=(B, T, 2048)), jnp.float32)
    dev = jax.devices()[0]
    params, pose2d, img_feat = jax.device_put((params, pose2d, img_feat), dev)

    def f(params, pose2d, img_feat):
        out = model.apply(params, pose2d, img_feat)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out)

    jf = jax.jit(f)
    _ = float(jf(params, pose2d, img_feat))

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        _ = float(jf(params, pose2d, img_feat))
    jax.profiler.stop_trace()
    print("trace done", out_dir)


if __name__ == "__main__":
    main(sys.argv[1])
