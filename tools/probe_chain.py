"""One-off probe: ablation timing of the whole-decoder-tail chain kernel.

Times fused_coevo_chain ALONE at serving shapes (B=256, J=19, V=431,
C=64, 3 blocks, 8/2 heads, bf16) with pieces knocked out:

  base     unmodified kernel
  novsa    vertex self-attention -> QKV+proj matmuls only (drops the
           per-clip [448, 448] score/softmax/AV loop, the largest buffers)
  nojsa    joint self-attention -> matmuls only ([G·24, G·24] scores)
  noca     both cross-attentions -> Q/out projections only (thin
           [24, 448]/[448, 24] scores)
  noadaln  AdaLN -> plain scale+bias (drops mean/var passes, 12/block)
  matonly  all of the above: the pure dense/MLP chain

Each variant runs in ITS OWN process (the kernels close over the patched
module globals at first trace). Device-side timing via the profiler trace
(tools/profile_device.aggregate), immune to the tunnel's dispatch floor.

Usage: python tools/probe_chain.py [variant ...]   (default: all)
"""

from __future__ import annotations

import os
import subprocess
import sys


def run_variant(variant: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    import pmce_tpu.ops.fused_coevo_chain as fc

    def attn_mm_only(h, wqkv, bqkv, wproj, bproj, mask01, num_heads,
                     *extra, **kw):
        C = h.shape[1]
        qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
        o = (qkv[:, :C] + bqkv[:, :C]).astype(h.dtype)
        return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj

    def ca_mm_only(q_in, k_in, v_in, wq, bq, wk, bk, wv, bv, wproj, bproj,
                   kv_mask, num_heads, *extra, **kw):
        q = (jnp.dot(q_in, wq, preferred_element_type=jnp.float32)
             + bq).astype(q_in.dtype)
        return jnp.dot(q, wproj, preferred_element_type=jnp.float32) + bproj

    if variant in ("novsa", "matonly"):
        fc._attn_core_cliploop = attn_mm_only
    if variant in ("nojsa", "matonly"):
        fc._attn_core = attn_mm_only
    if variant in ("noca", "matonly"):
        fc._cross_attn_core = ca_mm_only
    if variant in ("noadaln", "matonly"):
        fc._adaln_f32 = (
            lambda xf, gamma, beta, eps, mxu=False: xf * gamma + beta)
    if variant.startswith("g") and variant[1:].isdigit():
        # gN: clip-group size N (base is the shipped _pick_clip_group).
        fc._pick_clip_group = lambda B, g=int(variant[1:]): g

    B, J, V, C, NB = 256, 19, 431, 64, 3
    HJ, HV = 8, 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def t(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape, scale=scale))

    blocks = []
    for _ in range(NB):
        ca_j = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        ca_v = (t(C, C), t(C), t(C, C), t(C), t(C, C), t(C),
                t(C, C), t(C), t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        sa_j = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        sa_v = (t(C, 3 * C), t(3 * C), t(C, C), t(C),
                t(C, 4 * C), t(4 * C), t(4 * C, C), t(C))
        kparams = (t(J, C), t(V, C), t(J, C), t(V, C), t(V, C), t(J, C),
                   t(C, C), t(C), t(C, C), t(C), ca_j, ca_v, sa_j, sa_v)
        # _chain_impl casts every kernel weight to blocks[0][0].dtype —
        # only wjp needs the explicit bf16 to select the serving dtype.
        blocks.append((t(3, C).astype(dt), t(C), t(3, C).astype(dt), t(C),
                       kparams, t(C, 3), t(3), t(C, 3), t(3)))
    blocks = tuple(blocks)

    joints = jnp.asarray(rng.normal(size=(B, J, 3), scale=0.3), jnp.float32)
    vertx = jnp.asarray(rng.normal(size=(B, V, 3), scale=0.3), jnp.float32)
    gammas = jnp.asarray(rng.normal(size=(B, NB, 12, C), scale=0.1),
                         jnp.float32)
    betas = jnp.asarray(rng.normal(size=(B, NB, 12, C), scale=0.1),
                        jnp.float32)

    @jax.jit
    def f(j, vx, g, b):
        evo, mesh = fc.fused_coevo_chain(j, vx, g, b, blocks, HJ, HV)
        return (jnp.sum(evo.astype(jnp.float32))
                + jnp.sum(mesh.astype(jnp.float32)))

    _ = float(f(joints, vertx, gammas, betas))
    sys.path.insert(0, os.path.dirname(__file__))
    import contextlib
    import io
    import tempfile

    from profile_device import aggregate

    iters = 8
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            acc = f(joints, vertx, gammas, betas) * 0.0
            for _ in range(iters):
                acc = acc + f(joints, vertx, gammas, betas)
            _ = float(acc)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ms = aggregate(td, iters, 1)
    print(f"{variant:10s} {ms:7.2f} ms (device)", flush=True)


def main() -> None:
    variants = sys.argv[1:] or ["base", "novsa", "nojsa", "noca",
                                "noadaln", "matonly"]
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    for v in variants:
        r = subprocess.run(
            [sys.executable, __file__, "--run", v],
            capture_output=True, text=True, env=env)
        out = [l for l in r.stdout.splitlines() if "ms" in l]
        print(out[0] if out else f"{v}: FAILED\n{r.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
