"""One-off probe: WHY are the per-head [304,32]@[32,304] score matmuls
~6× slower per FLOP than the AV matmuls in the trunk kernel?

Hypotheses: (a) implicit transpose of k (dot dims [1],[1] forces a
relayout), (b) small-K MXU accumulator-flush overhead (K=32 vs 304).

Variants (each: grid=(256,), 48 score matmuls per step ≈ the trunk's
8 heads × 6 blocks, outputs summed to defeat DCE):

  implicit  s = dot(q_h[304,32], k_h[304,32], dims (1,)(1,))   — as shipped
  pret      s = dot(q_h[304,32], kt_h[32,304], dims (1,)(0,))  — k given
            pre-transposed (sublane-sliced from a [256,304] stack)
  big       8 heads as ONE [304,256]@[256,304] (WRONG math, right cost
            model: same total MACs, K=256)

Usage: python tools/probe_score.py
"""

from __future__ import annotations

import functools
import time


def run(variant: str) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()

    B, R, C, H = 256, 304, 256, 8
    dh = C // H
    blocks = 6
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * R, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B * R, C)), jnp.bfloat16)
    kt = jnp.asarray(rng.normal(size=(B * C, R)), jnp.bfloat16)

    rows = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    trows = pl.BlockSpec((C, R), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def body(q_ref, k_ref, out_ref, *, variant: str):
        qv = q_ref[:]
        kv = k_ref[:]
        if variant == "staged":
            # Same math as fullattn, but in three head-loops per block:
            # all 8 score matmuls, then all softmaxes, then all AVs —
            # exposes cross-head ILP to Mosaic's scheduler.
            maskb = (qv[:, :1] * 0 + 1).astype(jnp.bfloat16)  # [R, 1]
            acc = jnp.zeros((R, C), jnp.float32)
            for b in range(blocks):
                qv = (qv + jnp.bfloat16(1 + b)).astype(jnp.bfloat16)
                qs = [jax.lax.slice(qv, (0, h * dh), (R, (h + 1) * dh))
                      for h in range(H)]
                ks = [jax.lax.slice(kv, (0, h * dh), (R, (h + 1) * dh))
                      for h in range(H)]
                ss = [jax.lax.dot_general(
                    qs[h], ks[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                    for h in range(H)]
                ps = [jnp.exp(jnp.minimum(s, jnp.bfloat16(30.0))) * maskb
                      for s in ss]
                rs = [jnp.reciprocal(jnp.maximum(
                    jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-30)) for p in ps]
                outs = [jnp.dot(ps[h], qs[h],
                                preferred_element_type=jnp.float32) * rs[h]
                        for h in range(H)]
                acc = acc + jnp.concatenate(outs, axis=-1)
            out_ref[:] = acc.astype(out_ref.dtype)
            return
        if variant in ("fullattn", "nosm", "sepbuf"):
            # Mimic _attn_core's bf16 per-head chain (v = q for shapes).
            maskb = (qv[:, :1] * 0 + 1).astype(jnp.bfloat16)  # [R, 1]
            acc = jnp.zeros((R, C), jnp.float32)
            for b in range(blocks):
                # distinct per-block input — defeats CSE collapsing the
                # 6 blocks into one
                qv = (qv + jnp.bfloat16(1 + b)).astype(jnp.bfloat16)
                outs = []
                for h in range(H):
                    qh = jax.lax.slice(qv, (0, h * dh), (R, (h + 1) * dh))
                    kh = jax.lax.slice(kv, (0, h * dh), (R, (h + 1) * dh))
                    s = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if variant == "fullattn":
                        p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                                jnp.bfloat16(30.0))) * maskb
                        r = jnp.maximum(jnp.sum(p.astype(jnp.float32),
                                                axis=-1, keepdims=True),
                                        1e-30)
                        o = jnp.dot(p, qh,
                                    preferred_element_type=jnp.float32)
                        outs.append(o * jnp.reciprocal(r))
                    elif variant == "nosm":
                        p = s.astype(jnp.bfloat16)
                        o = jnp.dot(p, qh,
                                    preferred_element_type=jnp.float32)
                        outs.append(o)
                    else:  # sepbuf: fresh buffer per head, no AV/softmax
                        outs.append(jax.lax.slice(s, (0, 0), (R, dh)))
                acc = acc + jnp.concatenate(outs, axis=-1)
            out_ref[:] = acc.astype(out_ref.dtype)
            return
        acc = jnp.zeros((R, R), jnp.float32)
        for b in range(blocks):
            # Distinct per-block lhs — defeats CSE collapsing the block
            # loop into one matmul (the round-3 rerun found the original
            # loop-invariant version measured exactly that collapse).
            qv = (qv + jnp.bfloat16(1 + b)).astype(jnp.bfloat16)
            if variant == "big":
                acc = acc + jax.lax.dot_general(
                    qv, kv, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                for h in range(H):
                    qh = jax.lax.slice(qv, (0, h * dh), (R, (h + 1) * dh))
                    if variant == "implicit":
                        kh = jax.lax.slice(kv, (0, h * dh),
                                           (R, (h + 1) * dh))
                        acc = acc + jax.lax.dot_general(
                            qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        kh = jax.lax.slice(kv, (h * dh, 0),
                                           ((h + 1) * dh, R))
                        acc = acc + jax.lax.dot_general(
                            qh, kh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        out_ref[:] = acc[:, :C].astype(out_ref.dtype)

    kin = kt if variant == "pret" else k
    kspec = trows if variant == "pret" else rows
    heavy = variant.endswith("_heavy")
    if heavy:
        variant = variant[:-6]
    # _heavy: park the trunk's ~9.4 MB of resident weights in VMEM (full
    # BlockSpecs, never read) to expose scheduling-pressure effects.
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    ws = [jnp.asarray(rng.normal(size=(C, 3 * C)), jnp.bfloat16)
          for _ in range(blocks * 4)] if heavy else []

    def wrapped(q_ref, k_ref, *rest, variant: str):
        body(q_ref, k_ref, rest[-1], variant=variant)

    f = jax.jit(lambda q, k: pl.pallas_call(
        functools.partial(wrapped, variant=variant),
        grid=(B,),
        in_specs=[rows, kspec] + [full] * len(ws),
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((B * R, C), jnp.bfloat16),
    )(q, k, *ws))
    probe = jax.jit(lambda q, k: jnp.sum(f(q, k).astype(jnp.float32)))
    _ = float(probe(q, kin))
    # Device-side timing via the profiler trace (the tunnel's dispatch
    # floor swamps wall-clock timings of these kernels).
    import contextlib
    import io
    import os
    import sys as _sys
    import tempfile

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_device import aggregate

    iters = 8
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            acc = probe(q, kin) * 0.0
            for _ in range(iters):
                acc = acc + probe(q, kin)
            _ = float(acc)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ms = aggregate(td, iters, 1)
    return float(ms)


if __name__ == "__main__":
    import sys
    for v in sys.argv[1:] or ("implicit", "pret", "big", "fullattn",
                              "nosm", "sepbuf"):
        print(f"{v:9s} {run(v):7.2f} ms", flush=True)
