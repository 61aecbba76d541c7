"""One-off probe: ablation timing of the fused lifter trunk kernel.

Times fused_lifter_trunk ALONE (B=256, T=16, J=19, C=256, depth 3, bf16)
with pieces knocked out, to attribute the kernel's cost:

  base       unmodified kernel
  nogelu     GELU -> identity (removes erf poly: exp + divide on [R, hid])
  nosoftmax  softmax -> plain masked scores (removes exp/max/div on [R, R])
  onehead    num_heads=1 (dh=256: full-lane MXU score/AV matmuls)
  noattn     attention core -> QKV+proj matmuls only (no score/AV/softmax)
  noln       LayerNorm -> plain scale+bias (no mean/var/rsqrt passes)
  matonly    noattn + nogelu + noln: the pure matmul chain

Each variant runs in ITS OWN process (monkeypatching functions that are
closed over by traced kernels is only safe before the first trace).

Usage: python tools/probe_trunk.py [variant ...]   (default: all)
"""

from __future__ import annotations

import functools
import math
import os
import subprocess
import sys
import time


def run_variant(variant: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from pmce_tpu.utils import compile_cache

    compile_cache.enable()
    import pmce_tpu.ops.fused_attention as fa

    if variant == "nogelu":
        fa._erf_f32 = lambda x: x  # GELU becomes ~linear; same op count shape
    elif variant == "nosoftmax":
        orig = fa._attn_core

        def attn_nosm(h, wqkv, bqkv, wproj, bproj, mask01, num_heads):
            R, C = h.shape
            dh = C // num_heads
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv).astype(h.dtype)
            outs = []
            for hd in range(num_heads):
                q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
                k = jax.lax.slice(qkv, (0, C + hd * dh),
                                  (R, C + (hd + 1) * dh))
                v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                                  (R, 2 * C + (hd + 1) * dh))
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = s * mask01 * (1.0 / R)
                o = jnp.dot(p.astype(h.dtype), v,
                            preferred_element_type=jnp.float32)
                outs.append(o)
            o = jnp.concatenate(outs, axis=-1).astype(h.dtype)
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_nosm
    elif variant in ("noattn", "matonly"):
        def attn_mm_only(h, wqkv, bqkv, wproj, bproj, mask01, num_heads):
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            o = (qkv[:, :h.shape[1]] + bqkv[:, :h.shape[1]]).astype(h.dtype)
            return jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_mm_only
    if variant in ("noln", "matonly"):
        fa._ln_f32 = lambda xf, scale, bias, eps, *a, **k: xf * scale + bias
    if variant == "matonly":
        fa._erf_f32 = lambda x: x
    if variant == "gelubf16":
        orig_erf = fa._erf_f32
        fa._erf_f32 = lambda x: orig_erf(x.astype(jnp.bfloat16)) \
            .astype(jnp.float32)
    if variant == "expbf16":
        # softmax exp on bf16 inputs (tests VPU bf16 packing for exp)
        orig_attn = fa._attn_core

        def attn_expbf16(h, wqkv, bqkv, wproj, bproj, mask01, num_heads):
            R, C = h.shape
            dh = C // num_heads
            import math as _m
            scale = 1.0 / _m.sqrt(dh)
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv).astype(h.dtype)
            logmask = (mask01 - 1.0) * jnp.float32(-fa._NEG_INF * 0 + 30.0)
            outs = []
            for hd in range(num_heads):
                q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
                k = jax.lax.slice(qkv, (0, C + hd * dh),
                                  (R, C + (hd + 1) * dh))
                v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                                  (R, 2 * C + (hd + 1) * dh))
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale - logmask
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp((s - m).astype(jnp.bfloat16))
                r = jnp.maximum(
                    jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                    1e-30)
                o = jnp.dot(p, v, preferred_element_type=jnp.float32)
                outs.append(o / r)
            o = jnp.concatenate(outs, axis=-1).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_expbf16
    if variant in ("noexp", "nomask", "nosum", "noscoremm", "noav"):
        # Piecewise knockouts of the CURRENT bf16 branch (post round-3
        # rewrite: q-side scale, one f32→bf16 convert, multiplicative
        # post-exp mask) to attribute the in-kernel attention cost.
        import math as _m

        def attn_piece(h, wqkv, bqkv, wproj, bproj, mask01, num_heads,
                       variant=variant):
            R, C = h.shape
            dh = C // num_heads
            scale = 1.0 / _m.sqrt(dh)
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv).astype(h.dtype)
            maskb = mask01.astype(jnp.bfloat16)
            outs = []
            for hd in range(num_heads):
                q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
                k = jax.lax.slice(qkv, (0, C + hd * dh),
                                  (R, C + (hd + 1) * dh))
                v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                                  (R, 2 * C + (hd + 1) * dh))
                if variant == "noscoremm":
                    p = maskb
                else:
                    s = jax.lax.dot_general(
                        q * jnp.bfloat16(scale), k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    sb = jnp.minimum(s.astype(jnp.bfloat16),
                                     jnp.bfloat16(30.0))
                    if variant == "noexp":
                        p = sb * maskb
                    elif variant == "nomask":
                        p = jnp.exp(sb)
                    else:
                        p = jnp.exp(sb) * maskb
                if variant == "nosum":
                    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
                    outs.append(o)
                elif variant == "noav":
                    r = jnp.maximum(jnp.sum(p.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-30)
                    outs.append(q.astype(jnp.float32) * jnp.reciprocal(r))
                else:
                    r = jnp.maximum(jnp.sum(p.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-30)
                    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
                    outs.append(o * jnp.reciprocal(r))
            o = jnp.concatenate(outs, axis=-1).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_piece
    if variant == "avsum":
        # Row-sum folded into the AV matmul: o_ext = p @ [v | 1 | 0...] —
        # the [R, R] cross-lane VPU reduce (nosum attributes it 0.8 ms)
        # rides the MXU instead, on a matmul class measured at ~4x the
        # score matmuls' effective rate.
        import math as _m

        def attn_avsum(h, wqkv, bqkv, wproj, bproj, mask01, num_heads):
            R, C = h.shape
            dh = C // num_heads
            scale = 1.0 / _m.sqrt(dh)
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv).astype(h.dtype)
            maskb = mask01.astype(jnp.bfloat16)
            ones = jnp.concatenate(
                [jnp.ones((R, 1), jnp.bfloat16),
                 jnp.zeros((R, 7), jnp.bfloat16)], axis=1)
            outs = []
            for hd in range(num_heads):
                q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
                k = jax.lax.slice(qkv, (0, C + hd * dh),
                                  (R, C + (hd + 1) * dh))
                v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                                  (R, 2 * C + (hd + 1) * dh))
                s = jax.lax.dot_general(
                    q * jnp.bfloat16(scale), k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                        jnp.bfloat16(30.0))) * maskb
                vx = jnp.concatenate([v, ones], axis=1)      # [R, dh+8]
                o_ext = jnp.dot(p, vx, preferred_element_type=jnp.float32)
                o = jax.lax.slice(o_ext, (0, 0), (R, dh))
                r = jnp.maximum(
                    jax.lax.slice(o_ext, (0, dh), (R, dh + 1)), 1e-30)
                outs.append(o * jnp.reciprocal(r))
            o = jnp.concatenate(outs, axis=-1).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_avsum
    if variant in ("pretk", "bf16out", "pretk_bf16out"):
        # pretk: ONE [304,256]→[256,304] k transpose per block, per-head
        #   SUBLANE slices, standard-layout score matmuls (tests whether
        #   the shipped ((1,),(1,)) dot's implicit per-head k relayout is
        #   the 3.4 ms the knockouts attribute to the score stage).
        # bf16out: score matmul emits bf16 directly (drops the [R, R]
        #   f32→bf16 convert pass).
        import math as _m

        def attn_try(h, wqkv, bqkv, wproj, bproj, mask01, num_heads,
                     variant=variant):
            R, C = h.shape
            dh = C // num_heads
            scale = 1.0 / _m.sqrt(dh)
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv).astype(h.dtype)
            maskb = mask01.astype(jnp.bfloat16)
            pret = variant.startswith("pretk")
            bfout = variant.endswith("bf16out")
            if pret:
                kt = jnp.transpose(
                    jax.lax.slice(qkv, (0, C), (R, 2 * C)))   # [C, R]
            outs = []
            for hd in range(num_heads):
                q = jax.lax.slice(qkv, (0, hd * dh), (R, (hd + 1) * dh))
                v = jax.lax.slice(qkv, (0, 2 * C + hd * dh),
                                  (R, 2 * C + (hd + 1) * dh))
                qs = q * jnp.bfloat16(scale)
                if pret:
                    kth = jax.lax.slice(kt, (hd * dh, 0),
                                        ((hd + 1) * dh, R))
                    s = jax.lax.dot_general(
                        qs, kth, (((1,), (0,)), ((), ())),
                        preferred_element_type=(
                            jnp.bfloat16 if bfout else jnp.float32))
                else:
                    k = jax.lax.slice(qkv, (0, C + hd * dh),
                                      (R, C + (hd + 1) * dh))
                    s = jax.lax.dot_general(
                        qs, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=(
                            jnp.bfloat16 if bfout else jnp.float32))
                if not bfout:
                    s = s.astype(jnp.bfloat16)
                p = jnp.exp(jnp.minimum(s, jnp.bfloat16(30.0))) * maskb
                r = jnp.maximum(jnp.sum(p.astype(jnp.float32), axis=-1,
                                        keepdims=True), 1e-30)
                o = jnp.dot(p, v, preferred_element_type=jnp.float32)
                outs.append(o * jnp.reciprocal(r))
            o = jnp.concatenate(outs, axis=-1).astype(h.dtype)
            return jnp.dot(o, wproj,
                           preferred_element_type=jnp.float32) + bproj

        fa._attn_core = attn_try
    if variant == "merge2":
        # Head-merging at m=2 for dh=32: AV volume is NEUTRAL ([2R, Nk]
        # @ [Nk, 72→128 lanes] = two per-head [R, Nk] @ [Nk, 32→128]),
        # unlike the measured m=4 loss (11.58 ms) where the widened AV
        # doubles MXU volume; scores still halve op count and the k/v
        # band slices land on 64-lane boundaries.
        fa._merge_factor = lambda nh, dh: 2 if nh % 2 == 0 else 1
    if variant == "hybridav":
        # Merged scores (m heads per score matmul) + PER-HEAD AV:
        # p slices are SUBLANE cuts of the stacked [m·Nq, Nk] block
        # (cheap), v slices are the same 32-lane cuts as the base loop.
        # Attributes how much of the m=4 loss was the widened AV.
        def merged_hybrid(q_all, k_all, v_all, maskb, num_heads, m):
            Nq, C = q_all.shape
            Nk, Cv = v_all.shape
            dh = C // num_heads
            dv = Cv // num_heads
            bandq = m * dh
            qmask = fa._head_band_mask(m, Nq, dh, jnp.bfloat16)
            maskm = maskb if maskb.shape[0] == 1 else fa._tile_rows(maskb, m)
            outs = []
            for g in range(num_heads // m):
                qg = jax.lax.slice(q_all, (0, g * bandq),
                                   (Nq, (g + 1) * bandq))
                kg = jax.lax.slice(k_all, (0, g * bandq),
                                   (Nk, (g + 1) * bandq))
                q_stack = fa._tile_rows(qg, m) * qmask
                s = jax.lax.dot_general(q_stack, kg,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jnp.exp(jnp.minimum(s.astype(jnp.bfloat16),
                                        jnp.bfloat16(30.0))) * maskm
                for b in range(m):
                    hd = g * m + b
                    pb = jax.lax.slice(p, (b * Nq, 0), ((b + 1) * Nq, Nk))
                    vb = jax.lax.slice(v_all, (0, hd * dv),
                                       (Nk, (hd + 1) * dv))
                    r = jnp.maximum(jnp.sum(pb.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-30)
                    o = jnp.dot(pb, vb, preferred_element_type=jnp.float32)
                    outs.append(o * jnp.reciprocal(r))
            return jnp.concatenate(outs, axis=-1)

        fa._merge_factor = lambda nh, dh: 4 if nh % 4 == 0 else 1
        fa._merged_heads = merged_hybrid

    B, T, J, C, depth = 256, 16, 19, 256, 3
    heads = 1 if variant == "onehead" else 8
    R = T * J
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.02), dt)

    params = tuple(
        (mk(C), mk(C), mk(C, 3 * C), mk(3 * C), mk(C, C), mk(C),
         mk(C), mk(C), mk(C, 2 * C), mk(2 * C), mk(2 * C, C), mk(C))
        for _ in range(2 * depth))
    norm = (mk(C), mk(C))
    tpe = mk(T, C)
    x = mk(B, R, C)

    @jax.jit
    def f(x):
        y = fa.fused_lifter_trunk(x, params, norm, norm, tpe, T, J,
                                  depth, heads)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(f(x))
    if os.environ.get("PMCE_TPU_PROBE_TRACE", "1") == "1":
        # Device-side timing via the profiler trace (the tunnel's ~3.4 ms
        # dispatch floor swamps wall-clock micro-timings).
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(__file__))
        import tempfile

        from profile_device import aggregate

        iters = 8
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                acc = f(x) * 0.0
                for _ in range(iters):
                    acc = acc + f(x)
                _ = float(acc)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                ms = aggregate(td, iters, 1)
        print(f"{variant:10s} {ms:7.2f} ms (device)", flush=True)
        return
    times = []
    for _ in range(3):
        acc = f(x) * 0.0
        t0 = time.time()
        for _ in range(16):
            acc = acc + f(x)
        _ = float(acc)
        times.append((time.time() - t0) / 16 * 1000.0)
    print(f"{variant:10s} {float(np.median(times)):7.2f} ms", flush=True)


def main() -> None:
    variants = sys.argv[2:] or ["base", "nogelu", "nosoftmax", "onehead",
                                "noattn"]
    for v in variants:
        r = subprocess.run(
            [sys.executable, __file__, "--run", v],
            capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if "ms" in l]
        print(out[0] if out else f"{v}: FAILED\n{r.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
