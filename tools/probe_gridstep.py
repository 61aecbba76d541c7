"""One-off probe: fixed per-grid-step cost of a Pallas kernel on this TPU.

Times three kernels over grid=(B,) with the trunk's row shape ([R=304,
C=256] bf16 per step, weights as full-VMEM residents):

  copy      out = 2·x                     → DMA + step sequencing only
  mm1       one [304,256]@[256,768]       → + a single matmul
  mm12      the trunk's 12-matmul chain   → ≈ probe_trunk's `matonly`

and the same at G clips per step (grid B//G, rows G·R) to separate
per-step overhead from per-row work.

Usage: python tools/probe_gridstep.py [G ...]   (default 1 2)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import functools
import sys
import time


def run(G: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pmce_tpu.utils import compile_cache

    compile_cache.enable()

    B, R, C, hid = 256, 304, 256, 1024
    depth = 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B * R, C)), jnp.bfloat16)
    ws = []
    for _ in range(2 * depth):
        ws += [jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.05, jnp.bfloat16),
               jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.bfloat16),
               jnp.asarray(rng.normal(size=(C, hid)) * 0.05, jnp.bfloat16),
               jnp.asarray(rng.normal(size=(hid, C)) * 0.05, jnp.bfloat16)]

    rows = pl.BlockSpec((G * R, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def body(x_ref, *rest, nmm: int):
        out_ref = rest[-1]
        x = x_ref[:]
        if nmm == 0:
            out_ref[:] = x + x
            return
        k = 0
        for _ in range(nmm):
            wqkv, wproj, w1, w2 = rest[k:k + 4]
            k += 4
            qkv = jnp.dot(x, wqkv[:], preferred_element_type=jnp.float32)
            a = jnp.dot(qkv.astype(jnp.bfloat16)[:, :C], wproj[:],
                        preferred_element_type=jnp.float32)
            hh = jnp.dot(a.astype(jnp.bfloat16), w1[:],
                         preferred_element_type=jnp.float32)
            x = jnp.dot(hh.astype(jnp.bfloat16), w2[:],
                        preferred_element_type=jnp.float32).astype(x.dtype)
        out_ref[:] = x

    for name, nmm in [("copy", 0), ("mm1", 1), ("mm12", 2 * depth)]:
        wsub = ws[:nmm * 4]
        f = jax.jit(lambda x, *w: pl.pallas_call(
            functools.partial(body, nmm=nmm),
            grid=(B // G,),
            in_specs=[rows] + [full] * len(wsub),
            out_specs=rows,
            out_shape=jax.ShapeDtypeStruct((B * R, C), jnp.bfloat16),
        )(x, *w))
        probe = jax.jit(lambda x, *w: jnp.sum(f(x, *w).astype(jnp.float32)))
        _ = float(probe(x, *wsub))
        times = []
        for _ in range(3):
            acc = probe(x, *wsub) * 0.0
            t0 = time.time()
            for _ in range(16):
                acc = acc + probe(x, *wsub)
            _ = float(acc)
            times.append((time.time() - t0) / 16 * 1000.0)
        print(f"G={G} {name:5s} {float(np.median(times)):7.2f} ms "
              f"({B // G} steps)", flush=True)


if __name__ == "__main__":
    for g in [int(a) for a in sys.argv[1:]] or [1, 2]:
        run(g)
