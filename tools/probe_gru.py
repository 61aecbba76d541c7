"""One-off probe: BiGRU cost breakdown at serving shapes (T=16, B=256,
H=1024, in=2048, bf16).

Pieces timed independently (each jitted alone, forced execution):
  bigru      the full 2-layer BiGRU module
  scan1      one fused_gru_layer kernel call ([16,256,3072] gi)
  scan4      four fused_gru_layer calls back to back (the model's count)
  gi_proj    one input projection [T*B, 2048] @ [2048, 3072]
  gi_proj4   four of them
  revcat     the reversal + concat glue ([16,256,1024] x2 -> [16,256,2048])
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from pmce_tpu.utils import compile_cache

compile_cache.enable()

from pmce_tpu.models.layers import BiGRU  # noqa: E402
from pmce_tpu.ops.fused_attention import fused_gru_layer  # noqa: E402

T, B, H, IN = 16, 256, 1024, 2048
rng = np.random.default_rng(0)
dt = jnp.bfloat16


def timeit(name, f, *args):
    jf = jax.jit(f)
    _ = float(jf(*args))
    outs = []
    for _ in range(3):
        acc = jf(*args) * 0.0
        t0 = time.time()
        for _ in range(16):
            acc = acc + jf(*args)
        _ = float(acc)
        outs.append((time.time() - t0) / 16 * 1000.0)
    print(f"{name:10s} {float(np.median(outs)):7.2f} ms", flush=True)


x = jnp.asarray(rng.normal(size=(T, B, IN)), dt)
gi = jnp.asarray(rng.normal(size=(T, B, 3 * H)), dt)
whh = jnp.asarray(rng.normal(size=(H, 3 * H), scale=0.02), dt)
bhh = jnp.asarray(rng.normal(size=(3 * H,)), jnp.float32)
wih = jnp.asarray(rng.normal(size=(IN, 3 * H), scale=0.02), dt)
ya = jnp.asarray(rng.normal(size=(T, B, H)), dt)
yb = jnp.asarray(rng.normal(size=(T, B, H)), dt)

gru = BiGRU(H, num_layers=2, dtype=dt)
params = jax.jit(gru.init, backend="cpu")(
    jax.random.PRNGKey(0), jnp.zeros((T, 1, IN)))
params = jax.device_put(params, jax.devices()[0])

timeit("bigru", lambda p, x: jnp.sum(gru.apply(p, x).astype(jnp.float32)),
       params, x)
timeit("scan1", lambda gi: jnp.sum(
    fused_gru_layer(gi, whh, bhh).astype(jnp.float32)), gi)
timeit("scan4", lambda gi: sum(
    jnp.sum(fused_gru_layer(gi + i, whh, bhh).astype(jnp.float32))
    for i in range(4)), gi)
timeit("gi_proj", lambda x: jnp.sum(
    (x.reshape(T * B, IN) @ wih).astype(jnp.float32)), x)
timeit("gi_proj4", lambda x: sum(
    jnp.sum(((x.reshape(T * B, IN) + i) @ wih).astype(jnp.float32))
    for i in range(4)), x)
timeit("revcat", lambda a, b: jnp.sum(
    jnp.concatenate([a, b[::-1]], axis=-1).astype(jnp.float32)), ya, yb)
