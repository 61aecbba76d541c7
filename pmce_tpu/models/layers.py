"""Transformer building blocks shared by the pose lifter and the decoder.

Semantics parity targets (architecture, not code) in the reference repo:
- pre-norm Block (LN → MHA → residual → LN → MLP → residual), timm-style
  fused-qkv attention: /root/reference/lib/models/PoseEstimation.py:13-29 and
  CoevoDecoder.py:89-131.
- AdaLayerNorm — LayerNorm whose γ/β come from a Linear of the conditioning
  image feature; note the reference normalizes with the UNBIASED std and adds
  eps OUTSIDE the sqrt: /root/reference/lib/models/CoevoDecoder.py:16-29.
- CrossAttention with separate Wq/Wk/Wv and a value dim that may differ from
  the query dim: /root/reference/lib/models/CoevoDecoder.py:31-62.
- DropPath (per-sample stochastic depth), active only in training.

All dropout/drop-path is disabled when ``deterministic=True`` (inference),
matching the reference's ``model.eval()`` semantics. GELU is the exact (erf)
variant — torch's default — not jax's tanh approximation.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def _attn_precision(dtype) -> jax.lax.Precision | None:
    """f32 runs pin HIGHEST (3-pass MXU) for metric-grade accuracy; a bf16
    serving policy uses the native bf16 MXU pass."""
    return None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST


def exact_gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def _xla_attention(x: jax.Array, wqkv, bqkv, wproj, bproj, num_heads: int,
                   dt, precision, attn_dropout=None) -> jax.Array:
    """Params-explicit XLA multi-head self-attention math — the single
    source shared by :class:`Attention`'s modular path and Block's
    training fallback (``attn_dropout``: optional callable applied to the
    softmax probabilities)."""
    B, N, C = x.shape
    dh = C // num_heads
    x = x.astype(dt)
    qkv = x @ wqkv.astype(dt)
    if bqkv is not None:
        qkv = qkv + bqkv.astype(dt)
    qkv = qkv.reshape(B, N, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      precision=precision) * dh ** -0.5
    attn = jax.nn.softmax(attn, axis=-1)
    if attn_dropout is not None:
        attn = attn_dropout(attn)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return out @ wproj.astype(dt) + bproj.astype(dt)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=shape)
        return x / keep * mask.astype(x.dtype)


class Mlp(nn.Module):
    """Linear → GELU → Linear, timm layout."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = exact_gelu(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class DenseParams(nn.Module):
    """Owns a Dense layer's parameters (flax ``nn.Dense`` tree layout and
    initializers) without applying them — lets one param set back both the
    XLA attention path and the fused Pallas kernel."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class Conv1dParams(nn.Module):
    """Owns a 1-D ``nn.Conv`` layer's parameters (same tree layout —
    ``kernel`` [taps, in, out] + ``bias`` — and the same default
    initializers) without applying them, so the convolution can be
    computed as an explicit GEMM while staying checkpoint-compatible."""

    taps: int
    in_ch: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.taps, self.in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class LayerNormParams(nn.Module):
    """Owns ``nn.LayerNorm``-layout parameters (scale/bias) unapplied."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class AttentionParams(nn.Module):
    """Param tree identical to :class:`Attention` (qkv + proj Dense)."""

    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wqkv, bqkv = DenseParams(self.dim, 3 * self.dim, self.qkv_bias,
                                 name="qkv")()
        wproj, bproj = DenseParams(self.dim, self.dim, True, name="proj")()
        if bqkv is None:
            bqkv = jnp.zeros((3 * self.dim,), jnp.float32)
        return wqkv, bqkv, wproj, bproj


class MlpParams(nn.Module):
    """Param tree identical to :class:`Mlp` (fc1 + fc2 Dense)."""

    in_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.in_dim, self.hidden_dim, name="fc1")()
        w2, b2 = DenseParams(self.hidden_dim, self.in_dim, name="fc2")()
        return w1, b1, w2, b2


class Attention(nn.Module):
    """Multi-head self-attention with a fused qkv projection (timm layout).

    With ``fused=True`` (and zero attention/proj dropout) the forward runs
    through the short-sequence Pallas kernel
    (:func:`pmce_tpu.ops.fused_attention.fused_mhsa`) — same parameters,
    same math, one VMEM-resident pass instead of five HBM materializations.
    Training works through it too (custom VJP recomputes via XLA).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        dh = C // H
        wqkv, bqkv = DenseParams(C, 3 * C, self.qkv_bias, name="qkv")()
        wproj, bproj = DenseParams(C, C, True, name="proj")()
        dt = self.dtype or x.dtype

        if self.fused and (deterministic
                           or (self.attn_drop == 0.0
                               and self.proj_drop == 0.0)):
            # Dropout is inactive (inference, or zero rates): identical
            # math to the modular path, so the kernel applies.
            from pmce_tpu.ops.fused_attention import fused_mhsa

            bq = bqkv if bqkv is not None else jnp.zeros((3 * C,), jnp.float32)
            return fused_mhsa(x.astype(dt), wqkv, bq, wproj, bproj, H)

        out = _xla_attention(
            x, wqkv, bqkv, wproj, bproj, H, dt,
            _attn_precision(self.dtype),
            attn_dropout=lambda a: nn.Dropout(
                self.attn_drop, deterministic=deterministic)(a))
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block (LayerNorm → MHA → LN → MLP).

    With ``fused=True`` and no active dropout / stochastic depth (i.e. any
    inference call, or training with zero rates) the whole block — plus an
    optional caller-supplied shared post-LayerNorm — runs as ONE Pallas
    kernel (:func:`pmce_tpu.ops.fused_attention.fused_transformer_block`):
    one HBM read and write of x per layer. Parameters live in the exact
    same tree as the modular path, so checkpoints are interchangeable.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 post_norm: tuple | None = None,
                 return_params: bool = False):
        hidden = int(self.dim * self.mlp_ratio)
        # Stochastic depth does NOT force the modular path: it enters the
        # kernel as per-clip residual-branch masks. Only element-level
        # dropout (inside attention / the MLP) needs the fallback.
        fully_fused = self.fused and (
            deterministic
            or (self.drop == 0.0 and self.attn_drop == 0.0))
        if self.fused:
            # Declare params through the holders in BOTH fused branches so
            # init produces one consistent tree regardless of determinism.
            g1, b1 = LayerNormParams(self.dim, name="norm1")()
            wqkv, bqkv, wproj, bproj = AttentionParams(
                self.dim, self.qkv_bias, name="attn")()
            g2, b2 = LayerNormParams(self.dim, name="norm2")()
            w1, bb1, w2, bb2 = MlpParams(self.dim, hidden, name="mlp")()
        if return_params:
            # Whole-trunk kernels (fused_lifter_trunk) consume the block's
            # params UNAPPLIED; declaration above keeps the tree identical.
            assert self.fused, "return_params requires fused=True"
            return (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                    w1, bb1, w2, bb2)

        if fully_fused:
            from pmce_tpu.ops.fused_attention import fused_transformer_block

            gp, bp = post_norm if post_norm is not None else (None, None)
            dt = self.dtype or x.dtype
            params = (g1, b1, wqkv, bqkv, wproj, bproj, g2, b2,
                      w1, bb1, w2, bb2, gp, bp)
            masks = None
            if not deterministic and self.drop_path > 0.0:
                # DropPath as in-kernel branch masks: per-sample
                # {0, 1/keep}, independent draws per residual branch.
                keep = 1.0 - self.drop_path
                shape = (x.shape[0], 1, 1)
                m1 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                m2 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                masks = (m1.astype(jnp.float32) / keep,
                         m2.astype(jnp.float32) / keep)
            return fused_transformer_block(
                x.astype(dt), params, self.num_heads, self.norm_eps,
                self.norm_eps, masks).astype(x.dtype)

        if self.fused:
            # Training fallback (stochastic depth / dropout active):
            # modular math on the SAME parameter arrays, fused attention
            # kernel inside when the attention math is deterministic.
            from pmce_tpu.ops.fused_attention import fused_mhsa

            dt = self.dtype or x.dtype
            h = _manual_layer_norm(x, g1, b1, self.norm_eps, dt)
            if self.attn_drop == 0.0:
                h = fused_mhsa(h.astype(dt), wqkv, bqkv, wproj, bproj,
                               self.num_heads)
            else:
                # Probability dropout happens INSIDE attention — no
                # kernel path; same math/params as the modular Attention
                # via the shared helper.
                h = _xla_attention(
                    h, wqkv, bqkv, wproj, bproj, self.num_heads, dt,
                    _attn_precision(self.dtype),
                    attn_dropout=lambda a: nn.Dropout(
                        self.attn_drop, deterministic=deterministic,
                        name="attn_drop1")(a))
            # The modular Attention applies proj dropout (rate self.drop)
            # after the output projection.
            h = nn.Dropout(self.drop, deterministic=deterministic,
                           name="proj_drop1")(h)
            x = x + DropPath(self.drop_path,
                             name="drop_path1")(h.astype(x.dtype),
                                                deterministic)
            h = _manual_layer_norm(x, g2, b2, self.norm_eps, dt)
            h = exact_gelu(h @ w1.astype(dt) + bb1.astype(dt))
            h = nn.Dropout(self.drop, deterministic=deterministic)(h)
            h = h @ w2.astype(dt) + bb2.astype(dt)
            h = nn.Dropout(self.drop, deterministic=deterministic)(h)
            x = x + DropPath(self.drop_path,
                             name="drop_path2")(h.astype(x.dtype),
                                                deterministic)
            if post_norm is not None:
                x = _manual_layer_norm(x, post_norm[0], post_norm[1],
                                       self.norm_eps, dt).astype(x.dtype)
            return x

        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.qkv_bias,
                      self.attn_drop, self.drop, dtype=self.dtype,
                      fused=False, name="attn")(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        h = Mlp(hidden, self.dim, self.drop,
                dtype=self.dtype, name="mlp")(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        if post_norm is not None:
            x = _manual_layer_norm(x, post_norm[0], post_norm[1],
                                   self.norm_eps,
                                   self.dtype or x.dtype).astype(x.dtype)
        return x


def _manual_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                       eps: float, dtype) -> jax.Array:
    """LayerNorm with f32 statistics (flax semantics) on explicit params."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(dtype)


class AdaLayerNorm(nn.Module):
    """LayerNorm with γ/β regressed from a conditioning feature.

    Preserves the reference's exact normalization: unbiased std over the
    channel axis and ``(std + eps)`` in the denominator (not sqrt(var+eps)).
    """

    num_features: int
    cond_dim: int = 2048
    eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        gamma = nn.Dense(self.num_features, dtype=self.dtype,
                         name="mlp_gamma")(cond)
        beta = nn.Dense(self.num_features, dtype=self.dtype,
                        name="mlp_beta")(cond)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        n = x.shape[-1]
        var = jnp.var(x, axis=-1, keepdims=True) * (n / (n - 1))
        std = jnp.sqrt(var)
        return (
            gamma[:, None, :] * (x - mean) / (std + self.eps)
            + beta[:, None, :]
        )


class AdaLayerNormParams(nn.Module):
    """Owns :class:`AdaLayerNorm`'s parameter tree (mlp_gamma/mlp_beta
    Dense) and regresses the per-clip γ/β vectors WITHOUT applying the
    normalization — the norm itself runs inside the fused decoder kernel
    (ops/fused_attention.fused_ada_block)."""

    num_features: int
    cond_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, cond: jax.Array):
        kg, bg = DenseParams(self.cond_dim, self.num_features,
                             name="mlp_gamma")()
        kb, bb = DenseParams(self.cond_dim, self.num_features,
                             name="mlp_beta")()
        dt = self.dtype or cond.dtype
        c = cond.astype(dt)
        gamma = c @ kg.astype(dt) + bg.astype(dt)
        beta = c @ kb.astype(dt) + bb.astype(dt)
        return gamma, beta


class AdaBlockParams(nn.Module):
    """Owns :class:`AdaBlock`'s parameter tree unapplied and regresses its
    per-clip AdaLN vectors — feeds the fused CoevoBlock kernel."""

    dim: int
    cond_dim: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, cond: jax.Array):
        g1, b1 = AdaLayerNormParams(self.dim, self.cond_dim,
                                    dtype=self.dtype, name="norm1")(cond)
        wqkv, bqkv, wproj, bproj = AttentionParams(
            self.dim, self.qkv_bias, name="attn")()
        g2, b2 = AdaLayerNormParams(self.dim, self.cond_dim,
                                    dtype=self.dtype, name="norm2")(cond)
        w1, bb1, w2, bb2 = MlpParams(
            self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
        return ((g1, b1, g2, b2),
                (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2))


class CrossAttentionParams(nn.Module):
    """Param tree identical to :class:`CrossAttention` (wq/wk/wv/proj)."""

    q_dim: int
    v_dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wq, bq = DenseParams(self.q_dim, self.q_dim, self.qkv_bias,
                             name="wq")()
        wk, bk = DenseParams(self.q_dim, self.q_dim, self.qkv_bias,
                             name="wk")()
        wv, bv = DenseParams(self.v_dim, self.v_dim, self.qkv_bias,
                             name="wv")()
        wproj, bproj = DenseParams(self.v_dim, self.q_dim, True,
                                   name="proj")()
        zeros = lambda n: jnp.zeros((n,), jnp.float32)  # noqa: E731
        return (wq, bq if bq is not None else zeros(self.q_dim),
                wk, bk if bk is not None else zeros(self.q_dim),
                wv, bv if bv is not None else zeros(self.v_dim),
                wproj, bproj)


class CrossAttentionBlockParams(nn.Module):
    """Owns :class:`CrossAttentionBlock`'s tree unapplied (fused path)."""

    q_dim: int
    k_dim: int
    v_dim: int
    cond_dim: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, cond: jax.Array):
        gq, bq = AdaLayerNormParams(self.q_dim, self.cond_dim,
                                    dtype=self.dtype, name="normq")(cond)
        gk, bk = AdaLayerNormParams(self.k_dim, self.cond_dim,
                                    dtype=self.dtype, name="normk")(cond)
        gv, bv = AdaLayerNormParams(self.v_dim, self.cond_dim,
                                    dtype=self.dtype, name="normv")(cond)
        g2, b2 = AdaLayerNormParams(self.q_dim, self.cond_dim,
                                    dtype=self.dtype, name="norm2")(cond)
        attn = CrossAttentionParams(self.q_dim, self.v_dim, self.qkv_bias,
                                    name="attn")()
        w1, bb1, w2, bb2 = MlpParams(
            self.q_dim, int(self.q_dim * self.mlp_ratio), name="mlp")()
        return ((gq, bq, gk, bk, gv, bv, g2, b2),
                attn + (w1, bb1, w2, bb2))


class CrossAttention(nn.Module):
    """Cross-attention with distinct query/key/value streams.

    The value stream may have a different channel width (``v_dim``) than the
    query/key streams (``dim``); the output projection maps v_dim → dim.
    """

    dim: int
    v_dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, xq: jax.Array, xk: jax.Array, xv: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        B, N, C = xq.shape
        M = xk.shape[1]
        H = self.num_heads
        dh = C // H
        dv = self.v_dim // H

        q = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="wq")(xq)
        k = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="wk")(xk)
        v = nn.Dense(self.v_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="wv")(xv)
        q = q.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, H, dv).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          precision=_attn_precision(self.dtype)) * dh ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         precision=_attn_precision(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.v_dim)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class AdaBlock(nn.Module):
    """Self-attention block whose norms are AdaLayerNorms (conditioned)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        # The long-token streams (the decoder's 431 coarse vertices) run
        # the WHOLE conditioned block as one Pallas kernel: γ/β regressed
        # outside (tiny [B,2048]→[B,C] matmuls), AdaLN + MHSA + AdaLN +
        # MLP + residuals in one VMEM pass per clip. Short streams keep
        # the grouped fused-attention path (the per-clip grid would
        # under-fill the MXU at N≈19). Stochastic depth enters the kernel
        # as per-clip branch masks; only element-level dropout forces the
        # modular fallback.
        kernel_ok = self.fused and x.shape[1] > 64 and (
            deterministic or (self.drop == 0.0 and self.attn_drop == 0.0))
        if kernel_ok:
            from pmce_tpu.ops.fused_attention import fused_ada_block

            gamma1, beta1 = AdaLayerNormParams(
                self.dim, cond_dim=cond.shape[-1], dtype=self.dtype,
                name="norm1")(cond)
            wqkv, bqkv, wproj, bproj = AttentionParams(
                self.dim, self.qkv_bias, name="attn")()
            gamma2, beta2 = AdaLayerNormParams(
                self.dim, cond_dim=cond.shape[-1], dtype=self.dtype,
                name="norm2")(cond)
            w1, bb1, w2, bb2 = MlpParams(
                self.dim, int(self.dim * self.mlp_ratio), name="mlp")()
            dt = self.dtype or x.dtype
            masks = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                shape = (x.shape[0], 1, 1)
                m1 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                m2 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                masks = (m1.astype(jnp.float32) / keep,
                         m2.astype(jnp.float32) / keep)
            return fused_ada_block(
                x.astype(dt), gamma1, beta1, gamma2, beta2,
                (wqkv, bqkv, wproj, bproj, w1, bb1, w2, bb2),
                self.num_heads, 1e-6, masks).astype(x.dtype)

        h = AdaLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x, cond)
        h = Attention(self.dim, self.num_heads, self.qkv_bias,
                      self.attn_drop, self.drop, dtype=self.dtype,
                      fused=self.fused, name="attn")(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = AdaLayerNorm(self.dim, dtype=self.dtype, name="norm2")(x, cond)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                dtype=self.dtype, name="mlp")(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x


class CrossAttentionBlock(nn.Module):
    """Cross-attention + FFN with AdaLayerNorm conditioning on all streams."""

    q_dim: int
    k_dim: int
    v_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = None
    fused: bool = False

    @nn.compact
    def __call__(self, xq: jax.Array, xk: jax.Array, xv: jax.Array,
                 cond: jax.Array, deterministic: bool = True) -> jax.Array:
        # Whole-block Pallas path (forward AND backward kernels): AdaLN on
        # all three streams + cross-attention + AdaLN'd MLP + residuals in
        # one VMEM pass per clip. Gated like AdaBlock: enough tokens to
        # fill the per-clip grid, stochastic depth rides as per-clip
        # branch masks, element-level dropout forces the modular fallback.
        kernel_ok = self.fused and max(xq.shape[1], xk.shape[1]) > 64 and (
            deterministic or (self.drop == 0.0 and self.attn_drop == 0.0))
        if kernel_ok:
            from pmce_tpu.ops.fused_attention import fused_ca_block

            # Declare through the holders AT THE SAME NAMES as the modular
            # submodules — the parameter tree must be path-identical.
            gq, bq = AdaLayerNormParams(self.q_dim, cond.shape[-1],
                                        dtype=self.dtype,
                                        name="normq")(cond)
            gk, bk = AdaLayerNormParams(self.k_dim, cond.shape[-1],
                                        dtype=self.dtype,
                                        name="normk")(cond)
            gv, bv = AdaLayerNormParams(self.v_dim, cond.shape[-1],
                                        dtype=self.dtype,
                                        name="normv")(cond)
            g2, b2 = AdaLayerNormParams(self.q_dim, cond.shape[-1],
                                        dtype=self.dtype,
                                        name="norm2")(cond)
            attn_w = CrossAttentionParams(self.q_dim, self.v_dim,
                                          self.qkv_bias, name="attn")()
            w1, bb1, w2, bb2 = MlpParams(
                self.q_dim, int(self.q_dim * self.mlp_ratio),
                name="mlp")()
            w = attn_w + (w1, bb1, w2, bb2)
            dt = self.dtype or xq.dtype
            masks = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                shape = (xq.shape[0], 1, 1)
                m1 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                m2 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, shape)
                masks = (m1.astype(jnp.float32) / keep,
                         m2.astype(jnp.float32) / keep)
            return fused_ca_block(
                xq.astype(dt), xk.astype(dt), xv.astype(dt),
                (gq, gk, gv, g2), (bq, bk, bv, b2), w,
                self.num_heads, 1e-6, masks).astype(xq.dtype)

        nq = AdaLayerNorm(self.q_dim, dtype=self.dtype, name="normq")(xq, cond)
        nk = AdaLayerNorm(self.k_dim, dtype=self.dtype, name="normk")(xk, cond)
        nv = AdaLayerNorm(self.v_dim, dtype=self.dtype, name="normv")(xv, cond)
        h = CrossAttention(self.q_dim, self.v_dim, self.num_heads,
                           self.qkv_bias, self.attn_drop, self.drop,
                           dtype=self.dtype,
                           name="attn")(nq, nk, nv, deterministic)
        xq = xq + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = AdaLayerNorm(self.q_dim, dtype=self.dtype, name="norm2")(xq, cond)
        # Flatten to 2D around the MLP: on TPU, XLA lowers the batched
        # [B, N, C] @ [C, hid] form of these small-feature streams through
        # a windowed-convolution emitter with batch-in-lanes layout (~16×
        # slower than the plain matmul); [B·N, C] gets the clean emitter.
        B, N, _ = h.shape
        h = Mlp(int(self.q_dim * self.mlp_ratio), self.q_dim, self.drop,
                dtype=self.dtype, name="mlp")(
                    h.reshape(B * N, -1), deterministic).reshape(B, N, -1)
        xq = xq + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return xq


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU over the leading time axis.

    Torch gate conventions (reset/update/new ordering, separate input and
    hidden biases, ``n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))``) so that
    reference GRU checkpoints import directly. Scans with ``nn.RNN`` /
    ``lax.scan`` — static T, XLA-friendly.

    Parity target: the ``nn.GRU(2048, 1024, bidirectional=True,
    num_layers=2)`` in /root/reference/lib/models/CoevoDecoder.py:216-229.
    """

    hidden_dim: int
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 mid_index: int | None = None) -> jax.Array:
        """x: [T, B, C] → [T, B, 2 * hidden_dim].

        Scan-latency engineering (the recurrent chain is the only part of
        the whole model that cannot parallelize over T):
        - the input projection (2/3 of the cell FLOPs) is hoisted OUT of
          the scan and computed for all T steps in one fat matmul;
        - the forward and backward DIRECTIONS run in ONE scan: their
          recurrent weights stack into a [2, H, 3H] batched matmul and the
          carry is [2, B, H], halving the sequential step count per layer.
        Values are bit-identical to the naive per-step formulation (same
        contraction per direction, no reassociation).

        mid_index: if set, return ONLY the step-``mid_index`` output of the
        final layer as [B, 2 * hidden_dim]. The final layer then scans just
        the steps that output depends on — forward 0..mid (mid+1 steps),
        backward T-1..mid (T-mid steps) — and skips the input projection of
        the trimmed steps. Bit-identical to slicing the full output: a GRU
        output at step t depends only on inputs 0..t (its direction's
        prefix), so the dropped steps were dead work whenever only the mid
        frame is consumed, which is all the reference ever does with this
        GRU (CoevoDecoder.py:229 takes ``y[int(T/2)]``).
        """
        T, B, _ = x.shape
        H = self.hidden_dim
        dt = self.dtype or x.dtype
        # Under the bf16 policy the whole per-direction scan runs as ONE
        # Pallas kernel (ops/fused_attention.fused_gru_layer): recurrent
        # weights VMEM-resident across all T steps, carry in VMEM scratch.
        # f32 keeps the XLA scan — at H=1024 the f32 weights alone
        # (~12.6 MB) plus stream buffers exceed the ~16 MB VMEM budget.
        use_kernel = dt == jnp.bfloat16 and B % 8 == 0
        for layer in range(self.num_layers):
            cells = [TorchGRUCell(H, in_dim=x.shape[-1], dtype=self.dtype,
                                  name=f"l{layer}_{name}")
                     for name in ("fwd", "bwd")]
            if mid_index is not None and layer == self.num_layers - 1:
                # Final layer, mid-frame-only: unequal per-direction
                # lengths, so the directions scan separately.
                xf, xb = x[: mid_index + 1], x[::-1][: T - mid_index]
                if use_kernel:
                    from pmce_tpu.ops.fused_attention import (
                        fused_gru_layer,
                        fused_gru_layer_rev,
                    )

                    hf = fused_gru_layer(cells[0].precompute_inputs(xf),
                                         cells[0].hh_kernel(),
                                         cells[0].hh_bias())[-1]
                    # Backward direction over rows mid..T−1: the reversed
                    # scan's row 0 is the hidden state after the full
                    # sweep (== the old x[::-1] formulation's [-1]), and
                    # the [T−1−t] index maps replace the explicit reverse.
                    hb = fused_gru_layer_rev(
                        cells[1].precompute_inputs(x[mid_index:]),
                        cells[1].hh_kernel(), cells[1].hh_bias())[0]
                    return jnp.concatenate([hf, hb], axis=-1)
                outs = []
                for cell, xd in zip(cells, (xf, xb)):
                    whh = cell.hh_kernel().astype(dt)
                    bhh = cell.hh_bias().astype(dt)

                    def step(carry, gi_t, whh=whh, bhh=bhh):
                        gh = jnp.dot(carry, whh) + bhh
                        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                        r = jax.nn.sigmoid(i_r + h_r)
                        z = jax.nn.sigmoid(i_z + h_z)
                        n = jnp.tanh(i_n + r * h_n)
                        return (1.0 - z) * n + z * carry, None

                    h_last, _ = jax.lax.scan(
                        step, jnp.zeros((B, H), dt),
                        cell.precompute_inputs(xd))
                    outs.append(h_last)
                return jnp.concatenate(outs, axis=-1)
            if use_kernel:
                from pmce_tpu.ops.fused_attention import (
                    fused_gru_layer,
                    fused_gru_layer_rev,
                )

                ys_f = fused_gru_layer(cells[0].precompute_inputs(x),
                                       cells[0].hh_kernel(),
                                       cells[0].hh_bias())
                # The backward direction consumes the SAME projections in
                # reversed order (the projection is per-step), and the
                # reversed-scan kernel emits its outputs already back in
                # forward time order — both [T, B, ·] reversal copies of
                # the old x[::-1] / ys_b[::-1] formulation fold into the
                # kernel's index maps.
                ys_b = fused_gru_layer_rev(cells[1].precompute_inputs(x),
                                           cells[1].hh_kernel(),
                                           cells[1].hh_bias())
                x = jnp.concatenate([ys_f, ys_b], axis=-1)
                continue
            # gi for both directions, each one fat [T, B, 3H] matmul.
            gi = jnp.stack([cells[0].precompute_inputs(x),
                            cells[1].precompute_inputs(x[::-1])])  # [2,T,B,3H]
            gi = jnp.swapaxes(gi, 0, 1)                    # [T, 2, B, 3H]
            # Stacked recurrent weights: one [2,B,H]×[2,H,3H] bmm per step.
            whh = jnp.stack([c.hh_kernel() for c in cells]).astype(dt)
            bhh = jnp.stack([c.hh_bias() for c in cells]).astype(dt)

            def step(carry, gi_t, whh=whh, bhh=bhh):
                gh = jnp.einsum("dbh,dhk->dbk", carry, whh) + bhh[:, None]
                i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h = (1.0 - z) * n + z * carry
                return h, h

            h0 = jnp.zeros((2, B, H), dt)
            _, ys = jax.lax.scan(step, h0, gi)             # [T, 2, B, H]
            x = jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1)
        return x


class TorchGRUCell(nn.Module):
    """A single GRU cell with torch's gate math and weight layout.

    Parameters live in :class:`DenseParams` holders (identical tree to
    ``nn.Dense``: ``ih/{kernel,bias}``, ``hh/{kernel,bias}``) so the
    recurrent weights can be read unapplied for direction-stacked scans.
    """

    hidden_dim: int
    in_dim: int
    dtype: Any = None

    def setup(self):
        self._ih = DenseParams(self.in_dim, 3 * self.hidden_dim, name="ih")
        self._hh = DenseParams(self.hidden_dim, 3 * self.hidden_dim,
                               name="hh")

    def precompute_inputs(self, x: jax.Array) -> jax.Array:
        """Input-gate projections for a whole [T, B, I] sequence."""
        k, b = self._ih()
        dt = self.dtype or x.dtype
        return x.astype(dt) @ k.astype(dt) + b.astype(dt)

    def hh_kernel(self) -> jax.Array:
        """Recurrent kernel [H, 3H] (for direction-stacked scans)."""
        return self._hh()[0]

    def hh_bias(self) -> jax.Array:
        return self._hh()[1]

    def step(self, gi: jax.Array, h: jax.Array) -> jax.Array:
        k, b = self._hh()
        dt = self.dtype or h.dtype
        gh = h.astype(dt) @ k.astype(dt) + b.astype(dt)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        return self.step(self.precompute_inputs(x), h)


def truncated_normal_init(stddev: float = 0.02) -> Callable:
    return nn.initializers.truncated_normal(stddev=stddev)
