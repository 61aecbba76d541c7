"""Batched Procrustes / similarity alignment on device.

The reference computes Procrustes alignment one sample at a time in numpy
(/root/reference/lib/coord_utils.py:151-173, lib/eval_utils.py:92-244). Here
the whole eval batch is aligned with a single batched ``jnp.linalg.svd`` so
the metric pass stays on the TPU.

``rigid_align`` matches the reference formulation exactly:
  H = (A - muA)^T (B - muB) / n
  U s V^h = svd(H);  R = V^T U^T  (with det(R) sign fix applied to V, s)
  c = sum(s) / var(A);  t = -c R muA + muB
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Metric math must not degrade to the TPU's bf16 default matmul precision:
# PA-MPJPE parity is specified at ≤0.1 mm and bf16 contractions cost ~20 mm.
_HIGHEST = jax.lax.Precision.HIGHEST


def similarity_transform(A: jax.Array, B: jax.Array):
    """Least-squares similarity transform (c, R, t) aligning A onto B.

    Args:
      A: [..., N, 3] source points.
      B: [..., N, 3] target points.

    Returns:
      (c, R, t): scale [...], rotation [..., 3, 3], translation [..., 3].
    """
    n = A.shape[-2]
    mu_a = jnp.mean(A, axis=-2, keepdims=True)
    mu_b = jnp.mean(B, axis=-2, keepdims=True)
    Ac = A - mu_a
    Bc = B - mu_b

    H = jnp.einsum("...ni,...nj->...ij", Ac, Bc, precision=_HIGHEST) / n
    U, s, Vh = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vh, -1, -2)

    # det(R) < 0 → flip last singular value and last row of V (= last col of
    # V^T), exactly like the reference's sign fix.
    R0 = jnp.matmul(V, jnp.swapaxes(U, -1, -2), precision=_HIGHEST)
    det = jnp.linalg.det(R0)
    flip = (det < 0).astype(A.dtype)
    sign = 1.0 - 2.0 * flip  # +1 or -1
    s = s.at[..., -1].multiply(sign)
    V = V.at[..., :, -1].multiply(sign[..., None])
    R = jnp.matmul(V, jnp.swapaxes(U, -1, -2), precision=_HIGHEST)

    var_a = jnp.sum(jnp.var(A, axis=-2), axis=-1)
    c = jnp.sum(s, axis=-1) / var_a
    t = (
        -jnp.einsum("...,...ij,...j->...i", c, R, mu_a[..., 0, :],
                    precision=_HIGHEST)
        + mu_b[..., 0, :]
    )
    return c, R, t


def rigid_align(A: jax.Array, B: jax.Array) -> jax.Array:
    """Align A onto B with the optimal similarity transform.

    Args:
      A, B: [..., N, 3].

    Returns:
      [..., N, 3] transformed A.
    """
    c, R, t = similarity_transform(A, B)
    return (
        jnp.einsum("...,...ij,...nj->...ni", c, R, A, precision=_HIGHEST)
        + t[..., None, :]
    )
