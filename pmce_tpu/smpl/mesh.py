"""Mesh coarsening (6890 → 1723 → 431) as dense TPU matmuls.

The reference keeps scipy-sparse down/up-sampling matrices and multiplies
them per-sample with a custom sparse-matmul autograd op
(/root/reference/lib/models/backbones/mesh.py:8-111, graph_layers.py:12-31).
On TPU a dense [431, 6890] f32 matrix is ~11 MB and a single MXU matmul per
batch — strictly faster than sparse gather/scatter — so the coarsening
operators are densified once at load time.

Real ``mesh_downsampling.npz`` artifacts (scipy sparse objects) are converted
offline by ``tools/convert_mesh_downsampling.py``; tests use the synthetic
generator, which builds partition-style D and interpolation-style U matrices
with the same shapes and row-stochastic structure.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

LEVEL_SIZES = (6890, 1723, 431)


@dataclasses.dataclass(frozen=True)
class MeshCoarsening:
    """Dense down/up-sampling operators between mesh resolution levels."""

    D: tuple[np.ndarray, ...]  # D[i]: [sizes[i+1], sizes[i]]
    U: tuple[np.ndarray, ...]  # U[i]: [sizes[i], sizes[i+1]]

    @property
    def sizes(self) -> tuple[int, ...]:
        return (self.D[0].shape[1],) + tuple(d.shape[0] for d in self.D)

    def validate(self) -> None:
        for i, d in enumerate(self.D):
            assert d.shape == (self.sizes[i + 1], self.sizes[i])
            assert self.U[i].shape == (self.sizes[i], self.sizes[i + 1])

    def save(self, path: str) -> None:
        payload = {}
        for i, d in enumerate(self.D):
            payload[f"D{i}"] = d
            payload[f"U{i}"] = self.U[i]
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path: str) -> "MeshCoarsening":
        with np.load(path) as z:
            n = sum(1 for k in z.files if k.startswith("D"))
            D = tuple(z[f"D{i}"].astype(np.float32) for i in range(n))
            U = tuple(z[f"U{i}"].astype(np.float32) for i in range(n))
        mesh = cls(D=D, U=U)
        mesh.validate()
        return mesh


def synthetic_coarsening(seed: int = 0,
                         sizes: tuple[int, ...] = LEVEL_SIZES) -> MeshCoarsening:
    """Deterministic stand-in coarsening operators.

    D[i] partitions fine vertices into coarse groups and averages them
    (row-stochastic); U[i] interpolates each fine vertex from one or two
    coarse vertices (row-stochastic) — the same structure as the real
    COMA-style sampling matrices.
    """
    rng = np.random.default_rng(seed + 1000)
    D, U = [], []
    for lvl in range(len(sizes) - 1):
        n_fine, n_coarse = sizes[lvl], sizes[lvl + 1]
        owner = np.arange(n_fine) % n_coarse
        owner = rng.permutation(owner)

        d = np.zeros((n_coarse, n_fine), dtype=np.float64)
        for c in range(n_coarse):
            idx = np.nonzero(owner == c)[0]
            d[c, idx] = 1.0 / len(idx)

        u = np.zeros((n_fine, n_coarse), dtype=np.float64)
        w = 0.6 + 0.4 * rng.random(n_fine)
        second = rng.integers(0, n_coarse, size=n_fine)
        u[np.arange(n_fine), owner] = w
        u[np.arange(n_fine), second] += 1.0 - w
        u /= u.sum(axis=1, keepdims=True)

        D.append(d.astype(np.float32))
        U.append(u.astype(np.float32))
    mesh = MeshCoarsening(D=tuple(D), U=tuple(U))
    mesh.validate()
    return mesh


def default_coarsening_path() -> str:
    base = os.environ.get(
        "PMCE_TPU_DATA_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..", "data", "base_data"),
    )
    return os.path.join(base, "mesh_coarsening.npz")


def load_or_synthetic(seed: int = 0) -> MeshCoarsening:
    path = default_coarsening_path()
    if os.path.isfile(path):
        return MeshCoarsening.load(path)
    return synthetic_coarsening(seed=seed)


def ensure_cached_coarsening(seed: int = 0) -> MeshCoarsening:
    """Like ``load_or_synthetic`` but caches the generated operators."""
    path = default_coarsening_path()
    if os.path.isfile(path):
        return MeshCoarsening.load(path)
    m = synthetic_coarsening(seed=seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    m.save(path)
    return m


def downsample(mesh: MeshCoarsening, x: jax.Array, n1: int = 0,
               n2: int = 1) -> jax.Array:
    """Downsample vertices from level ``n1`` to level ``n2``.

    Args:
      x: [..., sizes[n1], 3].

    Returns:
      [..., sizes[n2], 3].
    """
    for i in range(n1, n2):
        # Pinned precision: these contract meter-scale COORDINATES, where
        # the default bf16 MXU pass costs ~mm against the <=0.1 mm parity
        # spec (preferred_element_type only sets the accumulator).
        x = jnp.einsum(
            "cf,...fk->...ck", jnp.asarray(mesh.D[i]), x,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype,
        )
    return x


def upsample(mesh: MeshCoarsening, x: jax.Array, n1: int = 1,
             n2: int = 0) -> jax.Array:
    """Upsample vertices from level ``n1`` back to level ``n2`` (< n1)."""
    for i in reversed(range(n2, n1)):
        x = jnp.einsum(
            "fc,...ck->...fk", jnp.asarray(mesh.U[i]), x,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x.dtype,
        )
    return x


def nearest_joint_per_vertex(joints: np.ndarray,
                             vertices: np.ndarray) -> np.ndarray:
    """Index of the nearest joint for every vertex.

    Parity target: /root/reference/lib/graph_utils.py:27-46 (used to
    re-initialize the 431 coarse vertices from lifted joints).

    Args:
      joints: [J, 3]; vertices: [V, 3].

    Returns:
      [V] int32 nearest-joint indices.
    """
    d2 = ((vertices[:, None, :] - joints[None, :, :]) ** 2).sum(-1)
    return np.argmin(d2, axis=1).astype(np.int32)
