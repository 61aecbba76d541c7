"""Packed-array dataset serialization — the real-data path.

The offline converters (``tools/convert_h36m.py`` etc.) read the reference's
exact on-disk formats (COCO-style annotation JSONs, joblib feature DBs,
NeuralAnnot SMPL fits — see each converter's docstring for the file:line
parity map) and emit ONE compressed npz per dataset split holding the
``SequenceData`` per-frame arrays plus the dataset's joint regressors. At
runtime ``load_packed`` restores them and the dataset classes build their
windowed views — no JSON parsing, no per-sample Python, no joblib in the
training path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pmce_tpu.data.synthetic import SyntheticSequenceData

# The packed format IS the SyntheticSequenceData layout; the alias makes the
# real-data intent explicit at call sites.
SequenceData = SyntheticSequenceData

_OPTIONAL = ("mesh_valid", "lift_valid", "reg_valid")
_FIELDS = [f.name for f in dataclasses.fields(SyntheticSequenceData)
           if f.name not in _OPTIONAL]

# Per-dataset joint regressors stored alongside the frame arrays so a packed
# npz is self-contained (the reference loads them from the SMPL wrapper,
# /root/reference/data/Human36M/dataset.py:49-75).
_REGRESSOR_KEYS = ("jr_smpl", "jr_h36m", "jr_coco")


def save_packed(data: SequenceData, path,
                jr_smpl: np.ndarray | None = None,
                jr_h36m: np.ndarray | None = None,
                jr_coco: np.ndarray | None = None,
                **extra: np.ndarray) -> None:
    """Write one dataset split as a compressed npz."""
    arrays = {}
    for name in _FIELDS + [o for o in _OPTIONAL
                           if getattr(data, o) is not None]:
        v = getattr(data, name)
        if v.dtype.kind in ("U", "S", "O"):
            v = np.asarray(v, dtype=np.str_)
        arrays[name] = v
    for key, v in zip(_REGRESSOR_KEYS, (jr_smpl, jr_h36m, jr_coco)):
        if v is not None:
            arrays[key] = np.asarray(v, dtype=np.float32)
    for key, v in extra.items():
        if key in arrays:
            raise ValueError(f"extra key {key!r} collides with a base field")
        arrays[key] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_packed(path) -> tuple[SequenceData, dict]:
    """Load a packed split.

    Returns:
      (SequenceData, aux) where aux holds the regressors (``jr_smpl`` /
      ``jr_h36m`` / ``jr_coco`` when present) and any extra arrays the
      converter stored (e.g. per-frame joint validity).
    """
    with np.load(path, allow_pickle=False) as z:
        missing = [f for f in _FIELDS if f not in z.files]
        if missing:
            raise ValueError(
                f"{path}: not a packed dataset npz (missing {missing})")
        kwargs = {f: z[f] for f in _FIELDS}
        for o in _OPTIONAL:
            if o in z.files:
                kwargs[o] = z[o]
        aux = {k: z[k] for k in z.files
               if k not in _FIELDS and k not in _OPTIONAL}
    return SequenceData(**kwargs), aux
