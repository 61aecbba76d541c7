"""Offline ETL: reference-format dataset sources → packed npz splits.

Each submodule converts one dataset family from the exact on-disk layout
the reference consumes (COCO-style annotation JSONs, joblib feature DBs,
NeuralAnnot / SMPLify fit JSONs) into the framework's packed
``SequenceData`` arrays. The heavy per-sample work the reference does in
DataLoader workers (SMPL GT synthesis, projections) happens here ONCE,
batched, so the training path never touches JSON or per-sample Python.
"""

from pmce_tpu.data.etl.coco import convert_coco
from pmce_tpu.data.etl.h36m import convert_h36m
from pmce_tpu.data.etl.mpii import convert_mpii
from pmce_tpu.data.etl.mpii3d import convert_mpii3d
from pmce_tpu.data.etl.pw3d import convert_pw3d

__all__ = [
    "convert_h36m", "convert_pw3d", "convert_mpii3d", "convert_coco",
    "convert_mpii",
]
