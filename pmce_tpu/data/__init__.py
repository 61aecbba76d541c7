"""Data pipelines: chunking, synthesis, datasets, loaders, conversions."""

from pmce_tpu.data.chunker import (  # noqa: F401
    split_into_chunks_mesh,
    split_into_chunks_pose,
)
from pmce_tpu.data.clip_dataset import (  # noqa: F401
    ClipDataset,
    MultiDataset,
    epoch_iterator,
)
from pmce_tpu.data.synthetic import generate_sequences  # noqa: F401
