"""Dataset families: Human3.6M, 3DPW, MPI-INF-3DHP, COCO, MPII."""

from pmce_tpu.data.datasets.base import VideoMeshDataset  # noqa: F401
from pmce_tpu.data.datasets.h36m import Human36M  # noqa: F401
from pmce_tpu.data.datasets.pw3d import PW3D  # noqa: F401
from pmce_tpu.data.datasets.mpii3d import MPII3D  # noqa: F401
from pmce_tpu.data.datasets.coco import MSCOCO  # noqa: F401
from pmce_tpu.data.datasets.mpii import MPII  # noqa: F401
