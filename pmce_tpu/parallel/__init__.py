"""Device mesh, sharding rules, and host→device prefetch."""

from pmce_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from pmce_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    host_local_slice,
    initialize,
    shard_host_batch,
)
from pmce_tpu.parallel.prefetch import prefetch_to_device  # noqa: F401
