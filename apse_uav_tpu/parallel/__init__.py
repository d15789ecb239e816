"""Device-mesh / sharding helpers (SURVEY.md §2.3).

The reference is single-device; parallelism here is a designed-in
capability: data parallelism over frames/batches on an ICI mesh for every
stateless stage (preproc, detection, pose), with XLA-emitted collectives for
metric reductions — no NCCL analogue.
"""

from apse_uav_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicate,
    shard_batch,
    sharded_inference_fn,
)
