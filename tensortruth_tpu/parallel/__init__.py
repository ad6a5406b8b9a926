from tensortruth_tpu.parallel.mesh import (
    DATA_AXIS,
    SHARD_AXIS,
    make_mesh,
    replicated,
    row_sharded,
)
from tensortruth_tpu.parallel.sharded_topk import shard_corpus, sharded_topk

__all__ = [
    "DATA_AXIS",
    "SHARD_AXIS",
    "make_mesh",
    "replicated",
    "row_sharded",
    "shard_corpus",
    "sharded_topk",
]

# Multi-process global-mesh path (parallel/distributed.py) is imported
# lazily by deployments that call jax.distributed — importing it here would
# drag the distributed runtime into every single-process user.
