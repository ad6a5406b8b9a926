"""Device-mesh construction and sharding helpers.

The reference scales retrieval with a host thread pool over per-module
indexes (reference rag_engine.py:420-461) — its only "distributed" primitive.
Here the equivalent is a real `jax.sharding.Mesh`:

* axis ``shards`` — rows of the corpus embedding matrix are sharded across
  devices; every device scores its row slice and the partial top-k results
  merge over ICI (`all_gather`), replacing the thread-pool gather.
* axis ``data`` — query/pair batches are sharded for data-parallel encoder
  and reranker forwards (replaces ``embed_batch_size`` scaling,
  reference config_schema.py:48-61).

A v5e-8 slice is the design target (BASELINE.json config 4); the same mesh
runs on any device set, including the N-virtual-CPU-device mesh used in
tests and the driver's multichip dry run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"  # corpus-row sharding (retrieval fan-out)
DATA_AXIS = "data"  # batch sharding (encoder/reranker DP)


def make_mesh(
    n_shards: int | None = None,
    n_data: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, shards) mesh over the available devices.

    Default: all devices on the ``shards`` axis — retrieval throughput is
    HBM-bandwidth-bound, so corpus sharding is the primary scaling dimension.
    """
    devices = devices if devices is not None else jax.devices()
    if n_shards is None:
        n_shards = len(devices) // n_data
    use = n_data * n_shards
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_shards} needs {use} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:use]).reshape(n_data, n_shards)
    return Mesh(grid, (DATA_AXIS, SHARD_AXIS))


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for the (N, D) corpus matrix: rows split over ``shards``."""
    return NamedSharding(mesh, P(SHARD_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) batches: split over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))
