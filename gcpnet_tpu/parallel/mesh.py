"""Device mesh + sharding rules.

The reference scales with Lightning DDP over NCCL (SURVEY.md §2.8); here
data parallelism is expressed as shardings over a 1-D ``dp`` mesh: the
batch's leading (node/edge/graph) axes are sharded across devices, params
are replicated, and XLA inserts the gradient ``psum`` over ICI when the
jitted train step consumes sharded batches.  Multi-host runs extend the
same mesh over DCN via ``jax.distributed.initialize`` (see
gcpnet_tpu.train.trainer).

GraphBatch sharding note: a padded GraphBatch is dp-shardable only if each
device's node/edge shard is self-contained.  The host pipeline therefore
builds ``num_devices`` equal-shaped sub-batches and concatenates them, so
edge indices never cross shard boundaries (see
gcpnet_tpu.data.batching.collate_for_devices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcpnet_tpu.graph import GraphBatch


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "dp"
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading-axis sharding for batch arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graph_batch(batch: GraphBatch, mesh: Mesh, axis_name: str = "dp"):
    """Device-put a host GraphBatch with every leading axis sharded over
    ``dp``.  All leading dims must be divisible by the mesh size."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        import jax.numpy as jnp

        arr = jnp.asarray(x)
        if arr.ndim == 0:
            return jax.device_put(arr, replicated_sharding(mesh))
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(put, batch)


