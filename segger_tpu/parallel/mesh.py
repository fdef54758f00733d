"""Device-mesh utilities: SPMD data parallelism over tiles.

The reference trains on one GPU in one process (SURVEY §2.11); segger-tpu
scales by sharding the stacked-tile batch axis over a ``jax.sharding``
mesh.  Training tiles are independent graphs (cross-tile edges are
dropped), so tile-data-parallelism is exact — XLA inserts the gradient
all-reduce over ICI.  Multi-host whole-slide prediction additionally uses
halo exchange (``segger_tpu.parallel.halo``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (pod slices over DCN).

    Thin wrapper over ``jax.distributed.initialize`` — on Cloud TPU pods
    all arguments are auto-detected from the environment; pass them
    explicitly for custom launchers.  After this, ``jax.devices()``
    spans every host; the halo predict paths place inputs with
    ``jax.make_array_from_callback`` (each process feeds its
    addressable shards) and gather outputs with
    ``multihost_utils.process_allgather``
    (``parallel.halo.put_sharded`` / ``fetch_global``), so collectives
    ride ICI within a slice and DCN across slices.  Every process
    currently builds the full host graph before sharding — acceptable
    while the host pipeline is replicated per host.  SURVEY §5.8.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis: str = "data",
) -> Mesh:
    """1D mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_tile_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a stacked TileGraph with its leading (tile) axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
