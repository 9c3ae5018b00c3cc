"""Device mesh and sharding helpers.

The reference's "distributed" story is PyTorch-Lightning DDP + a rank-sharded
sampler (SURVEY.md §2.7-2.8). The TPU-native design instead threads one
explicit `jax.sharding.Mesh` through the stack:

  * axis "data":  data parallelism — the batch dimension of every array in a
    training/eval batch is sharded here; XLA inserts the psum gradient
    all-reduce over ICI automatically because params are replicated while
    activations are data-sharded.
  * axis "model": reserved seam for tensor/spatial partitioning (SURVEY.md
    §2.7 "mesh_axes seam"). Size 1 in the default configuration; wiring it
    through now means enabling TP later is a sharding-annotation change, not
    a refactor.

Multi-host: `jax.distributed.initialize()` + the same mesh over
`jax.devices()` spans slices transparently; per-host data loading uses
`process_index` sharding in the input pipeline (data/loader.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over the data axis AND height over the model axis.

    This is spatial partitioning (the conv-net analog of sequence
    parallelism, SURVEY.md §5): XLA SPMD propagates the H sharding through
    every conv/pool and inserts halo exchanges (collective-permute of the
    kernel-overlap rows) over ICI automatically. Use when per-chip batch
    would be < 1 or activations of large images exceed HBM."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading dim = batch) onto the
    mesh with the batch dim split over the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
