"""Device mesh + sharding helpers.

The reference is strictly single-GPU (engine.py:64; SURVEY §2
"Parallelism census: none"). Here data parallelism is first-class: a 1-D
``jax.sharding.Mesh`` over all local devices, batches sharded on the
leading axis, parameters replicated; XLA inserts the gradient psum over
ICI. SuperPoint is ~1.3M params, so DP is the only parallelism that
pays — model sharding would be pure overhead (SURVEY §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_parallel_shardings(mesh: Mesh, axis_name: str = "data"):
    """(batch_sharding, replicated_sharding) for the given mesh."""
    return NamedSharding(mesh, P(axis_name)), NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of host arrays with the batch axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
