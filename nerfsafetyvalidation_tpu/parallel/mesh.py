"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL data parallelism (nerf/utils.py:305-307, :766-767,
:867-882).

Design (per SURVEY.md §2c): the model is tiny (~17M params hash table + ~12k
MLP) so parameters are fully REPLICATED on every chip; the ray batch (and, in
the validation layer, the rollout batch) is SHARDED along the batch axis over
a 1-D 'data' mesh riding ICI. Gradients reduce with a psum that XLA inserts
automatically when a jitted loss consumes sharded rays and produces
replicated grads — no hand-written collectives needed. The eval-time
dist.all_reduce / all_gather of the reference map to the same mechanism.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, batch_axis: int = 0, ndim: int = 2,
                axis: str = "data") -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = axis
    return NamedSharding(mesh, P(*spec))


def replicate_params(params, mesh: Mesh):
    return jax.device_put(params, replicated(mesh))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0, axis: str = "data"):
    """Place every array in `batch` with its `batch_axis` split over the mesh.
    Leading dim must be divisible by mesh size (pad upstream)."""
    def place(x):
        sh = ray_sharded(mesh, batch_axis, x.ndim, axis)
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(place, batch)
