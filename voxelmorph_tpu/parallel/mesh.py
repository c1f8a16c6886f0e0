"""Device mesh + sharding rules: the framework's scale-out substrate.

The reference's parallelism is single-host data-parallel Keras/NCCL
(SURVEY §2.8). Here scale-out is first-class and TPU-native:

  * a 2-D logical mesh ``('data', 'space')`` — batch data-parallelism over
    ICI, plus optional spatial sharding of the volume grid (the
    registration-domain analog of sequence parallelism) for volumes that
    don't fit one chip's HBM;
  * ``NamedSharding`` rules for batches, params, and dense fields; XLA GSPMD
    inserts the gradient psums / halo exchanges;
  * multi-host entry via ``jax.distributed.initialize`` (no-op single host).

Data crosses slice boundaries only through the batch axis, so gradient
all-reduce rides ICI inside a slice and DCN across slices automatically.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_mesh_for_batch", "batch_sharding", "replicated",
           "shard_batch", "replicate", "initialize_distributed"]


def initialize_distributed(coordinator: Optional[str] = None, num_processes: int = 1,
                           process_id: int = 0):
    """Initialize multi-host JAX if running with >1 process.

    Call before any other jax API touches the backend. After this,
    ``jax.devices()`` spans every host in the job, so the same mesh-building
    code scales from one chip to a multi-host pod slice: gradient psums ride
    ICI within a slice and DCN across slices automatically. The CLI trainers
    expose this via --coordinator/--num-processes/--process-id.
    """
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "space"),
              devices=None) -> Mesh:
    """Create a ('data', 'space') mesh.

    Default puts all devices on the data axis. Pass shape=(d, s) to dedicate
    s-way spatial sharding (d*s must equal device count).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != device count {n}"
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, axis_names)


def make_mesh_for_batch(batch_size: int, spatial_size: Optional[int] = None,
                        devices=None) -> Mesh:
    """Build a ('data','space') mesh adapted to a batch size.

    The data axis gets the largest device count dividing the batch; leftover
    devices go to the space axis when they divide the first spatial dim
    (otherwise they are left unused on a 1-entry axis — correct, if idle).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    data = math.gcd(batch_size, n)
    space = 1
    rest = n // data
    if spatial_size is not None and rest > 1 and spatial_size % rest == 0:
        space = rest
    used = devices[: data * space]
    if len(used) < n:
        import warnings
        warnings.warn(
            f"make_mesh_for_batch: using {len(used)} of {n} devices "
            f"(batch_size={batch_size} gives {data}-way data parallelism"
            + ("" if spatial_size is None else
               f", spatial_size={spatial_size} not divisible by {rest}")
            + "). Increase the batch size to a multiple of the device count, "
            "or pass spatial_size (--spatial-shard) to use the idle devices "
            "for spatial sharding.", stacklevel=2)
    return make_mesh(shape=(data, space), devices=used)


def batch_sharding(mesh: Mesh, ndim: int, spatial: bool = False) -> NamedSharding:
    """Sharding for a batched array (B, *spatial, C): batch over 'data', and
    optionally the first spatial dim over 'space'."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial and ndim >= 3 and mesh.shape["space"] > 1:
        spec[1] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, spatial: bool = False):
    """device_put a pytree of batched numpy arrays with batch-DP sharding."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), spatial=spatial))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
