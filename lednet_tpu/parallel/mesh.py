"""Device mesh + sharding helpers.

The reference scales with DDP/NCCL (SURVEY.md §2.8); the TPU-native
equivalent is ONE SPMD program over a ``jax.sharding.Mesh``: the batch axis is
sharded over the ``data`` mesh axis, parameters are replicated, and XLA
inserts the gradient ``psum`` (replacing DDP's all-reduce) and the cross-
replica BatchNorm reductions (replacing SyncBN) automatically from the
sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(devices: Optional[Sequence] = None, spatial: int = 2,
                 axis_names: Sequence[str] = ('data', 'spatial')) -> Mesh:
    """data x spatial mesh: batch sharded over ``data``, image rows over
    ``spatial``. GSPMD inserts the conv halo exchanges and turns the
    BatchNorm batch-mean into the cross-device SyncBN reduction — spatial
    partitioning is the capability the reference cannot express with DDP
    (its per-GPU module always sees whole images)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % spatial:
        raise ValueError(f'{len(devices)} devices not divisible by '
                         f'spatial={spatial}')
    arr = np.array(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(arr, tuple(axis_names))


def image_sharding(mesh: Mesh, data_axis: str = 'data',
                   spatial_axis: str = 'spatial') -> NamedSharding:
    """NHWC batch sharded over (data, spatial): N over data, H over spatial."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
