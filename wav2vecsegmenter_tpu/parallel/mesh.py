"""Device mesh and sharding helpers.

The reference scales with single-host ``nn.DataParallel``
(train.py:312-315); the TPU-native equivalent is a 1-D data-parallel
``jax.sharding.Mesh`` over chips: batches are sharded on the 'data' axis,
params are replicated, and XLA inserts the gradient all-reduce (psum over
ICI) inside the jitted train step.  The helpers here also back the
multi-chip dry-run path (__graft_entry__.dryrun_multichip) and CPU tests
with ``--xla_force_host_platform_device_count``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh; n_data=-1 uses all available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data in (-1, None):
        n_data = len(devices)
    devices = np.array(devices[:n_data])
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh sharded along their leading axis.
    Leading dims must be divisible by the mesh size (loaders pad batches to
    the static batch size, so pick batch_size % n_devices == 0)."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Round a batch size up to a device multiple."""
    return ((batch_size + n_devices - 1) // n_devices) * n_devices
