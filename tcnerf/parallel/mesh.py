"""Device mesh + sharding layout for multi-chip training and inference.

The reference has NO distributed support of any kind (SURVEY.md §2.13). The
TPU-native scaling design:

  * mesh axes ('data', 'ray'): batch-level data parallelism over 'data', and
    ray/pose-level parallelism over 'ray' (this workload's "sequence" axis —
    rays x samples for rendering, guesses x probes for pose optimization);
  * parameters are replicated; gradient reduction is XLA's implicit psum
    inserted by jit from the output sharding — collectives ride ICI;
  * the host input pipeline feeds per-device shards (DCN only for multi-host).

Everything works on one chip (mesh of 1) and on an
xla_force_host_platform_device_count CPU mesh for testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data_axis: Optional[int] = None
              ) -> Mesh:
    """Mesh over the first n devices, factored as (data, ray).

    data_axis: size of the data-parallel axis (defaults to all devices, ray=1).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data_axis is None:
        data_axis = n
    assert n % data_axis == 0
    return Mesh(devices.reshape(data_axis, n // data_axis), ("data", "ray"))


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def nerf_batch_shardings(mesh: Mesh):
    """Shardings for the renderer batch
    (ray_o, ray_d, src_images, src_intrinsics, src_ext_inv), labels.

    Batch dim -> 'data'; the ray axis of ray tensors and labels -> 'ray'.
    """
    ray_spec = NamedSharding(mesh, P("data", "ray"))
    img_spec = NamedSharding(mesh, P("data"))
    inputs = (ray_spec, ray_spec, img_spec, img_spec, img_spec)
    labels = ray_spec
    return inputs, labels


def shard_nerf_batch(inputs, labels, mesh: Mesh):
    in_shardings, label_sharding = nerf_batch_shardings(mesh)
    inputs = tuple(jax.device_put(x, s) for x, s in zip(inputs, in_shardings))
    labels = jax.device_put(labels, label_sharding)
    return inputs, labels


def pose_shardings(mesh: Mesh):
    """Pose-optimizer sharding: the guess axis N -> the full mesh
    (both axes flattened), images replicated."""
    return NamedSharding(mesh, P(None, ("data", "ray")))
