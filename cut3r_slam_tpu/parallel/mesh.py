"""Device mesh + sharding helpers.

The reference scales training via HF Accelerate DDP over NCCL
(/root/reference/src/train.py:111-120) and runs inference single-GPU. The
TPU-native story (SURVEY.md §2.5): one `jax.sharding.Mesh` covering the
slice, data parallelism over the ``dp`` axis and optional parameter (FSDP)
sharding over ``fsdp``; XLA inserts the psum/all-gather collectives over
ICI. The SLAM inference loop is a single-controller program whose jitted
stages carry sharding annotations from the same mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "fsdp_shard_params"]


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("dp", "fsdp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default layout puts all devices on ``dp`` and 1 on ``fsdp``; pass
    ``shape`` to split, e.g. shape=(2, 4) on a v5e-8.
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, tree, axis: str = "dp", dim: int = 0):
    """Shard every leaf's ``dim`` over ``axis``; other dims replicated."""
    def _shard(x):
        spec = [None] * x.ndim
        spec[dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(_shard, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def fsdp_shard_params(mesh: Mesh, params, axis: str = "fsdp",
                      min_size: int = 2 ** 16):
    """Shard each large parameter's biggest divisible dim over ``axis``.

    Small params stay replicated. This is the standard fully-sharded layout:
    XLA all-gathers each param just-in-time and reduce-scatters grads.
    """
    n = mesh.shape[axis]

    def _spec(x):
        if x.size < min_size or n == 1:
            return P()
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _spec(x))), params)
