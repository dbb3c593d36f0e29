"""Sharded CUT3R inference for multi-chip serving.

SURVEY.md §2.5: the reference serves on a single GPU; the TPU-native
scale-out shards the view-batch over the mesh's ``dp`` axis with
replicated parameters — XLA keeps every collective on ICI. Useful for
multi-camera rigs, batched offline reconstruction, and the eval sweeps.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import CUT3R
from .mesh import make_mesh, replicate

__all__ = ["make_sharded_forward"]


def make_sharded_forward(model: CUT3R, mesh: Optional[Mesh] = None,
                         batch_axis: str = "dp"):
    """Returns (fn, place_params, place_batch).

    fn(params, imgs): jitted forward with imgs (V, B, H, W, 3) sharded on
    B over ``batch_axis`` and params replicated. B must be divisible by
    the axis size.
    """
    mesh = mesh or make_mesh()

    batch_sharding = NamedSharding(mesh, P(None, batch_axis))
    out_sharding = NamedSharding(mesh, P(None, batch_axis))

    @jax.jit
    def fn(params, imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
        out = model.apply(params, imgs)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, out_sharding)
            if x.ndim >= 2 else x, out)

    def place_params(params):
        return replicate(mesh, params)

    def place_batch(imgs):
        return jax.device_put(imgs, batch_sharding)

    return fn, place_params, place_batch
