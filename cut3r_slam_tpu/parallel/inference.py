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


def tp_param_specs(params, axis: str = "tp"):
    """Megatron-style tensor-parallel PartitionSpecs for the transformer
    params (scaling-book layout): column-split the qkv/q/k/v and fc1
    kernels (output dim over ``axis``), row-split the attn out-proj and
    fc2 kernels (input dim over ``axis``) so each block needs ONE psum
    after attention and one after the MLP; biases follow their kernel's
    output sharding; embeddings/norms replicated. XLA SPMD inserts the
    collectives over ICI.
    """
    import flax
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    col_parents = ("qkv", "projq", "projk", "projv", "fc1")
    row_parents = ("proj", "fc2")

    def spec(path: str, x):
        parts = path.split("/")
        leaf, parent = parts[-1], parts[-2] if len(parts) > 1 else ""
        if leaf == "kernel" and x.ndim == 2:
            if parent in col_parents:
                return P(None, axis)
            if parent in row_parents:
                return P(axis, None)
        if leaf == "bias" and parent in col_parents:
            return P(axis)
        return P()

    out = {k: spec(k, v) for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(out, sep="/")


def make_tp_sharded_forward(model: CUT3R, mesh: Mesh,
                            batch_axis: str = "dp", tp_axis: str = "tp"):
    """dp x tp sharded forward: batch over ``dp``, attention/MLP kernels
    Megatron-split over ``tp`` (tp_param_specs). Returns
    (fn, place_params, place_batch)."""
    batch_sharding = NamedSharding(mesh, P(None, batch_axis))

    @jax.jit
    def fn(params, imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
        out = model.apply(params, imgs)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding)
            if x.ndim >= 2 else x, out)

    def place_params(params):
        specs = tp_param_specs(params, tp_axis)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs)

    def place_batch(imgs):
        return jax.device_put(imgs, batch_sharding)

    return fn, place_params, place_batch
