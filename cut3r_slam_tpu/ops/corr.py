"""All-pairs correlation pyramid + radius lookup (DROID / RAFT style).

JAX counterpart of /root/reference/hislam2/modules/corr.py and the
``droid_backends.corr_index`` CUDA kernel: build a 4-level average-pooled
all-pairs correlation volume, then sample a (2r+1)^2 window around
bilinear coordinates at each level. The volume build is one big MXU
matmul; the lookup is a vectorized bilinear gather that XLA fuses — the
per-pixel CUDA gather kernel maps to `take`-based interpolation here.
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp

__all__ = ["build_corr_pyramid", "corr_lookup", "corr_volume"]


def corr_volume(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """(N, H, W, C) x2 -> (N, H, W, H, W) all-pairs correlation / 16."""
    N, H, W, C = fmap1.shape
    f1 = fmap1.reshape(N, H * W, C) / 4.0
    f2 = fmap2.reshape(N, H * W, C) / 4.0
    corr = jnp.einsum("nic,njc->nij", f1, f2)
    return corr.reshape(N, H, W, H, W)


def build_corr_pyramid(fmap1: jax.Array, fmap2: jax.Array,
                       num_levels: int = 4) -> List[jax.Array]:
    """Returns [ (N, H, W, H/2^i, W/2^i) ] for i in [0, num_levels)."""
    corr = corr_volume(fmap1, fmap2)
    N, H, W = corr.shape[:3]
    pyramid = [corr]
    c = corr.reshape(N * H * W, corr.shape[3], corr.shape[4], 1)
    for i in range(1, num_levels):
        c = jax.lax.reduce_window(
            c, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        pyramid.append(c.reshape(N, H, W, c.shape[1], c.shape[2]))
    return pyramid


def _bilinear_window_sample(vol: jax.Array, coords: jax.Array, radius: int):
    """vol: (N, H, W, h2, w2) level volume; coords: (N, H, W, 2) target
    (x, y) in level coordinates. Returns (N, H, W, (2r+1)^2)."""
    N, H, W, h2, w2 = vol.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=coords.dtype)
    dg = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)  # (D,D,2) (dy,dx)
    # window coords (N, H, W, D, D, 2): x = coords_x + dx, y = coords_y + dy
    cx = coords[..., 0:1, None] + dg[None, None, None, ..., 1]
    cy = coords[..., 1:2, None] + dg[None, None, None, ..., 0]
    cx = cx.reshape(N, H, W, -1)
    cy = cy.reshape(N, H, W, -1)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx = cx - x0
    wy = cy - y0

    def _gather(yi, xi):
        ok = (xi >= 0) & (xi < w2) & (yi >= 0) & (yi < h2)
        xi = jnp.clip(xi, 0, w2 - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h2 - 1).astype(jnp.int32)
        flat = vol.reshape(N, H, W, h2 * w2)
        idx = yi * w2 + xi
        vals = jnp.take_along_axis(flat, idx, axis=-1)
        return jnp.where(ok, vals, 0.0)

    v00 = _gather(y0, x0)
    v01 = _gather(y0, x0 + 1)
    v10 = _gather(y0 + 1, x0)
    v11 = _gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("radius",))
def corr_lookup(pyramid: List[jax.Array], coords: jax.Array,
                radius: int = 3) -> jax.Array:
    """coords: (N, H, W, 2) pixel coords in level-0 frame.

    Returns (N, H, W, L*(2r+1)^2) stacked window correlations (the CUDA
    ``corr_index_forward`` output layout, channels-last).
    """
    out = []
    for i, vol in enumerate(pyramid):
        out.append(_bilinear_window_sample(vol, coords / (2 ** i), radius))
    return jnp.concatenate(out, axis=-1)
