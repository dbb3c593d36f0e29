"""Patch embedding (Flax), NHWC-native for TPU.

Counterpart of /root/reference/src/dust3r/patch_embed.py (PatchEmbedDust3R)
and croco's PositionGetter (src/dust3r/blocks.py:417-455). Images are
channels-last here; the checkpoint converter transposes the torch conv
weights.

The SLAM pipeline always feeds landscape images with H, W multiples of 16
(demo_s.py:70-71 resize rule), so the ManyAR / transpose_to_landscape
machinery of the reference is unnecessary: token positions are the plain
(y, x) patch grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["PatchEmbed", "patch_positions"]


def patch_positions(batch: int, nh: int, nw: int) -> jax.Array:
    """(B, nh*nw, 2) integer (y, x) positions, row-major like the torch
    PositionGetter (cartesian_prod(y, x))."""
    y = jnp.arange(nh, dtype=jnp.int32)
    x = jnp.arange(nw, dtype=jnp.int32)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    pos = jnp.stack([gy, gx], axis=-1).reshape(1, nh * nw, 2)
    return jnp.broadcast_to(pos, (batch, nh * nw, 2))


class PatchEmbed(nn.Module):
    """Conv patchify: (B, H, W, C) -> tokens (B, N, D), positions (B, N, 2)."""
    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        B, H, W, _ = img.shape
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                    padding="VALID", dtype=self.dtype, name="proj")(img)
        nh, nw = H // p, W // p
        tokens = x.reshape(B, nh * nw, self.embed_dim)
        return tokens, patch_positions(B, nh, nw)
