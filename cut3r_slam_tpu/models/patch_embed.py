"""Patch embedding (Flax), NHWC-native for TPU.

Counterpart of /root/reference/src/dust3r/patch_embed.py (PatchEmbedDust3R
AND ManyAR_PatchEmbed) and croco's PositionGetter
(src/dust3r/blocks.py:417-455). Images are channels-last here; the
checkpoint converter transposes the torch conv weights.

The SLAM pipeline always feeds landscape images with H, W multiples of 16
(demo_s.py:70-71 resize rule) and never passes ``portrait_mask``. The
TRAINING stack's multi-aspect datasets store portrait images TRANSPOSED
inside the landscape-shaped batch container with true_shape recording the
real orientation (the reference's ManyAR convention,
patch_embed.py:35-93). Instead of the reference's boolean-indexed ragged
split, the TPU version computes BOTH orientations at static shapes and
selects per sample — two convs (patchify is <1% of the encoder), zero
dynamic shapes.
"""
from __future__ import annotations

from typing import Optional

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
    def __call__(self, img, portrait_mask: Optional[jax.Array] = None):
        """img: (B, H, W, C) landscape container. portrait_mask: (B,)
        bool — True rows hold a TRANSPOSED portrait image whose tokens/
        positions must follow the (W, H) grid (ManyAR semantics)."""
        B, H, W, _ = img.shape
        p = self.patch_size
        proj = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                       padding="VALID", dtype=self.dtype, name="proj")
        x = proj(img)
        nh, nw = H // p, W // p
        tokens = x.reshape(B, nh * nw, self.embed_dim)
        pos = patch_positions(B, nh, nw)
        if portrait_mask is not None and H != W:
            # portrait branch at the SAME static cost: conv the
            # spatially-transposed container, row-major over (nw, nh)
            xt = proj(img.swapaxes(1, 2))
            tokens_p = xt.reshape(B, nh * nw, self.embed_dim)
            pos_p = patch_positions(B, nw, nh)
            m = portrait_mask.reshape(B, 1, 1)
            tokens = jnp.where(m, tokens_p, tokens)
            pos = jnp.where(m, pos_p, pos)
        return tokens, pos
