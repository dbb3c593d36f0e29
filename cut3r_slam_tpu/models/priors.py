"""Monocular depth / normal prior networks (Omnidata-style DPT).

Counterpart of /root/reference/hislam2/midas/ (OmnidataModel — a DPT on a
ViT-hybrid backbone producing depth or normal priors; dormant in the live
reference, hooked at motion_filter.py:58-66). Here the prior is a plain
ViT + DPT pyramid built from this repo's own blocks, exposing the same
``(img) -> depth/normal`` call the SLAM layer can hook for
prior-regularized mapping. Pretrained Omnidata weights are torch-specific
pickles of a different backbone; converting them is out of scope — this
module provides the architecture + interface (trainable with train/).
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block
from .patch_embed import PatchEmbed
from .heads import DPTAdapter

__all__ = ["PriorNet", "normalize_imagenet"]

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_imagenet(img_u8: jax.Array) -> jax.Array:
    x = img_u8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class PriorNet(nn.Module):
    """ViT-S/16 + DPT head predicting a depth (1ch) or normal (3ch) map."""
    task: Literal["depth", "normal"] = "depth"
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array):
        """img: (B, H, W, 3) ImageNet-normalized; H, W multiples of 16."""
        B, H, W, _ = img.shape
        x, pos = PatchEmbed(self.embed_dim, 16, dtype=self.dtype,
                            name="patch_embed")(img.astype(self.dtype))
        # DPT hook layers at the 1/4, 1/2, 3/4 and final depths; clamped
        # so tiny test depths (< 4 blocks) still fill all four pyramid
        # slots (duplicate layers allowed)
        marks = [max(self.depth * k // 4, 1) - 1 for k in (1, 2, 3, 4)]
        hooks = {}
        for i in range(self.depth):
            x = Block(self.num_heads, 4.0, use_rope=True, dtype=self.dtype,
                      name=f"blocks_{i}")(x, pos)
            for slot, m in enumerate(marks):
                if m == i:
                    hooks[slot] = x.astype(jnp.float32)
        n_out = 1 if self.task == "depth" else 3
        out = DPTAdapter(num_channels=n_out, dtype=jnp.float32,
                         name="dpt")( [hooks[0], hooks[1], hooks[2],
                                       hooks[3]], H, W)
        if self.task == "depth":
            return jax.nn.softplus(out[..., 0])  # positive depth
        n = out / jnp.sqrt(jnp.sum(out * out, -1, keepdims=True) + 1e-12)
        return n
