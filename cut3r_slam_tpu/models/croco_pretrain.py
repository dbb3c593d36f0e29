"""CroCo cross-view completion pretraining + stereo/flow downstream (JAX).

Counterpart of /root/reference/src/croco/models/croco.py (CroCo MAE-style
pretraining: mask 90% of view-1 patches, encode visible + full view-2,
joint decoder, per-patch pixel regression) and croco_downstream.py /
head_downstream.py (binocular downstream with a dense DPT head, used by
the stereoflow/ trainers).

TPU-first restructuring: the torch version physically removes masked
tokens (`x[~masks]`, croco.py:224 — a dynamic shape). Here the visible
count is STATIC (n_vis = round(N·(1−mask_ratio))): a per-sample random
permutation picks n_vis visible token slots, encoded as a fixed-size
gather; the decoder scatters them back into the full sequence around the
learned mask token. No recompiles, no ragged batches.

Reuses blocks.py (Block/DecoderBlock/PatchEmbed share the converter's
naming scheme with the CUT3R encoder/decoder).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block, DecoderBlock
from .patch_embed import PatchEmbed

__all__ = ["CroCoConfig", "CroCoPretrain", "croco_pretrain_loss",
           "CroCoDownstreamBinocular", "patchify", "unpatchify"]


@dataclasses.dataclass(frozen=True)
class CroCoConfig:
    enc_embed_dim: int = 768
    enc_depth: int = 12
    enc_num_heads: int = 12
    dec_embed_dim: int = 512
    dec_depth: int = 8
    dec_num_heads: int = 16
    patch_size: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    mask_ratio: float = 0.9          # croco.py:31
    norm_pix_loss: bool = True       # per-patch normalized targets
    compute_dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "CroCoConfig":
        return CroCoConfig(enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
                           dec_embed_dim=32, dec_depth=2, dec_num_heads=2,
                           mask_ratio=0.75)


def patchify(imgs: jax.Array, p: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, p*p*3) (croco.py:284-297, HWC layout)."""
    B, H, W, C = imgs.shape
    x = imgs.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify(x: jax.Array, hw: Tuple[int, int], p: int,
               channels: int = 3) -> jax.Array:
    """(B, N, p*p*c) -> (B, H, W, c) (croco.py:299-310)."""
    H, W = hw
    B = x.shape[0]
    x = x.reshape(B, H // p, W // p, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, channels)


class CroCoPretrain(nn.Module):
    cfg: CroCoConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.patch_embed = PatchEmbed(c.enc_embed_dim, c.patch_size,
                                      dtype=dt, name="patch_embed")
        self.enc_blocks = [
            Block(c.enc_num_heads, c.mlp_ratio, use_rope=True,
                  rope_base=c.rope_base, dtype=dt, name=f"enc_blocks_{i}")
            for i in range(c.enc_depth)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, dtype=dt,
                                      name="decoder_embed")
        self.mask_token = self.param("mask_token",
                                     nn.initializers.normal(0.02),
                                     (1, 1, c.dec_embed_dim))
        self.dec_blocks = [
            DecoderBlock(c.dec_num_heads, c.mlp_ratio, use_rope=True,
                         rope_base=c.rope_base, dtype=dt,
                         name=f"dec_blocks_{i}")
            for i in range(c.dec_depth)]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        self.prediction_head = nn.Dense(c.patch_size ** 2 * 3,
                                        name="prediction_head")

    # ------------------------------------------------------------------
    def encode_visible(self, img: jax.Array, rng: Optional[jax.Array]):
        """Encode with static-size random masking.

        Returns (feat_vis (B, n_vis, D), pos (B, N, 2), vis_idx
        (B, n_vis), mask (B, N) True = masked). rng=None -> no masking.
        """
        x, pos = self.patch_embed(img.astype(self.cfg.compute_dtype))
        B, N, _ = x.shape
        if rng is None:
            for blk in self.enc_blocks:
                x = blk(x, pos)
            return self.enc_norm(x), pos, None, jnp.zeros((B, N), bool)
        n_vis = max(1, int(round(N * (1.0 - self.cfg.mask_ratio))))
        perm = jax.vmap(lambda k: jax.random.permutation(k, N))(
            jax.random.split(rng, B))                      # (B, N)
        vis_idx = perm[:, :n_vis]
        mask = jnp.ones((B, N), bool).at[
            jnp.arange(B)[:, None], vis_idx].set(False)
        xv = jnp.take_along_axis(x, vis_idx[..., None], axis=1)
        pv = jnp.take_along_axis(pos, vis_idx[..., None], axis=1)
        for blk in self.enc_blocks:
            xv = blk(xv, pv)
        return self.enc_norm(xv), pos, vis_idx, mask

    def __call__(self, img1: jax.Array, img2: jax.Array,
                 rng: Optional[jax.Array] = None):
        """Pretraining forward: masked view 1 + full view 2.

        Returns (pred (B, N, p²·3), mask (B, N), target (B, N, p²·3)).
        """
        c = self.cfg
        if rng is None:
            rng = self.make_rng("mask") if self.has_rng("mask") else None
        f1v, pos1, vis_idx, mask = self.encode_visible(img1, rng)
        f2, pos2, _, _ = self.encode_visible(img2, None)

        d1v = self.decoder_embed(f1v)
        d2 = self.decoder_embed(f2)
        B, N = mask.shape
        if vis_idx is None:
            f1_ = d1v
        else:
            f1_ = jnp.broadcast_to(
                self.mask_token.astype(d1v.dtype),
                (B, N, c.dec_embed_dim))
            f1_ = f1_.at[jnp.arange(B)[:, None], vis_idx].set(d1v)
        out, out2 = f1_, d2
        for blk in self.dec_blocks:
            out, out2 = blk(out, out2, pos1, pos2)
        out = self.dec_norm(out)
        pred = self.prediction_head(out.astype(jnp.float32))

        target = patchify(img1, c.patch_size)
        if c.norm_pix_loss:
            mu = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        return pred, mask, target


def croco_pretrain_loss(pred, mask, target):
    """Masked-patch MSE (croco/models/criterion.py MaskedMSE)."""
    err = jnp.square(pred - target).mean(-1)
    m = mask.astype(jnp.float32)
    return (err * m).sum() / jnp.maximum(m.sum(), 1.0)


class CroCoDownstreamBinocular(nn.Module):
    """Binocular downstream (croco_downstream.py:88-131): both views
    encoded unmasked, joint decoder, dense head over the full token grid.
    num_channels=1 -> stereo disparity, 2 -> optical flow; +1 confidence
    when with_conf (stereoflow criterion's Laplacian NLL uses it)."""
    cfg: CroCoConfig
    num_channels: int = 2
    with_conf: bool = True

    def setup(self):
        self.croco = CroCoPretrain(self.cfg, name="croco")
        out_ch = self.num_channels + (1 if self.with_conf else 0)
        self.head = nn.Dense(self.cfg.patch_size ** 2 * out_ch, name="head")

    def __call__(self, img1: jax.Array, img2: jax.Array):
        H, W = img1.shape[1:3]
        f1, pos1, _, _ = self.croco.encode_visible(img1, None)
        f2, pos2, _, _ = self.croco.encode_visible(img2, None)
        d1 = self.croco.decoder_embed(f1)
        d2 = self.croco.decoder_embed(f2)
        out, out2 = d1, d2
        for blk in self.croco.dec_blocks:
            out, out2 = blk(out, out2, pos1, pos2)
        out = self.croco.dec_norm(out)
        x = self.head(out.astype(jnp.float32))
        out_ch = self.num_channels + (1 if self.with_conf else 0)
        maps = unpatchify(x, (H, W), self.cfg.patch_size, out_ch)
        pred = maps[..., :self.num_channels]
        if self.with_conf:
            return pred, jax.nn.softplus(maps[..., -1])
        return pred, None


def laplacian_nll(pred, gt, conf, valid=None):
    """stereoflow/criterion.py LaplacianLoss: |e|/s + log s with
    s = conf (softplus-positive); mean over valid pixels."""
    err = jnp.abs(pred - gt).sum(-1)
    s = jnp.maximum(conf, 1e-3)
    nll = err / s + jnp.log(s)
    if valid is None:
        return nll.mean()
    v = valid.astype(jnp.float32)
    return (nll * v).sum() / jnp.maximum(v.sum(), 1.0)
