"""Two-view DUSt3R (AsymmetricCroCo3DStereo) in flax.

Counterpart of the model the reference's Spann3R wraps:
/root/reference/hislam2/modules/spann3r.py:232 loads
``AsymmetricCroCo3DStereo`` from an external dust3r install (the class is
absent from the snapshot's src/dust3r — it only ships the autoregressive
ARCroco3DStereo). The layout here follows the public
``DUSt3R_ViTLarge_BaseDecoder_512`` checkpoints that spann3r's
``--ckpt_path`` flag consumes: shared ViT-L 1024/24 RoPE encoder, two
768/12 decoders exchanging cross-attention per layer (dec_blocks /
dec_blocks2), and pts3d+conf heads (linear or DPT with hooks
[enc, dec 6, dec 9, dec 12]).

Parameter names/shapes mirror the torch state_dict so
models/convert.convert_spann3r_state_dict can ingest real checkpoints;
parity is tested against a torch oracle assembled from the snapshot's
own dust3r blocks (tests/test_spann3r_convert.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block, DecoderBlock
from .patch_embed import PatchEmbed
from .heads import DPTAdapter, reg_dense_depth, reg_dense_conf

__all__ = ["Dust3rPairConfig", "AsymmetricCroCo3DStereo"]


@dataclasses.dataclass(frozen=True)
class Dust3rPairConfig:
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    patch_size: int = 16
    head: str = "linear"          # "linear" | "dpt"
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "Dust3rPairConfig":
        return Dust3rPairConfig(enc_embed_dim=64, enc_depth=2,
                                enc_num_heads=2, dec_embed_dim=48,
                                dec_depth=4, dec_num_heads=2)

    @property
    def dpt_hooks(self) -> Tuple[int, ...]:
        d = self.dec_depth
        return (0, d * 2 // 4, d * 3 // 4, d)


class _LinearHead(nn.Module):
    """LinearPts3d (dust3r heads): last decoder tokens -> ps^2*4."""
    cfg: Dust3rPairConfig

    @nn.compact
    def __call__(self, tok, img_h, img_w):
        ps = self.cfg.patch_size
        B = tok.shape[0]
        raw = nn.Dense(ps * ps * 4, name="proj")(tok.astype(jnp.float32))
        nh, nw = img_h // ps, img_w // ps
        raw = raw.reshape(B, nh, nw, ps, ps, 4)
        raw = raw.transpose(0, 1, 3, 2, 4, 5).reshape(B, img_h, img_w, 4)
        return raw


class _DPTHead(nn.Module):
    cfg: Dust3rPairConfig

    @nn.compact
    def __call__(self, hook_tokens, img_h, img_w):
        c = self.cfg
        raw = DPTAdapter(num_channels=4, feature_dim=c.dpt_feature_dim,
                         last_dim=c.dpt_last_dim,
                         patch_size=c.patch_size, dtype=jnp.float32,
                         name="dpt")(
            [t.astype(jnp.float32) for t in hook_tokens], img_h, img_w)
        return raw


class AsymmetricCroCo3DStereo(nn.Module):
    cfg: Dust3rPairConfig

    def setup(self):
        c = self.cfg
        dt = c.dtype
        self.patch_embed = PatchEmbed(c.enc_embed_dim, c.patch_size,
                                      dtype=dt, name="patch_embed")
        self.enc_blocks = [
            Block(c.enc_num_heads, 4.0, use_rope=True, dtype=dt,
                  name=f"enc_blocks_{i}") for i in range(c.enc_depth)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, dtype=dt,
                                      name="decoder_embed")
        self.dec_blocks = [
            DecoderBlock(c.dec_num_heads, 4.0, use_rope=True, dtype=dt,
                         name=f"dec_blocks_{i}") for i in range(c.dec_depth)]
        self.dec_blocks2 = [
            DecoderBlock(c.dec_num_heads, 4.0, use_rope=True, dtype=dt,
                         name=f"dec_blocks2_{i}") for i in range(c.dec_depth)]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        head_cls = _LinearHead if c.head == "linear" else _DPTHead
        self.downstream_head1 = head_cls(c, name="downstream_head1")
        self.downstream_head2 = head_cls(c, name="downstream_head2")

    # ------------------------------------------------------------------
    def encode_image(self, img: jax.Array):
        """img (B, H, W, 3) in [-1, 1] -> (tokens (B, N, C), pos)."""
        x, pos = self.patch_embed(img.astype(self.cfg.dtype))
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def decode(self, f1, pos1, f2, pos2) -> Tuple[List, List]:
        """Dual-decoder exchange; returns per-layer token lists
        [enc, dec_1 .. dec_D] with dec_norm applied to the last."""
        h1, h2 = [f1], [f2]
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            # both branches read the OTHER branch's previous output
            x1n, _ = blk1(x1, x2, pos1, pos2)
            x2n, _ = blk2(x2, x1, pos2, pos1)
            x1, x2 = x1n, x2n
            h1.append(x1)
            h2.append(x2)
        h1[-1] = self.dec_norm(h1[-1])
        h2[-1] = self.dec_norm(h2[-1])
        return h1, h2

    def head(self, num: int, hooks: List, img_h: int, img_w: int):
        hd = self.downstream_head1 if num == 1 else self.downstream_head2
        if self.cfg.head == "linear":
            raw = hd(hooks[-1], img_h, img_w)
        else:
            hi = self.cfg.dpt_hooks
            raw = hd([hooks[i] for i in hi], img_h, img_w)
        return {"pts3d": reg_dense_depth(raw[..., :3]),
                "conf": reg_dense_conf(raw[..., 3])}

    def __call__(self, img1: jax.Array, img2: jax.Array):
        """Two views -> (pred1 in self view, pred2 in view-1 frame)."""
        H, W = img1.shape[1:3]
        f1, pos1 = self.encode_image(img1)
        f2, pos2 = self.encode_image(img2)
        h1, h2 = self.decode(f1, pos1, f2, pos2)
        return self.head(1, h1, H, W), self.head(2, h2, H, W)
