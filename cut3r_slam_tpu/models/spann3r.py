"""Spann3R-style incremental pointmap model with spatial memory.

Counterpart of /root/reference/hislam2/modules/spann3r.py (SpatialMemory +
Spann3R — the alternative frontend the reference can load via --ckpt_path
but does not wire into the live system). TPU redesign of the memory: the
reference grows unbounded KV tensors and prunes by accumulated attention
(spann3r.py:12-221); here both working and long-term memories are
FIXED-CAPACITY arenas with validity masks — insertion evicts the
lowest-attention long-term slot via masked argmin, so the whole recurrent
step is one shape-static jitted program.

Per frame: encode image -> query/key/value projections -> memory
cross-attention read -> decoder -> pointmap + conf; then write the
frame's (k, v) into memory (working ring; overflow promotes the oldest
working entry into long-term memory).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block, DecoderBlock
from .patch_embed import PatchEmbed
from .heads import reg_dense_depth, reg_dense_conf

__all__ = ["Spann3RConfig", "Spann3R", "MemoryState"]


@dataclasses.dataclass(frozen=True)
class Spann3RConfig:
    enc_embed_dim: int = 384
    enc_depth: int = 8
    enc_num_heads: int = 6
    dec_embed_dim: int = 384
    dec_depth: int = 4
    dec_num_heads: int = 6
    patch_size: int = 16
    work_mem_frames: int = 5     # working-memory ring (frames)
    long_mem_tokens: int = 4000  # long-term token arena
    attn_thresh: float = 5e-4
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "Spann3RConfig":
        return Spann3RConfig(enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
                             dec_embed_dim=64, dec_depth=2, dec_num_heads=2,
                             work_mem_frames=2, long_mem_tokens=64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MemoryState:
    work_k: jax.Array    # (B, W, P, C)
    work_v: jax.Array
    work_valid: jax.Array  # (B, W)
    work_head: jax.Array   # (B,) ring pointer
    long_k: jax.Array    # (B, L, C)
    long_v: jax.Array
    long_valid: jax.Array  # (B, L)
    long_attn: jax.Array   # (B, L) accumulated attention (eviction score)


class Spann3R(nn.Module):
    cfg: Spann3RConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.enc_embed_dim, c.patch_size,
                                      dtype=c.dtype, name="patch_embed")
        self.enc_blocks = [
            Block(c.enc_num_heads, 4.0, use_rope=True, dtype=c.dtype,
                  name=f"enc_blocks_{i}") for i in range(c.enc_depth)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.norm_q = nn.Dense(c.dec_embed_dim, name="norm_q")
        self.norm_k = nn.Dense(c.dec_embed_dim, name="norm_k")
        self.norm_v = nn.Dense(c.dec_embed_dim, name="norm_v")
        self.dec_blocks = [
            DecoderBlock(c.dec_num_heads, 4.0, use_rope=False, dtype=c.dtype,
                         name=f"dec_blocks_{i}") for i in range(c.dec_depth)]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        self.head_pts = nn.Dense(c.patch_size ** 2 * 4, name="head_pts")

    # ------------------------------------------------------------------
    def init_memory(self, batch: int, n_patches: int) -> MemoryState:
        c = self.cfg
        z = jnp.zeros
        return MemoryState(
            work_k=z((batch, c.work_mem_frames, n_patches, c.dec_embed_dim)),
            work_v=z((batch, c.work_mem_frames, n_patches, c.dec_embed_dim)),
            work_valid=z((batch, c.work_mem_frames), bool),
            work_head=z((batch,), jnp.int32),
            long_k=z((batch, c.long_mem_tokens, c.dec_embed_dim)),
            long_v=z((batch, c.long_mem_tokens, c.dec_embed_dim)),
            long_valid=z((batch, c.long_mem_tokens), bool),
            long_attn=z((batch, c.long_mem_tokens)))

    def encode(self, img: jax.Array):
        x, pos = self.patch_embed(img.astype(self.cfg.dtype))
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    # ------------------------------------------------------------------
    def _memory_read(self, q: jax.Array, mem: MemoryState):
        """Cross-attention over [working ; long] memory with masks.
        Returns (fused features (B, P, C), per-long-slot attention)."""
        B, P, C = q.shape
        W = self.cfg.work_mem_frames
        wk = mem.work_k.reshape(B, -1, C)
        wv = mem.work_v.reshape(B, -1, C)
        wmask = jnp.repeat(mem.work_valid, mem.work_k.shape[2], axis=1)
        k = jnp.concatenate([wk, mem.long_k], axis=1)
        v = jnp.concatenate([wv, mem.long_v], axis=1)
        mask = jnp.concatenate([wmask, mem.long_valid], axis=1)

        scale = C ** -0.5
        logits = jnp.einsum("bpc,bmc->bpm", q, k) * scale
        logits = jnp.where(mask[:, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = attn * mask[:, None, :]  # fully-masked rows -> zero read
        out = jnp.einsum("bpm,bmc->bpc", attn, v)
        long_attn = attn[..., wk.shape[1]:].sum(axis=1)  # (B, L)
        return out, long_attn

    def _memory_write(self, mem: MemoryState, k_new, v_new) -> MemoryState:
        """Push the frame into the working ring; the displaced frame's
        tokens above the attention threshold go to long-term slots,
        evicting the lowest-attention entries when full."""
        B, P, C = k_new.shape
        W = self.cfg.work_mem_frames
        L = self.cfg.long_mem_tokens
        head = mem.work_head % W
        displaced_k = jnp.take_along_axis(
            mem.work_k, head[:, None, None, None], axis=1)[:, 0]
        displaced_v = jnp.take_along_axis(
            mem.work_v, head[:, None, None, None], axis=1)[:, 0]
        displaced_valid = jnp.take_along_axis(mem.work_valid,
                                              head[:, None], axis=1)[:, 0]

        bidx = jnp.arange(B)
        work_k = mem.work_k.at[bidx, head].set(k_new)
        work_v = mem.work_v.at[bidx, head].set(v_new)
        work_valid = mem.work_valid.at[bidx, head].set(True)

        # promote displaced tokens into long memory (vectorized per batch)
        def promote(lk, lv, lval, lattn, dk, dv, dval):
            # scores: invalid slots are best targets, then lowest attn
            score = jnp.where(lval, lattn, -jnp.inf)
            order = jnp.argsort(score)[:P]  # P cheapest slots
            write = jnp.zeros((L,), bool).at[order].set(dval)
            lk = lk.at[order].set(jnp.where(dval[:, None], dk, lk[order]))
            lv = lv.at[order].set(jnp.where(dval[:, None], dv, lv[order]))
            lval = lval | write
            lattn = jnp.where(write, 0.0, lattn)
            return lk, lv, lval, lattn

        dval = jnp.broadcast_to(displaced_valid[:, None], (B, P))
        long_k, long_v, long_valid, long_attn = jax.vmap(promote)(
            mem.long_k, mem.long_v, mem.long_valid, mem.long_attn,
            displaced_k, displaced_v, dval)
        return MemoryState(work_k=work_k, work_v=work_v,
                           work_valid=work_valid, work_head=mem.work_head + 1,
                           long_k=long_k, long_v=long_v,
                           long_valid=long_valid, long_attn=long_attn)

    # ------------------------------------------------------------------
    def step(self, img: jax.Array, mem: Optional[MemoryState] = None
             ) -> Tuple[dict, MemoryState]:
        """One frame: img (B, H, W, 3) in [-1, 1]."""
        B, H, W, _ = img.shape
        feat, pos = self.encode(img)
        P = feat.shape[1]
        if mem is None:
            mem = self.init_memory(B, P)
        q = self.norm_q(feat)
        k = self.norm_k(feat)
        v = self.norm_v(feat)

        read, long_attn = self._memory_read(q, mem)
        mem = dataclasses.replace(mem, long_attn=mem.long_attn + long_attn)

        x = feat
        for blk in self.dec_blocks:
            x, _ = blk(x, read, pos, None)
        x = self.dec_norm(x)

        raw = self.head_pts(x.astype(jnp.float32))  # (B, P, ps*ps*4)
        ps = self.cfg.patch_size
        nh, nw = H // ps, W // ps
        raw = raw.reshape(B, nh, nw, ps, ps, 4).transpose(0, 1, 3, 2, 4, 5)
        raw = raw.reshape(B, H, W, 4)
        out = {"pts3d": reg_dense_depth(raw[..., :3]),
               "conf": reg_dense_conf(raw[..., 3])}

        mem = self._memory_write(mem, k, v)
        return out, mem

    def __call__(self, imgs: jax.Array):
        """imgs (V, B, H, W, 3): scan over frames; returns stacked outs."""
        V, B, H, W, _ = imgs.shape
        feat0, _ = self.encode(imgs[0])
        mem = self.init_memory(B, feat0.shape[1])

        def body(mdl, m, img):
            out, m = mdl.step(img, m)
            return m, out

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        mem, outs = scan(self, mem, imgs)
        return outs, mem
