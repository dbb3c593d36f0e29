"""Spann3R: DUSt3R + spatial memory, reference parameter layout.

Counterpart of /root/reference/hislam2/modules/spann3r.py (SpatialMemory
:12-221 + Spann3R :223-500 — the alternative frontend the reference can
load via --ckpt_path but does not wire into the live system). The
parameterized modules mirror the torch state_dict exactly so
models/convert.convert_spann3r_state_dict can ingest real checkpoints:

  dust3r.*            two-view AsymmetricCroCo3DStereo (dust3r_pair.py)
  value_encoder.0-5   1024-dim Blocks encoding pointmaps into values
  value_norm/value_out
  pos_patch_embed     patch embed over predicted pts3d (spann3r.py:257)
  norm_q/norm_k/norm_v  LayerNorms on memory queries/keys/values (:260-262)
  attn_head_1/2       [Linear, GELU, Linear] key heads over
                      [enc feat ; last dec tokens] (:266-278)

The memory RUNTIME is the TPU redesign: the reference grows unbounded KV
tensors and prunes by accumulated attention (spann3r.py:85-96 top-k);
here working memory is a fixed ring of ``work_mem_frames`` frames and
long-term memory a fixed ``long_mem_tokens`` arena with masked
lowest-attention eviction, so the recurrent step is one shape-static
jitted program. Attention thresholding (attn_thresh, renormalize)
follows memory_read (:150-170).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block
from .patch_embed import PatchEmbed
from .dust3r_pair import Dust3rPairConfig, AsymmetricCroCo3DStereo

__all__ = ["Spann3RConfig", "Spann3R", "MemoryState"]


@dataclasses.dataclass(frozen=True)
class Spann3RConfig:
    dust3r: Dust3rPairConfig = Dust3rPairConfig()
    value_depth: int = 6          # memory-encoder Blocks (spann3r.py:244)
    value_num_heads: int = 16
    work_mem_frames: int = 5      # working-memory ring (:23)
    long_mem_tokens: int = 4000   # long-term token arena (:22)
    attn_thresh: float = 5e-4     # memory_read threshold (:21)
    dtype: Any = jnp.float32

    @property
    def enc_dim(self):
        return self.dust3r.enc_embed_dim

    @property
    def dec_dim(self):
        return self.dust3r.dec_embed_dim

    @staticmethod
    def tiny() -> "Spann3RConfig":
        return Spann3RConfig(dust3r=Dust3rPairConfig.tiny(),
                             value_depth=2, value_num_heads=2,
                             work_mem_frames=2, long_mem_tokens=64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MemoryState:
    work_k: jax.Array      # (B, W, P, C)
    work_v: jax.Array
    work_valid: jax.Array  # (B, W)
    work_head: jax.Array   # (B,) ring pointer
    long_k: jax.Array      # (B, L, C)
    long_v: jax.Array
    long_valid: jax.Array  # (B, L)
    long_attn: jax.Array   # (B, L) accumulated attention (eviction score)


class _KeyHead(nn.Module):
    """attn_head_N: Sequential(Linear, GELU, Linear) (spann3r.py:266)."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(x.shape[-1], name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.out_dim, name="fc2")(h)


class Spann3R(nn.Module):
    cfg: Spann3RConfig

    def setup(self):
        c = self.cfg
        self.dust3r = AsymmetricCroCo3DStereo(c.dust3r, name="dust3r")
        self.value_encoder = [
            Block(c.value_num_heads, 4.0, use_rope=True, dtype=c.dtype,
                  name=f"value_encoder_{i}") for i in range(c.value_depth)]
        self.value_norm = nn.LayerNorm(epsilon=1e-6, name="value_norm")
        self.value_out = nn.Dense(c.enc_dim, name="value_out")
        self.pos_patch_embed = PatchEmbed(c.enc_dim, c.dust3r.patch_size,
                                          dtype=c.dtype,
                                          name="pos_patch_embed")
        self.norm_q = nn.LayerNorm(name="norm_q")
        self.norm_k = nn.LayerNorm(name="norm_k")
        self.norm_v = nn.LayerNorm(name="norm_v")
        self.attn_head_1 = _KeyHead(c.enc_dim, name="attn_head_1")
        self.attn_head_2 = _KeyHead(c.enc_dim, name="attn_head_2")

    # -- reference-forward building blocks (spann3r.py:281-340) ---------
    def encode_image(self, img):
        return self.dust3r.encode_image(img)

    def encode_feat_key(self, feat, dec_last, num: int):
        """eq(4)/(6): key from [enc feat ; last dec tokens]."""
        head = self.attn_head_1 if num == 1 else self.attn_head_2
        return head(jnp.concatenate([feat, dec_last], axis=-1))

    def encode_value(self, pts3d):
        """eq(7) value path: patch-embed predicted pts3d, run the
        memory-encoder Blocks (spann3r.py:253-257, 325-331)."""
        x, pos = self.pos_patch_embed(pts3d.astype(self.cfg.dtype))
        for blk in self.value_encoder:
            x = blk(x, pos)
        return self.value_out(self.value_norm(x))

    # ------------------------------------------------------------------
    def init_memory(self, batch: int, n_patches: int) -> MemoryState:
        c = self.cfg
        z = jnp.zeros
        C = c.enc_dim
        return MemoryState(
            work_k=z((batch, c.work_mem_frames, n_patches, C)),
            work_v=z((batch, c.work_mem_frames, n_patches, C)),
            work_valid=z((batch, c.work_mem_frames), bool),
            work_head=z((batch,), jnp.int32),
            long_k=z((batch, c.long_mem_tokens, C)),
            long_v=z((batch, c.long_mem_tokens, C)),
            long_valid=z((batch, c.long_mem_tokens), bool),
            long_attn=z((batch, c.long_mem_tokens)))

    def memory_read(self, q: jax.Array, mem: MemoryState):
        """spann3r.py:150-170: softmax attention over [work ; long] with
        the attn_thresh cut + renormalize, residual add, per-slot
        attention accumulation. Returns (fused (B,P,C), long_attn)."""
        B, P, C = q.shape
        wk = mem.work_k.reshape(B, -1, C)
        wv = mem.work_v.reshape(B, -1, C)
        wmask = jnp.repeat(mem.work_valid, mem.work_k.shape[2], axis=1)
        k = jnp.concatenate([wk, mem.long_k], axis=1)
        v = jnp.concatenate([wv, mem.long_v], axis=1)
        mask = jnp.concatenate([wmask, mem.long_valid], axis=1)

        qn = self.norm_q(q)
        kn = self.norm_k(k)
        vn = self.norm_v(v)
        logits = jnp.einsum("bpc,bmc->bpm", qn, kn) * (C ** -0.5)
        logits = jnp.where(mask[:, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1) * mask[:, None, :]
        if self.cfg.attn_thresh > 0:
            attn = jnp.where(attn < self.cfg.attn_thresh, 0.0, attn)
            attn = attn / jnp.maximum(
                attn.sum(axis=-1, keepdims=True), 1e-12)
        out = jnp.einsum("bpm,bmc->bpc", attn, vn) + q  # res=True
        long_attn = attn[..., wk.shape[1]:].sum(axis=1)
        return out, long_attn

    def memory_write(self, mem: MemoryState, k_new, v_new) -> MemoryState:
        """Push the frame into the working ring; the displaced frame's
        tokens go to long-term slots, evicting lowest-attention entries
        (fixed-capacity stand-in for spann3r.py:85-96 memory_prune)."""
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

        def promote(lk, lv, lval, lattn, dk, dv, dval):
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
                           work_valid=work_valid,
                           work_head=mem.work_head + 1,
                           long_k=long_k, long_v=long_v,
                           long_valid=long_valid, long_attn=long_attn)

    # ------------------------------------------------------------------
    def forward_pair(self, img0: jax.Array, img1: jax.Array):
        """Plain two-view DUSt3R pass (spann3r.py:476-500 ``fill``)."""
        return self.dust3r(img0, img1)

    def step(self, carry, img1: jax.Array):
        """One recurrent frame (spann3r.py:407-444 forward): memory
        readout fuses the previous frame's query, the pair decodes, and
        the previous frame's K/V enter memory.

        carry: None for the first frame, else (feat0, pos0, Q0, mem).
        Returns ((feat1, pos1, Q1, mem'), (pred0, pred1)).
        """
        H, W = img1.shape[1:3]
        feat1, pos1 = self.encode_image(img1)
        if carry is None:
            B, P = feat1.shape[0], feat1.shape[1]
            mem = self.init_memory(B, P)
            feat0, pos0, Q0 = feat1, pos1, None
        else:
            feat0, pos0, Q0, mem = carry

        if Q0 is None:
            G0 = feat0
            long_attn = None
        else:
            G0, long_attn = self.memory_read(Q0, mem)
            mem = dataclasses.replace(mem,
                                      long_attn=mem.long_attn + long_attn)

        h0, h1 = self.dust3r.decode(G0, pos0, feat1, pos1)
        pred0 = self.dust3r.head(1, h0, H, W)
        pred1 = self.dust3r.head(2, h1, H, W)

        Q1 = self.encode_feat_key(feat1, h1[-1], 2)      # eq(4)
        K0 = self.encode_feat_key(feat0, h0[-1], 1)      # eq(6)
        V0 = self.encode_value(pred0["pts3d"]) + K0      # eq(7)
        mem = self.memory_write(mem, K0, V0)
        return (feat1, pos1, Q1, mem), (pred0, pred1)

    def __call__(self, imgs: jax.Array):
        """imgs (V, B, H, W, 3) in [-1, 1]: recurrent scan over frames;
        returns the per-frame predictions of the LEADING view of each
        step plus the final memory."""
        carry = None
        preds = []
        for v in range(imgs.shape[0]):
            carry, (p0, p1) = self.step(carry, imgs[v])
            preds.append(p0)
        return preds, carry[3]
