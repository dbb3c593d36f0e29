"""Transformer building blocks (Flax linen).

JAX re-implementations of /root/reference/src/dust3r/blocks.py: Mlp,
Attention / CrossAttention (optionally RoPE2D on q/k), Block, DecoderBlock
(self + cross + mlp, returns (x, y)), ModLN and ConditionModulationBlock
(adaLN conditioning on the pose token, used by the DPT cross head).

Design notes (TPU):
* attention is a plain fused sdpa via `jax.nn.dot_product_attention` —
  XLA lowers this to an MXU-friendly fused kernel; sequence lengths here
  are ~1k tokens so flash tiling is not the bottleneck;
* params are stored f32 and cast to ``compute_dtype`` (bf16 by default at
  inference) inside each op; RoPE always runs in f32 (parity with the
  reference's autocast-disabled rope, blocks.py:112-121);
* module/parameter names mirror the torch state_dict so the checkpoint
  converter is a pure name map (models/convert.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .rope import apply_rope2d

__all__ = ["Mlp", "Attention", "CrossAttention", "Block", "DecoderBlock",
           "ModLN", "ConditionModulationBlock"]


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x


def _sdpa(q, k, v, scale):
    """q,k,v: (B, H, N, D). Uses XLA's fused attention path."""
    # jax.nn.dot_product_attention expects (B, N, H, D)
    out = jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), scale=scale)
    return out.swapaxes(1, 2)


class Attention(nn.Module):
    num_heads: int
    use_rope: bool = False
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xpos):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.use_rope and xpos is not None:
            q = apply_rope2d(q, xpos, self.rope_base)
            k = apply_rope2d(k, xpos, self.rope_base)
        out = _sdpa(q, k, v, D ** -0.5)
        out = out.swapaxes(1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    num_heads: int
    use_rope: bool = False
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        H = self.num_heads
        D = C // H
        q = nn.Dense(C, dtype=self.dtype, name="projq")(query).reshape(B, Nq, H, D).swapaxes(1, 2)
        k = nn.Dense(C, dtype=self.dtype, name="projk")(key).reshape(B, Nk, H, D).swapaxes(1, 2)
        v = nn.Dense(C, dtype=self.dtype, name="projv")(value).reshape(B, Nk, H, D).swapaxes(1, 2)
        if self.use_rope:
            if qpos is not None:
                q = apply_rope2d(q, qpos, self.rope_base)
            if kpos is not None:
                k = apply_rope2d(k, kpos, self.rope_base)
        out = _sdpa(q, k, v, D ** -0.5)
        out = out.swapaxes(1, 2).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm self-attention block (encoder)."""
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, xpos):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.num_heads, self.use_rope, self.rope_base,
                          self.dtype, name="attn")(h, xpos)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn + MLP; returns (x, y) like the reference."""
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    rope_base: float = 100.0
    norm_mem: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(self.num_heads, self.use_rope, self.rope_base,
                          self.dtype, name="attn")(h, xpos)
        if self.norm_mem:
            y_ = nn.LayerNorm(epsilon=1e-6, name="norm_y")(y)
        else:
            y_ = y
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, self.use_rope, self.rope_base,
                               self.dtype, name="cross_attn")(h, y_, y_, xpos, ypos)
        h = nn.LayerNorm(epsilon=1e-6, name="norm3")(x)
        x = x + Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x, y


class ModLN(nn.Module):
    """adaLN modulation (dust3r blocks.py:358-381)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod):
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        m = nn.silu(mod)
        m = nn.Dense(2 * x.shape[-1], dtype=self.dtype, name="mlp_1")(m)
        shift, scale = jnp.split(m, 2, axis=-1)
        return h * (1 + scale[:, None, :]) + shift[:, None, :]


class ConditionModulationBlock(nn.Module):
    """Self-attention block with adaLN conditioning on a pose token."""
    num_heads: int
    mlp_ratio: float = 4.0
    use_rope: bool = False
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod, xpos):
        C = x.shape[-1]
        h = ModLN(dtype=self.dtype, name="norm1")(x, mod)
        x = x + Attention(self.num_heads, self.use_rope, self.rope_base,
                          self.dtype, name="attn")(h, xpos)
        h = ModLN(dtype=self.dtype, name="norm2")(x, mod)
        x = x + Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x
