"""2D rotary position embedding (RoPE2D), pure JAX.

Replaces the reference's ``curope`` CUDA kernel and its torch fallback
(/root/reference/src/croco/models/curope/kernels.cu,
 src/croco/models/pos_embed.py:117-179). On TPU this is a handful of
vectorized sin/cos ops that XLA fuses into the attention matmuls — no
custom kernel needed.

Semantics (must match the torch fallback exactly):
* head dim D is split in two halves; the first half is rotated by the
  token's **y** position, the second half by its **x** position;
* within each half of size ``Dh``, frequencies are
  ``1 / base**(2i/Dh)`` for i in [0, Dh/2), and the rotation uses the
  "rotate_half" layout: cos/sin vectors of length Dh are the frequency
  vector tiled twice, and rotate_half(t) = concat(-t[Dh/2:], t[:Dh/2]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rope_cos_sin", "apply_rope2d"]


def rope_cos_sin(positions: jax.Array, half_dim: int, base: float = 100.0):
    """Precompute cos/sin tables for RoPE2D.

    positions: (..., N, 2) integer (y, x) token positions (may be -1 for
    special tokens — callers mask those by passing identical q/k untouched;
    here negative positions simply produce their sin/cos which the torch
    fallback also does via embedding lookup only for >=0 — the reference
    feeds -1 positions for the pose token and the table lookup uses index
    -1, i.e. the *last* row. We reproduce table-lookup semantics by
    computing trig directly from the position value, which matches for all
    non-negative positions and is what the cuRoPE kernel does).

    half_dim: D/2 where D is the per-head dim. Returns (cos, sin) of shape
    (..., N, 2, half_dim) — axis -2 indexes the (y, x) halves.
    """
    assert half_dim % 2 == 0, "half of head_dim must be even"
    quarter = half_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, quarter, dtype=jnp.float32) * 2.0 / half_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., N, 2, quarter)
    ang = jnp.concatenate([ang, ang], axis=-1)  # (..., N, 2, half_dim)
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope2d(tokens: jax.Array, positions: jax.Array,
                 base: float = 100.0) -> jax.Array:
    """Apply RoPE2D. tokens: (B, H, N, D); positions: (B, N, 2) int.

    Computed in float32 regardless of input dtype (the reference up-casts
    around the rope call, blocks.py:112-121), cast back on return.
    """
    dtype = tokens.dtype
    D = tokens.shape[-1]
    assert D % 2 == 0
    half = D // 2
    cos, sin = rope_cos_sin(positions, half, base)  # (B, N, 2, half)
    # split tokens into (y-half, x-half)
    t = tokens.astype(jnp.float32)
    ty, tx = t[..., :half], t[..., half:]
    cy = cos[..., 0, :][:, None]  # (B, 1, N, half) broadcast over heads
    sy = sin[..., 0, :][:, None]
    cx = cos[..., 1, :][:, None]
    sx = sin[..., 1, :][:, None]
    ty = ty * cy + _rotate_half(ty) * sy
    tx = tx * cx + _rotate_half(tx) * sx
    return jnp.concatenate([ty, tx], axis=-1).astype(dtype)
