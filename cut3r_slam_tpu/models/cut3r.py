"""CUT3R — autoregressive multi-view pointmap transformer (Flax/JAX).

TPU-native rebuild of ``ARCroco3DStereo`` (/root/reference/src/dust3r/
model.py:225-1100). Same computation graph, restructured for XLA:

* all views are encoded in ONE batched ViT pass (V folded into batch);
* the per-view recurrent decoder (state ∥ image+pose-token cross-attention,
  LocalMemory read/write) runs as a `jax.lax.scan` over views carrying
  ``(state_feat, mem)`` — O(1) memory in sequence length, exactly the
  recurrence the reference implements as a Python loop (model.py:816-892);
* the four DPT hook activations are stacked across views and the heads run
  once, batched over (V·B) — big MXU-friendly convolutions instead of V
  small launches.

Default config = the live checkpoint ``cut3r_512_dpt_4_64.pth``
(ViT-L/16 encoder dim 1024×24, decoder dim 768×12, 768 register tokens,
LocalMemory 256, RoPE base 100, DPT pts3d+pose heads with RGB).

Assumptions vs the reference: landscape images with H, W multiples of 16
(always true for the SLAM resize rule, demo_s.py:70-71); img views only in
the scanned forward (ray-map encoding is exposed separately for the
raymap-conditioned ``inference_step`` path).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block, DecoderBlock
from .heads import DPTPts3dPose
from .patch_embed import PatchEmbed
from .rope import apply_rope2d

__all__ = ["CUT3RConfig", "CUT3R", "normalize_images"]


@dataclasses.dataclass(frozen=True)
class CUT3RConfig:
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    state_size: int = 768
    state_dec_num_heads: int = 16
    local_mem_size: int = 256
    ray_enc_depth: int = 2
    patch_size: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    has_rgb: bool = True
    head_type: str = "dpt"  # "dpt" (512 ckpt) or "linear" (224 ckpts)
    compute_dtype: Any = jnp.bfloat16
    # run the state ∥ image decoder streams as ONE batch-2 stacked program
    # per layer (they are data-independent within a layer, model.py:660-698)
    # — merges the 8 projection/MLP matmuls of the two DecoderBlocks into
    # batched einsums, roughly halving kernel count on the MXU hot loop
    fused_decoder: bool = True

    @staticmethod
    def tiny() -> "CUT3RConfig":
        """A CPU-testable miniature with identical topology."""
        return CUT3RConfig(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=4, dec_num_heads=2,
            state_size=16, state_dec_num_heads=2, local_mem_size=8,
            compute_dtype=jnp.float32)


def normalize_images(img_u8: jax.Array) -> jax.Array:
    """uint8/float [0,255] HWC -> [-1, 1] (model.py:1111-1114)."""
    return (img_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5


def _state_positions(state_size: int, batch: int) -> jax.Array:
    """2D positions for register tokens (model.py:544-557, state_pe='2d')."""
    width = int(state_size ** 0.5)
    width = width + 1 if width % 2 == 1 else width
    idx = jnp.arange(state_size, dtype=jnp.int32)
    pos = jnp.stack([idx // width, idx % width], axis=-1)[None]
    return jnp.broadcast_to(pos, (batch, state_size, 2))


class LocalMemory(nn.Module):
    """Pose KV memory (model.py:140-222)."""
    size: int
    k_dim: int
    v_dim: int
    num_heads: int
    depth: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.proj_q = nn.Dense(self.v_dim, dtype=self.dtype, name="proj_q")
        self.masked_token = self.param(
            "masked_token", nn.initializers.normal(0.2), (1, 1, self.v_dim))
        self.mem = self.param(
            "mem", nn.initializers.normal(0.2), (1, self.size, 2 * self.v_dim))
        self.write_blocks = [
            DecoderBlock(self.num_heads, use_rope=False, dtype=self.dtype,
                         name=f"write_blocks_{i}") for i in range(self.depth)]
        self.read_blocks = [
            DecoderBlock(self.num_heads, use_rope=False, dtype=self.dtype,
                         name=f"read_blocks_{i}") for i in range(self.depth)]

    def initial_mem(self, batch: int) -> jax.Array:
        return jnp.broadcast_to(self.mem, (batch, self.size, 2 * self.v_dim))

    def update_mem(self, mem, feat_k, feat_v):
        feat = jnp.concatenate([self.proj_q(feat_k), feat_v], axis=-1)
        for blk in self.write_blocks:
            mem, _ = blk(mem, feat, None, None)
        return mem

    def inquire(self, query, mem):
        x = self.proj_q(query)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(self.masked_token, (x.shape[0], 1, self.v_dim))],
            axis=-1)
        for blk in self.read_blocks:
            x, _ = blk(x, mem, None, None)
        return x[..., -self.v_dim:]

    def __call__(self, mem, feat_k, feat_v):  # for init only
        m = self.update_mem(mem, feat_k, feat_v)
        q = self.inquire(feat_k, m)
        return m, q


class CUT3R(nn.Module):
    cfg: CUT3RConfig

    def setup(self):
        c = self.cfg
        dt = c.compute_dtype
        self.patch_embed = PatchEmbed(c.enc_embed_dim, c.patch_size, dtype=dt,
                                      name="patch_embed")
        self.patch_embed_ray_map = PatchEmbed(c.enc_embed_dim, c.patch_size,
                                              dtype=dt, name="patch_embed_ray_map")
        self.enc_blocks = [
            Block(c.enc_num_heads, c.mlp_ratio, use_rope=True,
                  rope_base=c.rope_base, dtype=dt, name=f"enc_blocks_{i}")
            for i in range(c.enc_depth)]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.enc_blocks_ray_map = [
            Block(16, 4.0, use_rope=True, rope_base=c.rope_base, dtype=dt,
                  name=f"enc_blocks_ray_map_{i}")
            for i in range(c.ray_enc_depth)]
        self.enc_norm_ray_map = nn.LayerNorm(epsilon=1e-6, name="enc_norm_ray_map")

        self.decoder_embed = nn.Dense(c.dec_embed_dim, dtype=dt, name="decoder_embed")
        self.decoder_embed_state = nn.Dense(c.dec_embed_dim, dtype=dt,
                                            name="decoder_embed_state")
        self.dec_blocks = [
            DecoderBlock(c.dec_num_heads, c.mlp_ratio, use_rope=True,
                         rope_base=c.rope_base, dtype=dt, name=f"dec_blocks_{i}")
            for i in range(c.dec_depth)]
        self.dec_blocks_state = [
            DecoderBlock(c.state_dec_num_heads, c.mlp_ratio, use_rope=True,
                         rope_base=c.rope_base, dtype=dt,
                         name=f"dec_blocks_state_{i}")
            for i in range(c.dec_depth)]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        self.dec_norm_state = nn.LayerNorm(epsilon=1e-6, name="dec_norm_state")

        self.register_tokens = nn.Embed(c.state_size, c.enc_embed_dim,
                                        name="register_tokens")
        self.pose_token = self.param(
            "pose_token", nn.initializers.normal(0.02), (1, 1, c.dec_embed_dim))
        self.masked_img_token = self.param(
            "masked_img_token", nn.initializers.normal(0.02), (1, c.enc_embed_dim))
        self.masked_ray_map_token = self.param(
            "masked_ray_map_token", nn.initializers.normal(0.02), (1, c.enc_embed_dim))
        self.pose_retriever = LocalMemory(
            size=c.local_mem_size, k_dim=c.enc_embed_dim, v_dim=c.dec_embed_dim,
            num_heads=c.dec_num_heads, dtype=dt, name="pose_retriever")
        if c.head_type == "linear":
            from .heads import LinearPts3dPose
            self.downstream_head = LinearPts3dPose(
                dec_embed_dim=c.dec_embed_dim, dec_num_heads=c.dec_num_heads,
                patch_size=c.patch_size, has_rgb=c.has_rgb,
                rope_base=c.rope_base, dtype=jnp.float32,
                name="downstream_head")
        else:
            self.downstream_head = DPTPts3dPose(
                dec_embed_dim=c.dec_embed_dim, dec_num_heads=c.dec_num_heads,
                has_rgb=c.has_rgb, rope_base=c.rope_base, dtype=jnp.float32,
                name="downstream_head")

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------
    def encode_image(self, img: jax.Array,
                     portrait_mask: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array]:
        """img: (B, H, W, 3) normalized to [-1,1] -> tokens (B, N, D), pos.
        portrait_mask: (B,) bool ManyAR rows (transposed portrait images
        in the landscape container — see models/patch_embed.py)."""
        x, pos = self.patch_embed(img.astype(self.cfg.compute_dtype),
                                  portrait_mask=portrait_mask)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def encode_ray_map(self, ray_map: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x, pos = self.patch_embed_ray_map(ray_map.astype(self.cfg.compute_dtype))
        for blk in self.enc_blocks_ray_map:
            x = blk(x, pos)
        return self.enc_norm_ray_map(x), pos

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def init_state(self, batch: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (state_feat (B,S,dec), state_pos (B,S,2), mem)."""
        c = self.cfg
        reg = self.register_tokens(jnp.arange(c.state_size))
        state_feat = self.decoder_embed_state(
            jnp.broadcast_to(reg[None], (batch, c.state_size, c.enc_embed_dim)))
        state_pos = _state_positions(c.state_size, batch)
        mem = self.pose_retriever.initial_mem(batch)
        return state_feat.astype(jnp.float32), state_pos, mem.astype(jnp.float32)

    # ------------------------------------------------------------------
    # fused dual-stream decoder (cfg.fused_decoder)
    # ------------------------------------------------------------------
    def _stacked_dec_params(self):
        """Stack the dec_blocks_state/dec_blocks params pairwise along a
        leading axis of 2. Called ONCE per program invocation, outside the
        view scan, so the stacks/casts are loop-invariant; consumed by
        `_fused_dual_layers`. Returns None while initializing (the plain
        path must create the params first)."""
        if self.is_initializing() or not self.cfg.fused_decoder:
            return None
        p = self.variables["params"]
        dt = self.cfg.compute_dtype
        out = []
        for li in range(self.cfg.dec_depth):
            ps = p[f"dec_blocks_state_{li}"]
            pi = p[f"dec_blocks_{li}"]

            def stk(*path, cast=True):
                a, b = ps, pi
                for k in path:
                    a, b = a[k], b[k]
                s = jnp.stack([jnp.asarray(a), jnp.asarray(b)])
                return s.astype(dt) if cast else s

            out.append({
                "norm1": (stk("norm1", "scale", cast=False),
                          stk("norm1", "bias", cast=False)),
                "qkv": (stk("attn", "qkv", "kernel"),
                        stk("attn", "qkv", "bias")),
                "aproj": (stk("attn", "proj", "kernel"),
                          stk("attn", "proj", "bias")),
                "norm_y": (stk("norm_y", "scale", cast=False),
                           stk("norm_y", "bias", cast=False)),
                "norm2": (stk("norm2", "scale", cast=False),
                          stk("norm2", "bias", cast=False)),
                "cq": (stk("cross_attn", "projq", "kernel"),
                       stk("cross_attn", "projq", "bias")),
                "ck": (stk("cross_attn", "projk", "kernel"),
                       stk("cross_attn", "projk", "bias")),
                "cv": (stk("cross_attn", "projv", "kernel"),
                       stk("cross_attn", "projv", "bias")),
                "cproj": (stk("cross_attn", "proj", "kernel"),
                          stk("cross_attn", "proj", "bias")),
                "norm3": (stk("norm3", "scale", cast=False),
                          stk("norm3", "bias", cast=False)),
                "fc1": (stk("mlp", "fc1", "kernel"),
                        stk("mlp", "fc1", "bias")),
                "fc2": (stk("mlp", "fc2", "kernel"),
                        stk("mlp", "fc2", "bias")),
            })
        return out

    def _fused_dual_layers(self, f_state, f_img, state_pos, pos_img, fused_w):
        """Run the 12 interleaved decoder layers with the two streams
        stacked into one batch-2 program (model.py:660-698 semantics; the
        streams are data-independent within a layer). The state stream is
        zero-padded from S to the image stream's T tokens; the padded row
        never enters attention as a query or key (per-stream slices), so
        numerics match the plain path exactly.

        Returns (f_state (B,S,C) f32, f_img (B,T,C) f32, hooks dict).
        """
        c = self.cfg
        C = c.dec_embed_dim
        B, S = f_state.shape[:2]
        T = f_img.shape[1]
        M = max(S, T)  # both streams padded to the longer token count
        dt = c.compute_dtype
        Hs, Hi = c.state_dec_num_heads, c.dec_num_heads

        def ln(x, w):
            # exact nn.LayerNorm(epsilon=1e-6) in f32; w = (scale, bias) (2,C)
            x32 = x.astype(jnp.float32)
            mu = x32.mean(-1, keepdims=True)
            var = jnp.square(x32 - mu).mean(-1, keepdims=True)
            y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
            return y * w[0][:, None, None, :] + w[1][:, None, None, :]

        def pad_to(x):  # (B, N, C) -> (B, M, C)
            n = x.shape[1]
            return jnp.pad(x, ((0, 0), (0, M - n), (0, 0))) if n < M else x

        def proj(x, w):  # stacked Dense: x (2,B,T,·) @ w[0] (2,·,·) + w[1]
            return jnp.einsum("sbtc,scd->sbtd", x, w[0]) + w[1][:, None, None, :]

        def attn(q, k, v, heads, qpos, kpos):
            # q (B,Nq,C), k/v (B,Nk,C) -> (B,Nq,C); rope in the per-head view
            d = C // heads
            q = q.reshape(*q.shape[:2], heads, d).swapaxes(1, 2)
            k = k.reshape(*k.shape[:2], heads, d).swapaxes(1, 2)
            v = v.reshape(*v.shape[:2], heads, d).swapaxes(1, 2)
            q = apply_rope2d(q, qpos, c.rope_base)
            k = apply_rope2d(k, kpos, c.rope_base)
            out = jax.nn.dot_product_attention(
                q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
                scale=d ** -0.5)
            return out.reshape(*out.shape[:2], C)

        X = jnp.stack([pad_to(f_state), pad_to(f_img)]).astype(jnp.float32)
        hooks = {}
        for layer, w in enumerate(fused_w, start=1):
            Y = jnp.stack([X[1], X[0]])  # cross-attn kv: the OTHER stream
            y_n = ln(Y, w["norm_y"]).astype(dt)
            # self-attention: fused qkv, per-stream sdpa (head counts differ)
            h = ln(X, w["norm1"]).astype(dt)
            qkv = proj(h, w["qkv"])
            q0, k0, v0 = jnp.split(qkv[0][:, :S], 3, axis=-1)
            q1, k1, v1 = jnp.split(qkv[1][:, :T], 3, axis=-1)
            a0 = attn(q0, k0, v0, Hs, state_pos, state_pos)
            a1 = attn(q1, k1, v1, Hi, pos_img, pos_img)
            X = X + proj(jnp.stack([pad_to(a0), pad_to(a1)]),
                         w["aproj"]).astype(jnp.float32)
            # cross-attention: fused projections, per-stream sdpa
            h2 = ln(X, w["norm2"]).astype(dt)
            q = proj(h2, w["cq"])
            k = proj(y_n, w["ck"])
            v = proj(y_n, w["cv"])
            c0 = attn(q[0][:, :S], k[0][:, :T], v[0][:, :T],
                      Hs, state_pos, pos_img)
            c1 = attn(q[1][:, :T], k[1][:, :S], v[1][:, :S],
                      Hi, pos_img, state_pos)
            X = X + proj(jnp.stack([pad_to(c0), pad_to(c1)]),
                         w["cproj"]).astype(jnp.float32)
            # mlp
            h3 = ln(X, w["norm3"]).astype(dt)
            m = proj(nn.gelu(proj(h3, w["fc1"]), approximate=False), w["fc2"])
            X = X + m.astype(jnp.float32)
            if layer in (c.dec_depth * 2 // 4, c.dec_depth * 3 // 4):
                hooks[layer] = X[1][:, 1:T]
        return X[0][:, :S], X[1][:, :T], hooks

    # ------------------------------------------------------------------
    # one recurrent decoder step
    # ------------------------------------------------------------------
    def decode_step(self, state_feat, state_pos, mem, feat_i, pos_i,
                    is_first, init_state_feat, init_mem,
                    update: Optional[jax.Array] = None,
                    reset: Optional[jax.Array] = None,
                    fused_w=None):
        """One view through the interleaved decoder (model.py:660-698, 755-815).

        feat_i: (B, N, enc_dim) encoder tokens; is_first: () bool or (B,) —
        selects the learned pose token instead of a memory read.
        Returns (state_feat', mem', hook_tokens, pose_feat_out).
        """
        c = self.cfg
        B = feat_i.shape[0]
        global_feat = jnp.mean(feat_i, axis=1, keepdims=True)  # (B, 1, enc)
        pose_from_mem = self.pose_retriever.inquire(global_feat, mem)
        pose_tok = jnp.broadcast_to(self.pose_token, (B, 1, c.dec_embed_dim))
        is_first_b = jnp.broadcast_to(jnp.asarray(is_first), (B,))
        pose_feat = jnp.where(is_first_b[:, None, None], pose_tok, pose_from_mem)
        pose_pos = -jnp.ones((B, 1, 2), dtype=pos_i.dtype)

        f_img = self.decoder_embed(feat_i)
        f_img = jnp.concatenate([pose_feat.astype(f_img.dtype), f_img], axis=1)
        pos_img = jnp.concatenate([pose_pos, pos_i], axis=1)

        hooks = {0: feat_i.astype(jnp.float32)}
        if fused_w is not None:
            f_state, f_img, mid = self._fused_dual_layers(
                state_feat, f_img, state_pos, pos_img, fused_w)
            hooks.update(mid)
        else:
            f_state = state_feat
            for layer, (blk_state, blk_img) in enumerate(
                    zip(self.dec_blocks_state, self.dec_blocks), start=1):
                f_state_new, _ = blk_state(f_state, f_img, state_pos, pos_img)
                f_img_new, _ = blk_img(f_img, f_state, pos_img, state_pos)
                f_state, f_img = f_state_new, f_img_new
                if layer in (c.dec_depth * 2 // 4, c.dec_depth * 3 // 4):
                    hooks[layer] = f_img[:, 1:].astype(jnp.float32)
        f_state = self.dec_norm_state(f_state).astype(jnp.float32)
        f_img = self.dec_norm(f_img).astype(jnp.float32)
        hooks[c.dec_depth] = f_img

        out_pose_feat = f_img[:, 0:1]
        new_mem = self.pose_retriever.update_mem(mem.astype(global_feat.dtype),
                                                 global_feat, out_pose_feat)

        # update / reset gating (model.py:866-889)
        upd = jnp.ones((B,), jnp.float32) if update is None else update.astype(jnp.float32)
        upd = upd[:, None, None]
        state_feat = f_state * upd + state_feat * (1 - upd)
        mem = new_mem.astype(jnp.float32) * upd + mem * (1 - upd)
        if reset is not None:
            r = reset.astype(jnp.float32)[:, None, None]
            state_feat = init_state_feat * r + state_feat * (1 - r)
            mem = init_mem * r + mem * (1 - r)

        hook_list = [hooks[0], hooks[c.dec_depth * 2 // 4],
                     hooks[c.dec_depth * 3 // 4], hooks[c.dec_depth]]
        return state_feat, mem, hook_list

    # ------------------------------------------------------------------
    # raymap-conditioned single-view inference (model.py:963-1100
    # inference_step: query the state with a 6-channel ray map instead of
    # an image — pose-conditioned prediction without a new observation)
    # ------------------------------------------------------------------
    def inference_step(self, ray_map: jax.Array, state_feat: jax.Array,
                       mem: jax.Array):
        """ray_map: (B, H, W, 6); state carry from a prior forward.
        The state/memory are NOT updated (reference passes update=False).
        Returns the head outputs for the queried view.
        """
        B, H, W, _ = ray_map.shape
        feat, pos = self.encode_ray_map(ray_map)
        init_state, state_pos, init_mem = self.init_state(B)
        _, _, hook_list = self.decode_step(
            state_feat, state_pos, mem, feat, pos,
            jnp.zeros((B,), bool), init_state, init_mem,
            update=jnp.zeros((B,), jnp.float32),
            fused_w=self._stacked_dec_params())
        return self.downstream_head(hook_list, H, W, pos)

    # ------------------------------------------------------------------
    # chunked forward with explicit carry (TBPTT, inference.py:90-216)
    # ------------------------------------------------------------------
    def forward_chunk(self, imgs: jax.Array, carry, chunk_start: jax.Array):
        """Like __call__ but threads an explicit recurrent carry.

        imgs: (V, B, H, W, 3); carry: (state_feat, mem) or None for a
        fresh state; chunk_start: scalar int, global index of view 0 (the
        learned pose token is used only when it is 0).
        Returns (out dict, (state_feat, mem)).
        """
        V, B, H, W, _ = imgs.shape
        feat, pos = self.encode_image(imgs.reshape(V * B, H, W, 3))
        N = feat.shape[1]
        feat = feat.reshape(V, B, N, -1)
        pos = pos.reshape(V, B, N, 2)
        return self.decode_views(feat, pos, H, W, carry, chunk_start)

    def decode_views(self, feat: jax.Array, pos: jax.Array, H: int, W: int,
                     carry, chunk_start: jax.Array,
                     head_outputs=("self", "cross", "rgb", "pose")):
        """Decoder-only chunk over precomputed encoder tokens.

        Enables the reference's TBPTT memory trick (inference.py:90-216):
        encode ALL views once without grad, then run decoder chunks with
        grad over these features — and the SLAM frontend's encoder-token
        reuse (the motion filter already ran the ViT-L encoder per
        keyframe; the submap step decodes straight from kf.featI).
        feat: (V, B, N, enc_dim); pos: (V, B, N, 2).
        """
        V, B, N = feat.shape[:3]
        init_state, state_pos, init_mem = self.init_state(B)
        if carry is None:
            carry = (init_state, init_mem)
        state_feat, mem = carry
        fused_w = self._stacked_dec_params()  # outside the scan: stacked once

        def body(mdl, c, xs):
            sf, mm = c
            feat_i, pos_i, idx = xs
            sf, mm, hook_list = mdl.decode_step(
                sf, state_pos, mm, feat_i, pos_i,
                (chunk_start + idx) == 0, init_state, init_mem,
                fused_w=fused_w)
            return (sf, mm), tuple(hook_list)

        scan_fn = nn.scan(body, variable_broadcast="params",
                          split_rngs={"params": False})
        (state_feat, mem), hooks = scan_fn(
            self, (state_feat, mem), (feat, pos, jnp.arange(V)))

        h0, h6, h9, h12 = [h.reshape((V * B,) + h.shape[2:]) for h in hooks]
        pos_flat = pos.reshape(V * B, N, 2)
        out = self.downstream_head([h0, h6, h9, h12], H, W, pos_flat,
                                   outputs=head_outputs)
        out = {k: v.reshape((V, B) + v.shape[1:]) for k, v in out.items()}
        return out, (state_feat, mem)

    # ------------------------------------------------------------------
    # full forward over a batch of views (offline mode, scan over V)
    # ------------------------------------------------------------------
    def __call__(self, imgs: jax.Array,
                 update: Optional[jax.Array] = None,
                 reset: Optional[jax.Array] = None,
                 ret_state: bool = False,
                 head_outputs=("self", "cross", "rgb", "pose"),
                 true_shape: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        """imgs: (V, B, H, W, 3) in [-1, 1]. update/reset: (V, B) bool.
        true_shape: optional (V, B, 2) int (height, width) per sample —
        rows with height > width are ManyAR portrait images stored
        TRANSPOSED in the landscape container (the reference's
        ManyAR_PatchEmbed + transpose_to_landscape convention,
        src/dust3r/patch_embed.py:35-93, heads/__init__.py); both
        orientations run at static shapes and select per sample.

        Returns dict of stacked per-view outputs, each (V, B, ...):
        pts3d_in_self_view, conf_self, pts3d_in_other_view, conf,
        camera_pose (V, B, 7 wxyz), rgb (optional).
        """
        V, B, H, W, _ = imgs.shape
        pmask = None
        if true_shape is not None and H != W:
            pmask = (true_shape[..., 0] > true_shape[..., 1]).reshape(V * B)
        feat, pos = self.encode_image(imgs.reshape(V * B, H, W, 3),
                                      portrait_mask=pmask)
        if self.is_initializing():
            # materialize the ray-map encoder params (the reference runs a
            # zeroed ray map through it for the same reason, model.py:643)
            _ = self.encode_ray_map(jnp.zeros((1, H, W, 6)))
        N = feat.shape[1]
        feat = feat.reshape(V, B, N, -1)
        pos = pos.reshape(V, B, N, 2)

        state_feat, state_pos, mem = self.init_state(B)
        init_state_feat, init_mem = state_feat, mem

        if update is None:
            update = jnp.ones((V, B), bool)
        if reset is None:
            reset = jnp.zeros((V, B), bool)

        fused_w = self._stacked_dec_params()  # outside the scan: stacked once

        def body(mdl, carry, xs):
            sf, mm = carry
            feat_i, pos_i, upd_i, rst_i, idx = xs
            sf, mm, hook_list = mdl.decode_step(
                sf, state_pos, mm, feat_i, pos_i, idx == 0,
                init_state_feat, init_mem, update=upd_i, reset=rst_i,
                fused_w=fused_w)
            return (sf, mm), tuple(hook_list)

        scan_fn = nn.scan(body, variable_broadcast="params",
                          split_rngs={"params": False})
        (state_feat, mem), hooks = scan_fn(
            self, (state_feat, mem),
            (feat, pos, update, reset, jnp.arange(V)))

        # Batched heads over all views at once.
        h0, h6, h9, h12 = [h.reshape((V * B,) + h.shape[2:]) for h in hooks]
        pos_flat = pos.reshape(V * B, N, 2)
        out = self.downstream_head([h0, h6, h9, h12], H, W, pos_flat,
                                   outputs=head_outputs)
        if pmask is not None:
            # transpose_to_landscape equivalent: portrait samples'
            # tokens are row-major over the (nw, nh) grid, so run the
            # SAME head params once more at the transposed resolution
            # and swap the dense maps' spatial axes back into the
            # container; per-sample select keeps shapes static.
            out_p = self.downstream_head([h0, h6, h9, h12], W, H,
                                         pos_flat, outputs=head_outputs)

            def sel(land, port):
                if port.ndim >= 3 and port.shape[1:3] == (W, H):
                    port = port.swapaxes(1, 2)
                    m = pmask.reshape((-1,) + (1,) * (land.ndim - 1))
                    return jnp.where(m, port, land)
                return land  # non-dense outputs (camera_pose)

            out = {k: sel(out[k], out_p[k]) for k in out}
        out = {k: v.reshape((V, B) + v.shape[1:]) for k, v in out.items()}
        if ret_state:
            out["state"] = (state_feat, mem)
        return out
