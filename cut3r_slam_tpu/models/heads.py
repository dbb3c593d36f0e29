"""Prediction heads: DPT pyramids, pose decoder, activation postprocess.

JAX counterparts of /root/reference/src/dust3r/heads/dpt_head.py,
heads/postprocess.py and src/croco/models/dpt_block.py. All convs are
NHWC. Upsampling reproduces torch's ``align_corners=True`` bilinear
(jax.image.resize uses half-pixel centers, so we implement align-corners
resize explicitly).

Parity-critical activations (SURVEY.md Appendix A):
* pointmap: ``unit(xyz) * expm1(|xyz|)`` (postprocess.py:113-139)
* confidence: ``1 + exp(x)`` (postprocess.py:142-151)
* pose: translation rescaled ``expm1(|t|)/|t|``; quat normalized with
  non-negative real part, wxyz layout (postprocess.py:30-63,154-167)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Mlp, ConditionModulationBlock

__all__ = [
    "resize_align_corners", "DPTAdapter", "PoseDecoder", "DPTPts3dPose",
    "reg_dense_depth", "reg_dense_conf", "postprocess_pose",
]


def resize_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics. NHWC."""
    B, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x

    def grid(out_n, in_n):
        if out_n == 1:
            return jnp.zeros((1,), x.dtype)
        return jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))

    gy = grid(out_h, H)
    gx = grid(out_w, W)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (gy - y0.astype(jnp.float32))[None, :, None, None]
    wx = (gx - x0.astype(jnp.float32))[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """make_fusion_block equivalent (dpt_block.py:150-230), width_ratio=1."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        B, H, W, C = x.shape
        x = resize_align_corners(x, 2 * H, 2 * W)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTAdapter(nn.Module):
    """DPTOutputAdapter_fix: 4 hook features -> dense prediction.

    hooks are fixed [0,1,2,3] over the 4-element head_input list
    (dpt_head.py:158; model.py:791-796 builds that list from decoder
    layers 0, 6, 9, 12). layer_dims/feature_dim follow create_dpt_head.
    """
    num_channels: int
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Sequence[jax.Array], img_h: int, img_w: int):
        """tokens: 4 arrays (B, N, C_i); returns (B, H, W, num_channels)."""
        nh, nw = img_h // self.patch_size, img_w // self.patch_size
        feats = [t.reshape(t.shape[0], nh, nw, t.shape[-1]) for t in tokens]

        # act_postprocess: 1x1 conv to layer_dims, then scale 4x / 2x / 1x / 0.5x
        l0 = nn.Conv(self.layer_dims[0], (1, 1), dtype=self.dtype,
                     name="act_1_conv")(feats[0])
        l0 = nn.ConvTranspose(self.layer_dims[0], (4, 4), strides=(4, 4),
                              dtype=self.dtype, transpose_kernel=True,
                              name="act_1_deconv")(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), dtype=self.dtype,
                     name="act_2_conv")(feats[1])
        l1 = nn.ConvTranspose(self.layer_dims[1], (2, 2), strides=(2, 2),
                              dtype=self.dtype, transpose_kernel=True,
                              name="act_2_deconv")(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), dtype=self.dtype,
                     name="act_3_conv")(feats[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), dtype=self.dtype,
                     name="act_4_conv")(feats[3])
        l3 = nn.Conv(self.layer_dims[3], (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="act_4_downconv")(l3)

        # scratch.layer{1..4}_rn: 3x3 no-bias convs to feature_dim
        rn = []
        for idx, l in enumerate([l0, l1, l2, l3]):
            rn.append(nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False,
                              dtype=self.dtype, name=f"layer{idx + 1}_rn")(l))

        p4 = FeatureFusionBlock(self.feature_dim, self.dtype, name="refinenet4")(rn[3])
        p4 = p4[:, : rn[2].shape[1], : rn[2].shape[2]]  # crop guard (dpt_head.py:63-65)
        p3 = FeatureFusionBlock(self.feature_dim, self.dtype, name="refinenet3")(p4, rn[2])
        p3 = p3[:, : rn[1].shape[1], : rn[1].shape[2]]
        p2 = FeatureFusionBlock(self.feature_dim, self.dtype, name="refinenet2")(p3, rn[1])
        p2 = p2[:, : rn[0].shape[1], : rn[0].shape[2]]
        p1 = FeatureFusionBlock(self.feature_dim, self.dtype, name="refinenet1")(p2, rn[0])

        # regression head (dpt_block.py:348-361)
        h = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_0")(p1)
        h = resize_align_corners(h, img_h, img_w)
        h = nn.Conv(self.last_dim, (3, 3), padding=1, dtype=self.dtype, name="head_2")(h)
        h = nn.relu(h)
        return nn.Conv(self.num_channels, (1, 1), dtype=self.dtype, name="head_4")(h)


class PoseDecoder(nn.Module):
    """MLP pose head: (B, C) -> (B, 7) [t(3), quat wxyz(4)] raw output."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose_feat):
        return Mlp(self.hidden_dim * 4, out_dim=7, dtype=self.dtype,
                   name="mlp")(pose_feat)


# ---------------------------------------------------------------------------
# postprocess activations (heads/postprocess.py semantics, exp mode)
# ---------------------------------------------------------------------------

def reg_dense_depth(xyz: jax.Array, pos_z: bool = False) -> jax.Array:
    """exp mode: unit(xyz) * expm1(|xyz|); pos_z flips the sign so z >= 0
    (postprocess.py:127-129, used by LinearPts3dPose's self path)."""
    if pos_z:
        xyz = xyz * jnp.sign(xyz[..., -1:])
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    # clamp before expm1: e^60 >> any scene scale, and an unclamped norm
    # overflows f32 to inf during early training, NaN-ing the scale-normalized
    # Regr3D loss (inf/inf)
    return xyz / jnp.maximum(d, 1e-8) * jnp.expm1(jnp.minimum(d, 60.0))


def reg_dense_conf(x: jax.Array, vmin: float = 1.0) -> jax.Array:
    """exp mode, (1, inf): 1 + exp(x)."""
    return vmin + jnp.exp(x)


def postprocess_pose(out: jax.Array) -> jax.Array:
    """exp mode: t * expm1(|t|)/|t|; quat L2-normalized, w >= 0 (wxyz)."""
    trans = out[..., 0:3]
    quats = out[..., 3:7]
    d = jnp.linalg.norm(trans, axis=-1, keepdims=True)
    scale = jnp.expm1(jnp.minimum(d, 60.0)) / jnp.maximum(d, 1e-8)
    trans = trans * scale
    quats = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    quats = jnp.where(quats[..., 0:1] < 0, -quats, quats)
    return jnp.concatenate([trans, quats], axis=-1)


class LinearPts3dPose(nn.Module):
    """Linear head for pts3d+pose (heads/linear_head.py:246-344): Mlp
    projections (hidden = mlp_ratio*D) from the final decoder tokens to
    per-patch (3+1)-channel pixel values; the cross pointmap runs the
    tokens through two pose-conditioned ConditionModulationBlocks first
    (``final_transform``), exactly like the DPT head. Used by the
    224-resolution CUT3R checkpoints."""
    dec_embed_dim: int
    dec_num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    has_rgb: bool = False
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hook_tokens, img_h: int, img_w: int, pos,
                 outputs=("self", "cross", "rgb", "pose")):
        if self.is_initializing():
            outputs = ("self", "cross", "rgb", "pose")
        pose_token = hook_tokens[-1][:, 0]
        token = hook_tokens[-1][:, 1:].astype(jnp.float32)
        B, N, _ = token.shape
        ps = self.patch_size
        nh, nw = img_h // ps, img_w // ps
        hidden = int(self.mlp_ratio * self.dec_embed_dim)

        def unpatch(x, c):
            # torch pixel_shuffle layout: feature f = c*ps^2 + dy*ps + dx
            x = x.reshape(B, nh, nw, c, ps, ps).transpose(0, 1, 4, 2, 5, 3)
            return x.reshape(B, img_h, img_w, c)

        out = {}
        pose_raw = None
        if "pose" in outputs or "cross" in outputs:
            pose_raw = PoseDecoder(self.dec_embed_dim, dtype=jnp.float32,
                                   name="pose_head")(
                pose_token.astype(jnp.float32))
        if "pose" in outputs:
            out["camera_pose"] = postprocess_pose(pose_raw)
        if "self" in outputs:
            self_out = unpatch(Mlp(hidden, ps * ps * 4, dtype=jnp.float32,
                                   name="proj")(token), 4)
            out["pts3d_in_self_view"] = reg_dense_depth(self_out[..., :3],
                                                        pos_z=True)
            out["conf_self"] = reg_dense_conf(self_out[..., 3])
        if "cross" in outputs:
            token_cross = token
            # pos excludes the pose token slot (dpt/linear heads share this)
            pos_img = pos[:, -N:] if pos is not None else None
            for i in range(2):
                token_cross = ConditionModulationBlock(
                    self.dec_num_heads, use_rope=True,
                    rope_base=self.rope_base, dtype=self.dtype,
                    name=f"final_transform_{i}")(
                    token_cross, pose_token.astype(jnp.float32), pos_img)
            cross_out = unpatch(Mlp(hidden, ps * ps * 4, dtype=jnp.float32,
                                    name="cross_proj")(
                token_cross.astype(jnp.float32)), 4)
            out["pts3d_in_other_view"] = reg_dense_depth(cross_out[..., :3])
            out["conf"] = reg_dense_conf(cross_out[..., 3])
        if self.has_rgb and "rgb" in outputs:
            rgb = unpatch(Mlp(hidden, ps * ps * 3, dtype=jnp.float32,
                              name="rgb_proj")(token), 3)
            eps = 1e-6
            out["rgb"] = (jax.nn.sigmoid(rgb) * (1 - 2 * eps) + eps - 0.5) * 2
        return out


class DPTPts3dPose(nn.Module):
    """Live head of cut3r_512_dpt_4_64 (dpt_head.py:139-260).

    Input: list of 4 hook tokens (last one includes the pose token at
    position 0). Outputs dict with pts3d_in_self_view, conf_self,
    pts3d_in_other_view, conf, camera_pose (B, 7 wxyz), optional rgb.
    """
    dec_embed_dim: int
    dec_num_heads: int
    has_rgb: bool = True
    rope_base: float = 100.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hook_tokens, img_h: int, img_w: int, pos,
                 outputs=("self", "cross", "rgb", "pose")):
        """``outputs`` selects which pyramids run at apply time — the SLAM
        tracking path only consumes self + pose (track_frontend.py:77-100
        with use_pose=True), so skipping cross/rgb saves two full DPT
        pyramids per view. All heads are still materialized at init.
        """
        if self.is_initializing():
            outputs = ("self", "cross", "rgb", "pose")
        pose_token = hook_tokens[-1][:, 0]   # (B, C)
        token = hook_tokens[-1][:, 1:]

        out = {}
        if "pose" in outputs:
            pose_raw = PoseDecoder(self.dec_embed_dim, dtype=jnp.float32,
                                   name="pose_head")(
                pose_token.astype(jnp.float32))
            out["camera_pose"] = postprocess_pose(pose_raw)

        x_self = [t.astype(jnp.float32) for t in hook_tokens[:-1]] \
            + [token.astype(jnp.float32)]

        if "self" in outputs:
            self_out = DPTAdapter(num_channels=4, dtype=jnp.float32,
                                  name="dpt_self")(x_self, img_h, img_w)
            out["pts3d_in_self_view"] = reg_dense_depth(self_out[..., :3])
            out["conf_self"] = reg_dense_conf(self_out[..., 3])

        if "cross" in outputs:
            token_cross = token
            for i in range(2):
                token_cross = ConditionModulationBlock(
                    self.dec_num_heads, use_rope=True,
                    rope_base=self.rope_base, dtype=self.dtype,
                    name=f"final_transform_{i}",
                )(token_cross, pose_token, pos)
            x_cross = [t.astype(jnp.float32) for t in hook_tokens[:-1]] \
                + [token_cross.astype(jnp.float32)]
            cross_out = DPTAdapter(num_channels=4, dtype=jnp.float32,
                                   name="dpt_cross")(x_cross, img_h, img_w)
            out["pts3d_in_other_view"] = reg_dense_depth(cross_out[..., :3])
            out["conf"] = reg_dense_conf(cross_out[..., 3])

        if self.has_rgb and "rgb" in outputs:
            rgb_out = DPTAdapter(num_channels=3, dtype=jnp.float32,
                                 name="dpt_rgb")(x_self, img_h, img_w)
            eps = 1e-6
            rgb = jax.nn.sigmoid(rgb_out) * (1 - 2 * eps) + eps
            out["rgb"] = (rgb - 0.5) * 2
        return out

    @staticmethod
    def enc_dim_for_hooks(hook_tokens):
        return tuple(t.shape[-1] for t in hook_tokens)
