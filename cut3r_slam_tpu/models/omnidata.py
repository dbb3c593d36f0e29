"""Omnidata DPT-hybrid prior network + checkpoint converter.

TPU rebuild of the reference's OmnidataModel
(/root/reference/hislam2/midas/omnidata.py:54-155 — a DPT depth/normal
predictor on timm's ``vit_base_resnet50_384`` hybrid backbone, used as a
monocular prior source by motion_filter.py:58-66). The torch stack there
is timm's ResNetV2-50 stem + ViT-B with forward hooks
(midas/vit.py:436-493) feeding the midas DPT decoder
(midas/dpt_depth.py:26-106, midas/blocks.py). Here the whole network is
one flax module in NHWC with statically-shaped token streams — no hooks,
the four pyramid taps are returned by construction — and the public
Omnidata checkpoints (``omnidata_dpt_{depth,normal}_v2.ckpt``) convert
via :func:`convert_omnidata_state_dict`.

Architecture facts encoded below (all cited from the reference):
- backbone ``vitb_rn50_384``: ResNetV2 stem (StdConv2d-same 7x7/2, GN32,
  ReLU, maxpool-same 3x3/2) + stages of (3, 4, 9) non-preact bottleneck
  blocks, channels (256, 512, 1024), strides (1, 2, 2); weight-std conv
  eps 1e-8 (timm ``_resnetv2`` helper used by vit_base_resnet50_384).
- taps: stage0 output (1/4, 256ch), stage1 output (1/8, 512ch),
  transformer blocks 8 and 11 (pre-final-norm), per
  midas/vit.py:436-463 hooks=[0, 1, 8, 11].
- readout "project": cls-token concat + Linear(2D, D) + GELU
  (midas/vit.py:36-47), then 1x1 conv to 768 (+ 3x3/2 for the 1/32 tap)
  (midas/vit.py:431-470 act_postprocess3/4).
- decoder: scratch 3x3 convs (no bias) to 256ch, four
  FeatureFusionBlock_custom refinenets (2x ResidualConvUnit, bilinear x2
  align_corners=True, 1x1 out conv), head conv3-up2-conv3-relu-conv1-relu
  (midas/blocks.py:49-341, midas/dpt_depth.py:15-101).
- preproc: depth task normalizes (x - 0.5) / 0.5, normal task raw [0,1]
  (midas/omnidata.py:86-89); H, W must be multiples of 32.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

__all__ = ["OmnidataDPT", "convert_omnidata_state_dict",
           "load_omnidata_ckpt"]


# --------------------------------------------------------------------- #
# backbone building blocks
# --------------------------------------------------------------------- #
class StdConv(nn.Module):
    """Weight-standardized conv, TF-'same' padding (timm StdConv2dSame,
    eps=1e-8): kernel is standardized over (kh, kw, in) per out channel
    at call time, so converted checkpoints keep raw weights."""
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel,
                        x.shape[-1], self.features))
        mu = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k, axis=(0, 1, 2), keepdims=True)
        k = (k - mu) / jnp.sqrt(var + 1e-8)
        y = jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class GroupNormAct(nn.Module):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct)."""
    apply_act: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)
        return nn.relu(y) if self.apply_act else y


class Bottleneck(nn.Module):
    """timm ResNetV2 non-preact bottleneck (conv-norm x3 + act(add))."""
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        short = x
        if x.shape[-1] != self.out_ch or self.stride != 1:
            short = StdConv(self.out_ch, 1, self.stride,
                            name="downsample_conv")(x)
            short = GroupNormAct(apply_act=False,
                                 name="downsample_norm")(short)
        y = GroupNormAct(name="norm1")(StdConv(mid, 1, name="conv1")(x))
        y = GroupNormAct(name="norm2")(
            StdConv(mid, 3, self.stride, name="conv2")(y))
        y = GroupNormAct(apply_act=False, name="norm3")(
            StdConv(self.out_ch, 1, name="conv3")(y))
        return nn.relu(y + short)


class ResNetV2Stem(nn.Module):
    """Hybrid-ViT conv stem: 7x7/2 + GN + ReLU + maxpool-same 3x3/2,
    then stages (3, 4, 9); returns (stage0, stage1, stage2) taps."""
    layers: Sequence[int] = (3, 4, 9)
    widths: Sequence[int] = (256, 512, 1024)

    @nn.compact
    def __call__(self, x):
        y = StdConv(64, 7, 2, name="stem_conv")(x)
        y = GroupNormAct(name="stem_norm")(y)
        # MaxPool2dSame(3, 2): TF-'same' window padding with -inf fill
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        taps = []
        for s, (n, w) in enumerate(zip(self.layers, self.widths)):
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                y = Bottleneck(w, stride, name=f"stage{s}_block{b}")(y)
            taps.append(y)
        return taps


class ViTBlock(nn.Module):
    """timm ViT-B block: pre-LN MHSA + pre-LN MLP(4x, GELU)."""
    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(h).reshape(
            B, N, 3, self.heads, D // self.heads)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D // self.heads)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3)
        x = x + nn.Dense(D, name="attn_proj")(o.reshape(B, N, D))
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * D, name="fc1")(h)
        h = nn.Dense(D, name="fc2")(nn.gelu(h, approximate=False))
        return x + h


# --------------------------------------------------------------------- #
# DPT decoder blocks
# --------------------------------------------------------------------- #
def _upsample2(x):
    """Bilinear 2x with align_corners=True (torch F.interpolate in
    FeatureFusionBlock_custom.forward, midas/blocks.py:320-341)."""
    B, H, W, C = x.shape
    return _resize_align_corners(x, 2 * H, 2 * W)


def _resize_align_corners(x, out_h, out_w):
    B, H, W, C = x.shape
    # torch align_corners=True: sample grid endpoints map to endpoints
    ys = jnp.linspace(0.0, H - 1.0, out_h)
    xs = jnp.linspace(0.0, W - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yy, xx: x[:, yy][:, :, xx]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ResidualConvUnit(nn.Module):
    """midas ResidualConvUnit_custom (no BN variant, as built by
    _make_fusion_block(use_bn=False), dpt_depth.py:15-24)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = nn.Conv(C, (3, 3), padding=1, name="conv1")(nn.relu(x))
        y = nn.Conv(C, (3, 3), padding=1, name="conv2")(nn.relu(y))
        return y + x


class FeatureFusion(nn.Module):
    """midas FeatureFusionBlock_custom: optional skip through RCU1,
    RCU2, bilinear 2x (align_corners), 1x1 out conv."""

    @nn.compact
    def __call__(self, x, skip=None):
        C = x.shape[-1]
        if skip is not None:
            x = x + ResidualConvUnit(name="rcu1")(skip)
        x = ResidualConvUnit(name="rcu2")(x)
        x = _upsample2(x)
        return nn.Conv(C, (1, 1), name="out_conv")(x)


# --------------------------------------------------------------------- #
# full model
# --------------------------------------------------------------------- #
class OmnidataDPT(nn.Module):
    """DPT on the ViT-hybrid backbone; ``task`` picks output channels and
    the input normalization the reference applies per task."""
    task: str = "depth"            # "depth" (1ch) | "normal" (3ch)
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    hook_blocks: Sequence[int] = (8, 11)
    features: int = 256
    resnet_layers: Sequence[int] = (3, 4, 9)

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        """img: (B, H, W, 3) float in [0, 1]; H, W multiples of 32.
        Returns (B, H, W) depth or (B, H, W, 3) normals."""
        B, H, W, _ = img.shape
        if H % 32 or W % 32:
            raise ValueError("H, W must be multiples of 32")
        x = img.astype(jnp.float32)
        if self.task == "depth":
            x = (x - 0.5) / 0.5   # omnidata.py:86-89

        taps = ResNetV2Stem(self.resnet_layers, name="backbone")(x)
        layer1, layer2, feat = taps            # 1/4, 1/8, 1/16

        # --- tokens ----------------------------------------------------
        gh, gw = H // 16, W // 16
        t = nn.Conv(self.vit_dim, (1, 1), name="embed_proj")(feat)
        t = t.reshape(B, gh * gw, self.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 577, self.vit_dim))   # 24x24 grid + cls
        pos_grid = pos[:, 1:].reshape(1, 24, 24, self.vit_dim)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, self.vit_dim),
                                    "bilinear")    # _resize_pos_embed
        pos_r = jnp.concatenate(
            [pos[:, :1], pos_grid.reshape(1, gh * gw, self.vit_dim)], 1)
        t = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), t], axis=1) + pos_r

        hooked: Dict[int, jax.Array] = {}
        for i in range(self.vit_depth):
            t = ViTBlock(self.vit_dim, self.vit_heads,
                         name=f"block{i}")(t)
            if i in self.hook_blocks:
                hooked[i] = t        # pre-final-norm (vit.py hooks)

        def readout(tok, idx):
            """'project' readout + unflatten (vit.py:36-47, :431-452)."""
            r = jnp.broadcast_to(tok[:, :1], tok[:, 1:].shape)
            y = jnp.concatenate([tok[:, 1:], r], -1)
            y = nn.Dense(self.vit_dim, name=f"readout{idx}_proj")(y)
            y = nn.gelu(y, approximate=False)
            return y.reshape(B, gh, gw, self.vit_dim)

        layer3 = nn.Conv(self.vit_dim, (1, 1), name="post3_conv")(
            readout(hooked[self.hook_blocks[0]], 3))
        layer4 = nn.Conv(self.vit_dim, (3, 3), strides=2, padding=1,
                         name="post4_conv2")(
            nn.Conv(self.vit_dim, (1, 1), name="post4_conv")(
                readout(hooked[self.hook_blocks[1]], 4)))

        # --- scratch + refinenets (dpt_depth.py:70-88) ------------------
        F = self.features
        rn = [nn.Conv(F, (3, 3), padding=1, use_bias=False,
                      name=f"layer{k}_rn")(v)
              for k, v in ((1, layer1), (2, layer2),
                           (3, layer3), (4, layer4))]
        p4 = FeatureFusion(name="refinenet4")(rn[3])
        p3 = FeatureFusion(name="refinenet3")(p4, rn[2])
        p2 = FeatureFusion(name="refinenet2")(p3, rn[1])
        p1 = FeatureFusion(name="refinenet1")(p2, rn[0])

        # --- head (dpt_depth.py:91-101) ---------------------------------
        n_out = 1 if self.task == "depth" else 3
        y = nn.Conv(F // 2, (3, 3), padding=1, name="head_conv1")(p1)
        y = _upsample2(y)
        y = nn.relu(nn.Conv(32, (3, 3), padding=1, name="head_conv2")(y))
        y = nn.relu(nn.Conv(n_out, (1, 1), name="head_conv3")(y))
        return y[..., 0] if self.task == "depth" else y


# --------------------------------------------------------------------- #
# checkpoint conversion
# --------------------------------------------------------------------- #
def _t(w):  # torch OIHW conv -> HWIO
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _lin(w):  # torch (out, in) -> (in, out)
    return np.asarray(w, np.float32).T


def convert_omnidata_state_dict(sd: Dict[str, Any], task: str = "depth",
                                ) -> Dict[str, Any]:
    """Map an omnidata_dpt_*_v2 torch state dict (``model.`` prefix
    stripped, omnidata.py:78-83) onto :class:`OmnidataDPT` params.

    Accepts torch tensors or numpy arrays. Raises KeyError listing any
    expected-but-missing entries so partial dumps fail loudly.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    P: Dict[str, Any] = {}

    def put(path, val):
        d = P
        parts = path.split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(val)

    pm = "pretrained.model."
    # -- resnet stem + stages
    put("backbone.stem_conv.kernel", _t(sd[pm + "patch_embed.backbone.stem.conv.weight"]))
    put("backbone.stem_norm.gn.scale", sd[pm + "patch_embed.backbone.stem.norm.weight"])
    put("backbone.stem_norm.gn.bias", sd[pm + "patch_embed.backbone.stem.norm.bias"])
    for s, n in enumerate((3, 4, 9)):
        for b in range(n):
            src = pm + f"patch_embed.backbone.stages.{s}.blocks.{b}."
            dst = f"backbone.stage{s}_block{b}."
            for c in (1, 2, 3):
                put(dst + f"conv{c}.kernel", _t(sd[src + f"conv{c}.weight"]))
                put(dst + f"norm{c}.gn.scale", sd[src + f"norm{c}.weight"])
                put(dst + f"norm{c}.gn.bias", sd[src + f"norm{c}.bias"])
            if src + "downsample.conv.weight" in sd:
                put(dst + "downsample_conv.kernel",
                    _t(sd[src + "downsample.conv.weight"]))
                put(dst + "downsample_norm.gn.scale",
                    sd[src + "downsample.norm.weight"])
                put(dst + "downsample_norm.gn.bias",
                    sd[src + "downsample.norm.bias"])
    # -- vit
    put("cls_token", sd[pm + "cls_token"])
    put("pos_embed", sd[pm + "pos_embed"])
    put("embed_proj.kernel", _t(sd[pm + "patch_embed.proj.weight"]))
    put("embed_proj.bias", sd[pm + "patch_embed.proj.bias"])
    for i in range(12):
        src = pm + f"blocks.{i}."
        dst = f"block{i}."
        put(dst + "norm1.scale", sd[src + "norm1.weight"])
        put(dst + "norm1.bias", sd[src + "norm1.bias"])
        put(dst + "qkv.kernel", _lin(sd[src + "attn.qkv.weight"]))
        put(dst + "qkv.bias", sd[src + "attn.qkv.bias"])
        put(dst + "attn_proj.kernel", _lin(sd[src + "attn.proj.weight"]))
        put(dst + "attn_proj.bias", sd[src + "attn.proj.bias"])
        put(dst + "norm2.scale", sd[src + "norm2.weight"])
        put(dst + "norm2.bias", sd[src + "norm2.bias"])
        put(dst + "fc1.kernel", _lin(sd[src + "mlp.fc1.weight"]))
        put(dst + "fc1.bias", sd[src + "mlp.fc1.bias"])
        put(dst + "fc2.kernel", _lin(sd[src + "mlp.fc2.weight"]))
        put(dst + "fc2.bias", sd[src + "mlp.fc2.bias"])
    # -- readout + postprocess (act_postprocess3/4: [0]=ProjectReadout,
    #    [3]=1x1 conv, [4]=3x3/2 conv; vit.py:431-470)
    for idx, name in ((3, "post3"), (4, "post4")):
        src = f"pretrained.act_postprocess{idx}."
        put(f"readout{idx}_proj.kernel", _lin(sd[src + "0.project.0.weight"]))
        put(f"readout{idx}_proj.bias", sd[src + "0.project.0.bias"])
        put(f"{name}_conv.kernel", _t(sd[src + "3.weight"]))
        put(f"{name}_conv.bias", sd[src + "3.bias"])
    put("post4_conv2.kernel", _t(sd["pretrained.act_postprocess4.4.weight"]))
    put("post4_conv2.bias", sd["pretrained.act_postprocess4.4.bias"])
    # -- scratch + refinenets + head
    for k in (1, 2, 3, 4):
        put(f"layer{k}_rn.kernel", _t(sd[f"scratch.layer{k}_rn.weight"]))
        src = f"scratch.refinenet{k}."
        dst = f"refinenet{k}."
        # refinenet4 gets a single input, so its resConfUnit1 is dead
        # weight in the reference too (blocks.py FeatureFusionBlock_custom
        # only runs resConfUnit1 when a skip is passed; dpt_depth.py:84
        # calls refinenet4(layer_4_rn) with no skip) — flax never creates
        # those params, so the converter drops them.
        for r in ((2,) if k == 4 else (1, 2)):
            for c in (1, 2):
                put(dst + f"rcu{r}.conv{c}.kernel",
                    _t(sd[src + f"resConfUnit{r}.conv{c}.weight"]))
                put(dst + f"rcu{r}.conv{c}.bias",
                    sd[src + f"resConfUnit{r}.conv{c}.bias"])
        put(dst + "out_conv.kernel", _t(sd[src + "out_conv.weight"]))
        put(dst + "out_conv.bias", sd[src + "out_conv.bias"])
    for i, name in ((0, "head_conv1"), (2, "head_conv2"),
                    (4, "head_conv3")):
        put(f"{name}.kernel", _t(sd[f"scratch.output_conv.{i}.weight"]))
        put(f"{name}.bias", sd[f"scratch.output_conv.{i}.bias"])
    return {"params": P}


def load_omnidata_ckpt(path: str, task: str = "depth"):
    """Load + convert an ``omnidata_dpt_{task}_v2.ckpt`` torch pickle
    (omnidata.py:74-83: ckpt["state_dict"], "model." prefix)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {(k[len("model."):] if k.startswith("model.") else k): v
          for k, v in sd.items()}
    model = OmnidataDPT(task=task)
    return model, convert_omnidata_state_dict(sd, task)
