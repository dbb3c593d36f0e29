"""Omnidata DPT-hybrid prior: architecture, converter, and parity of the
DPT decoder against the reference midas implementation.

The reference backbone (timm vit_base_resnet50_384) cannot be
instantiated here — timm is not in the image, and the reference itself
only builds it through timm.create_model (midas/vit.py:483). So parity
is tested at the pieces we CAN source independently:
- the DPT decoder (scratch + FeatureFusionBlock_custom + head) against
  the reference's own midas/blocks.py + dpt_depth.py classes (imported
  with a stubbed ``timm`` module — those classes never touch it),
- weight-standardized 'same' conv against the documented timm
  StdConv2dSame formula evaluated with torch,
- align_corners=True bilinear upsampling against torch F.interpolate,
- the full converter on a fabricated state dict with the real
  omnidata_dpt_*_v2 key names and shapes.
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier (VERDICT r4 #9: compile-heavy)
import jax
import jax.numpy as jnp

import torch
import torch.nn as tnn

from cut3r_slam_tpu.models.omnidata import (
    OmnidataDPT, StdConv, FeatureFusion, _resize_align_corners,
    convert_omnidata_state_dict)


def _import_midas_blocks():
    """Import the reference midas.blocks with timm stubbed out (the
    decoder classes used here don't reference it). The stub is removed
    from sys.modules afterwards — a spec-less stub left behind makes
    importlib.util.find_spec("timm") raise in OTHER test modules
    (transformers probes it in tests/test_torch_parity.py)."""
    created = "timm" not in sys.modules
    if created:
        sys.modules["timm"] = types.ModuleType("timm")
    ref = "/root/reference/hislam2"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    try:
        import midas.blocks as mb
    finally:
        if created:
            del sys.modules["timm"]
    return mb


def test_upsample_align_corners_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    out = np.asarray(_resize_align_corners(jnp.asarray(x), 10, 14))
    ref = tnn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_stdconv_matches_timm_formula():
    """timm StdConv2dSame: w = (w - mean) / sqrt(var + 1e-8) over
    (in, kh, kw) per out channel, then TF-'same' conv."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 9, 9, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)  # HWIO
    conv = StdConv(8, 3, 2)
    out = np.asarray(conv.apply({"params": {"kernel": jnp.asarray(w)}},
                                jnp.asarray(x)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    m = wt.mean(dim=(1, 2, 3), keepdim=True)
    v = wt.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    wt = (wt - m) / torch.sqrt(v + 1e-8)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    # TF-'same' for k=3, s=2, H=9: out = ceil(9/2) = 5, pad_total =
    # (5-1)*2 + 3 - 9 = 2 -> symmetric (1, 1) per timm pad_same
    ref = tnn.functional.conv2d(
        tnn.functional.pad(xt, (1, 1, 1, 1)), wt, stride=2).numpy()
    np.testing.assert_allclose(out, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_decoder_parity_vs_reference_midas():
    """FeatureFusion chain + head vs the reference's scratch/refinenet/
    head classes, random weights routed through the converter mapping."""
    mb = _import_midas_blocks()
    F = 32
    torch.manual_seed(0)
    scratch = mb._make_scratch([16, 24, 40, 48], F)
    for k in (1, 2, 3, 4):
        setattr(scratch, f"refinenet{k}", mb.FeatureFusionBlock_custom(
            F, tnn.ReLU(False), deconv=False, bn=False, expand=False,
            align_corners=True))
    head = tnn.Sequential(
        tnn.Conv2d(F, F // 2, 3, padding=1),
        mb.Interpolate(scale_factor=2, mode="bilinear",
                       align_corners=True),
        tnn.Conv2d(F // 2, 16, 3, padding=1), tnn.ReLU(True),
        tnn.Conv2d(16, 1, 1), tnn.ReLU(True), tnn.Identity())
    scratch.output_conv = head

    rng = np.random.default_rng(2)
    H = 8
    feats = [rng.normal(size=(1, c, H * s, H * s)).astype(np.float32) * .3
             for c, s in zip((16, 24, 40, 48), (8, 4, 2, 1))]
    with torch.no_grad():
        l_rn = [getattr(scratch, f"layer{k}_rn")(torch.from_numpy(f))
                for k, f in zip((1, 2, 3, 4), feats)]
        p4 = scratch.refinenet4(l_rn[3])
        p3 = scratch.refinenet3(p4, l_rn[2])
        p2 = scratch.refinenet2(p3, l_rn[1])
        p1 = scratch.refinenet1(p2, l_rn[0])
        ref = scratch.output_conv(p1).numpy()[:, 0]

    # route the torch weights through the converter's name mapping
    sd = {}
    for k in (1, 2, 3, 4):
        sd[f"scratch.layer{k}_rn.weight"] = \
            getattr(scratch, f"layer{k}_rn").weight
        r = getattr(scratch, f"refinenet{k}")
        for i in (1, 2):
            rc = getattr(r, f"resConfUnit{i}")
            sd[f"scratch.refinenet{k}.resConfUnit{i}.conv1.weight"] = rc.conv1.weight
            sd[f"scratch.refinenet{k}.resConfUnit{i}.conv1.bias"] = rc.conv1.bias
            sd[f"scratch.refinenet{k}.resConfUnit{i}.conv2.weight"] = rc.conv2.weight
            sd[f"scratch.refinenet{k}.resConfUnit{i}.conv2.bias"] = rc.conv2.bias
        sd[f"scratch.refinenet{k}.out_conv.weight"] = r.out_conv.weight
        sd[f"scratch.refinenet{k}.out_conv.bias"] = r.out_conv.bias
    for i in (0, 2, 4):
        sd[f"scratch.output_conv.{i}.weight"] = head[i].weight
        sd[f"scratch.output_conv.{i}.bias"] = head[i].bias

    from cut3r_slam_tpu.models.omnidata import _t

    def cv(w):
        return jnp.asarray(_t(w.detach().numpy()))

    import flax.linen as fnn

    class Dec(fnn.Module):
        @fnn.compact
        def __call__(self, feats):
            rn = [fnn.Conv(F, (3, 3), padding=1, use_bias=False,
                           name=f"layer{k}_rn")(v)
                  for k, v in zip((1, 2, 3, 4), feats)]
            p4 = FeatureFusion(name="refinenet4")(rn[3])
            p3 = FeatureFusion(name="refinenet3")(p4, rn[2])
            p2 = FeatureFusion(name="refinenet2")(p3, rn[1])
            p1 = FeatureFusion(name="refinenet1")(p2, rn[0])
            y = fnn.Conv(F // 2, (3, 3), padding=1,
                         name="head_conv1")(p1)
            y = _resize_align_corners(y, y.shape[1] * 2, y.shape[2] * 2)
            y = fnn.relu(fnn.Conv(16, (3, 3), padding=1,
                                  name="head_conv2")(y))
            y = fnn.relu(fnn.Conv(1, (1, 1), name="head_conv3")(y))
            return y[..., 0]

    P = {}
    for k in (1, 2, 3, 4):
        P[f"layer{k}_rn"] = {"kernel": cv(sd[f"scratch.layer{k}_rn.weight"])}
        rp = {}
        for i in (1, 2):
            rp[f"rcu{i}"] = {
                "conv1": {"kernel": cv(sd[f"scratch.refinenet{k}.resConfUnit{i}.conv1.weight"]),
                          "bias": jnp.asarray(sd[f"scratch.refinenet{k}.resConfUnit{i}.conv1.bias"].detach().numpy())},
                "conv2": {"kernel": cv(sd[f"scratch.refinenet{k}.resConfUnit{i}.conv2.weight"]),
                          "bias": jnp.asarray(sd[f"scratch.refinenet{k}.resConfUnit{i}.conv2.bias"].detach().numpy())}}
        rp["out_conv"] = {
            "kernel": cv(sd[f"scratch.refinenet{k}.out_conv.weight"]),
            "bias": jnp.asarray(sd[f"scratch.refinenet{k}.out_conv.bias"].detach().numpy())}
        P[f"refinenet{k}"] = rp
    for i, name in ((0, "head_conv1"), (2, "head_conv2"),
                    (4, "head_conv3")):
        P[name] = {"kernel": cv(sd[f"scratch.output_conv.{i}.weight"]),
                   "bias": jnp.asarray(sd[f"scratch.output_conv.{i}.bias"].detach().numpy())}

    feats_jax = [jnp.asarray(np.transpose(f, (0, 2, 3, 1))) for f in feats]
    out = np.asarray(Dec().apply({"params": P}, feats_jax))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def _fabricate_state_dict(rng):
    """Random state dict with the real omnidata_dpt_*_v2 names/shapes."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.05

    pm = "pretrained.model."
    add(pm + "patch_embed.backbone.stem.conv.weight", 64, 3, 7, 7)
    add(pm + "patch_embed.backbone.stem.norm.weight", 64)
    add(pm + "patch_embed.backbone.stem.norm.bias", 64)
    chans = [(256, 64), (512, 256), (1024, 512)]
    for s, n in enumerate((3, 4, 9)):
        out_c, in_c = chans[s]
        mid = out_c // 4
        for b in range(n):
            src = pm + f"patch_embed.backbone.stages.{s}.blocks.{b}."
            ic = in_c if b == 0 else out_c
            if b == 0:
                add(src + "downsample.conv.weight", out_c, ic, 1, 1)
                add(src + "downsample.norm.weight", out_c)
                add(src + "downsample.norm.bias", out_c)
            add(src + "conv1.weight", mid, ic, 1, 1)
            add(src + "norm1.weight", mid); add(src + "norm1.bias", mid)
            add(src + "conv2.weight", mid, mid, 3, 3)
            add(src + "norm2.weight", mid); add(src + "norm2.bias", mid)
            add(src + "conv3.weight", out_c, mid, 1, 1)
            add(src + "norm3.weight", out_c); add(src + "norm3.bias", out_c)
    add(pm + "cls_token", 1, 1, 768)
    add(pm + "pos_embed", 1, 577, 768)
    add(pm + "patch_embed.proj.weight", 768, 1024, 1, 1)
    add(pm + "patch_embed.proj.bias", 768)
    for i in range(12):
        src = pm + f"blocks.{i}."
        add(src + "norm1.weight", 768); add(src + "norm1.bias", 768)
        add(src + "attn.qkv.weight", 2304, 768)
        add(src + "attn.qkv.bias", 2304)
        add(src + "attn.proj.weight", 768, 768)
        add(src + "attn.proj.bias", 768)
        add(src + "norm2.weight", 768); add(src + "norm2.bias", 768)
        add(src + "mlp.fc1.weight", 3072, 768)
        add(src + "mlp.fc1.bias", 3072)
        add(src + "mlp.fc2.weight", 768, 3072)
        add(src + "mlp.fc2.bias", 768)
    for idx in (3, 4):
        src = f"pretrained.act_postprocess{idx}."
        add(src + "0.project.0.weight", 768, 1536)
        add(src + "0.project.0.bias", 768)
        add(src + "3.weight", 768, 768, 1, 1)
        add(src + "3.bias", 768)
    add("pretrained.act_postprocess4.4.weight", 768, 768, 3, 3)
    add("pretrained.act_postprocess4.4.bias", 768)
    for k, c in ((1, 256), (2, 512), (3, 768), (4, 768)):
        add(f"scratch.layer{k}_rn.weight", 256, c, 3, 3)
        src = f"scratch.refinenet{k}."
        for r in (1, 2):
            add(src + f"resConfUnit{r}.conv1.weight", 256, 256, 3, 3)
            add(src + f"resConfUnit{r}.conv1.bias", 256)
            add(src + f"resConfUnit{r}.conv2.weight", 256, 256, 3, 3)
            add(src + f"resConfUnit{r}.conv2.bias", 256)
        add(src + "out_conv.weight", 256, 256, 1, 1)
        add(src + "out_conv.bias", 256)
    add("scratch.output_conv.0.weight", 128, 256, 3, 3)
    add("scratch.output_conv.0.bias", 128)
    add("scratch.output_conv.2.weight", 32, 128, 3, 3)
    add("scratch.output_conv.2.bias", 32)
    add("scratch.output_conv.4.weight", 1, 32, 1, 1)
    add("scratch.output_conv.4.bias", 1)
    return sd


def test_full_convert_and_forward():
    """Converter consumes the real key/shape layout; the converted model
    runs forward at a 64x64 input and produces a finite depth map with
    every parameter consumed from the state dict (init-shape match)."""
    rng = np.random.default_rng(3)
    sd = _fabricate_state_dict(rng)
    params = convert_omnidata_state_dict(sd, "depth")
    model = OmnidataDPT(task="depth")
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    # shape-check converted params against a real init
    ref_shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), x))
    conv_flat = jax.tree_util.tree_leaves_with_path(params)
    ref_flat = dict(jax.tree_util.tree_leaves_with_path(ref_shapes))
    assert len(conv_flat) == len(ref_flat)
    for path, leaf in conv_flat:
        assert path in ref_flat, f"unexpected param {path}"
        assert leaf.shape == ref_flat[path].shape, \
            f"shape mismatch at {path}: {leaf.shape} vs {ref_flat[path].shape}"
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64)
    assert bool(jnp.isfinite(out).all())
    assert bool((out >= 0).all())  # non_negative head ReLU


def test_normal_task_shapes():
    model = OmnidataDPT(task="normal")
    x = jnp.zeros((1, 32, 64, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    out = jax.eval_shape(lambda: model.apply(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params), x))
    assert out.shape == (1, 32, 64, 3)
