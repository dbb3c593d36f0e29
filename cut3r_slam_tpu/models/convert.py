"""Torch checkpoint -> Flax params converter for CUT3R.

Converts the reference's ``cut3r_512_dpt_4_64.pth`` state_dict (torch,
/root/reference/src/dust3r/model.py naming) into the parameter pytree of
:class:`cut3r_slam_tpu.models.CUT3R`. Pure name/layout mapping — no torch
code is executed beyond ``torch.load``.

Layout transforms:
* Linear: torch (out, in) -> flax kernel (in, out)
* Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
* ConvTranspose2d: torch (in, out, kh, kw) -> flax (kh, kw, out, in)
  with ``transpose_kernel=True`` on the flax side
* LayerNorm weight -> scale; Embedding weight -> embedding

Also applies the reference's ``dec_blocks -> dec_blocks_state`` aliasing
rule for checkpoints that lack a separate state decoder
(model.py:386-393).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "load_cut3r_params", "cast_params_bf16"]


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv(w):
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv(w):
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


# torch Sequential-index -> our flax names inside a DPTAdapter
_ACT_MAP = {
    ("0", "0"): ("act_1_conv", _conv),
    ("0", "1"): ("act_1_deconv", _deconv),
    ("1", "0"): ("act_2_conv", _conv),
    ("1", "1"): ("act_2_deconv", _deconv),
    ("2", "0"): ("act_3_conv", _conv),
    ("3", "0"): ("act_4_conv", _conv),
    ("3", "1"): ("act_4_downconv", _conv),
}
_HEAD_MAP = {"0": "head_0", "2": "head_2", "4": "head_4"}


def _convert_dpt(parts, w, key):
    """parts: path inside a DPTAdapter (after dpt_self/cross/rgb)."""
    if parts[0] == "act_postprocess":
        name, tf = _ACT_MAP[(parts[1], parts[2])]
        return (name, "kernel" if parts[3] == "weight" else "bias"), \
            tf(w) if parts[3] == "weight" else w
    if parts[0] == "scratch":
        if parts[1] == "layer_rn":
            # ModuleList alias of layer{k}_rn (dpt_block.py:72-80) — same
            # tensors registered twice; keep the canonical name.
            return (f"layer{int(parts[2]) + 1}_rn", "kernel"), _conv(w)
        if re.fullmatch(r"layer\d_rn", parts[1]):
            return (parts[1], "kernel"), _conv(w)
        if parts[1].startswith("refinenet"):
            # refinenetK.resConfUnitJ.convI.{weight,bias} | out_conv
            sub = parts[2]
            if sub == "out_conv":
                leaf = "kernel" if parts[3] == "weight" else "bias"
                return (parts[1], "out_conv", leaf), _conv(w) if parts[3] == "weight" else w
            leaf = "kernel" if parts[4] == "weight" else "bias"
            return (parts[1], sub, parts[3], leaf), _conv(w) if parts[4] == "weight" else w
    if parts[0] == "head":
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return (_HEAD_MAP[parts[1]], leaf), _conv(w) if parts[2] == "weight" else w
    raise KeyError(f"unmapped DPT key: {key}")


def _convert_block_leaf(parts, w):
    """Common transformer-block leaves: norms / attn / mlp inside a Block,
    DecoderBlock or LocalMemory block. Returns (path_tuple, value)."""
    name = parts[0]
    if name.startswith("norm") or name == "norm_y":
        return (name, "scale" if parts[1] == "weight" else "bias"), w
    if name in ("attn", "cross_attn"):
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return (name, parts[1], leaf), _linear(w) if parts[2] == "weight" else w
    if name == "mlp":
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return (name, parts[1], leaf), _linear(w) if parts[2] == "weight" else w
    raise KeyError(f"unmapped block leaf: {parts}")


def torch_key_to_flax(key: str, w: np.ndarray) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Map one torch state_dict entry to (flax path, transformed value)."""
    p = key.split(".")

    # --- patch embeds -----------------------------------------------------
    if p[0] in ("patch_embed", "patch_embed_ray_map"):
        # patch_embed.proj.{weight,bias}
        leaf = "kernel" if p[2] == "weight" else "bias"
        return (p[0], "proj", leaf), _conv(w) if p[2] == "weight" else w

    # --- plain params ------------------------------------------------------
    if p[0] == "register_tokens":
        return ("register_tokens", "embedding"), w
    if p[0] in ("pose_token", "masked_img_token", "masked_ray_map_token"):
        return (p[0],), w

    # --- encoder / decoder stacks -------------------------------------------
    m = re.fullmatch(r"(enc_blocks|enc_blocks_ray_map|dec_blocks|dec_blocks_state)", p[0])
    if m:
        idx = p[1]
        path, val = _convert_block_leaf(p[2:], w)
        return (f"{p[0]}_{idx}",) + path, val
    if p[0] in ("enc_norm", "enc_norm_ray_map", "dec_norm", "dec_norm_state"):
        return (p[0], "scale" if p[1] == "weight" else "bias"), w
    if p[0] in ("decoder_embed", "decoder_embed_state"):
        leaf = "kernel" if p[1] == "weight" else "bias"
        return (p[0], leaf), _linear(w) if p[1] == "weight" else w

    # --- LocalMemory ---------------------------------------------------------
    if p[0] == "pose_retriever":
        if p[1] == "proj_q":
            leaf = "kernel" if p[2] == "weight" else "bias"
            return ("pose_retriever", "proj_q", leaf), _linear(w) if p[2] == "weight" else w
        if p[1] in ("masked_token", "mem"):
            return ("pose_retriever", p[1]), w
        if p[1] in ("write_blocks", "read_blocks"):
            path, val = _convert_block_leaf(p[3:], w)
            return ("pose_retriever", f"{p[1]}_{p[2]}") + path, val

    # --- downstream head -------------------------------------------------------
    if p[0] == "downstream_head":
        if p[1] == "pose_head":
            # pose_head.mlp.fc{1,2}.{weight,bias}
            leaf = "kernel" if p[4] == "weight" else "bias"
            return ("downstream_head", "pose_head", "mlp", p[3], leaf), \
                _linear(w) if p[4] == "weight" else w
        if p[1] == "final_transform":
            idx = p[2]
            rest = p[3:]
            if rest[0] in ("norm1", "norm2"):
                if rest[1] == "norm":
                    return ("downstream_head", f"final_transform_{idx}", rest[0],
                            "norm", "scale" if rest[2] == "weight" else "bias"), w
                if rest[1] == "mlp":
                    leaf = "kernel" if rest[3] == "weight" else "bias"
                    return ("downstream_head", f"final_transform_{idx}", rest[0],
                            "mlp_1", leaf), _linear(w) if rest[3] == "weight" else w
            path, val = _convert_block_leaf(rest, w)
            return ("downstream_head", f"final_transform_{idx}") + path, val
        if p[1] in ("dpt_self", "dpt_cross", "dpt_rgb"):
            path, val = _convert_dpt(p[2:], w, key)
            return ("downstream_head", p[1]) + path, val
        if p[1] in ("proj", "cross_proj", "rgb_proj", "self_proj"):
            # linear-head Mlp projections (heads/linear_head.py:264-293);
            # self_proj only exists on the plain LinearPts3d variant
            leaf = "kernel" if p[3] == "weight" else "bias"
            return ("downstream_head", p[1], p[2], leaf), \
                _linear(w) if p[3] == "weight" else w

    raise KeyError(f"unmapped torch key: {key}")


_SKIP_PREFIXES = ("mask_generator", "enc_pos_embed", "dec_pos_embed", "mask_token")


def convert_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch state_dict (tensors or ndarrays) -> nested flax params dict."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    # dec_blocks_state aliasing rule (model.py:386-393)
    if not any(k.startswith("dec_blocks_state") for k in sd):
        for k in list(sd):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks", "dec_blocks_state", 1)] = sd[k]

    params: Dict[str, Any] = {}
    for key, val in sd.items():
        if any(key.startswith(s) for s in _SKIP_PREFIXES):
            continue
        w = np.asarray(val.float().numpy() if hasattr(val, "float") else val,
                       dtype=np.float32)
        path, v = torch_key_to_flax(key, w)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = v
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("model", ckpt)


def load_cut3r_params(path: str):
    """Load + convert a CUT3R torch checkpoint to flax params."""
    return convert_state_dict(load_torch_checkpoint(path))


def cast_params_bf16(params):
    """Cast f32 weight leaves to bf16 STORAGE for inference.

    Batch-1 transformer inference on TPU is HBM weight-streaming bound
    (the encoder measured 13.2% MFU at f32 storage), so halving the
    weight bytes targets the dominant traffic. Matmul compute already
    runs in ``compute_dtype`` (bf16) either way — this only changes what
    is READ from HBM, plus the heads' f32 ops now see bf16-rounded
    weights (the reference evaluates under torch.cuda.amp the same way,
    demo_s.py autocast). LayerNorm scales/biases and all non-f32 leaves
    keep their dtype (tiny, and LN runs f32)."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree.map(cast, params)


# ---------------------------------------------------------------------------
# Spann3R checkpoint converter (hislam2/modules/spann3r.py layout)
# ---------------------------------------------------------------------------

def _spann3r_key_to_flax(key: str, w: np.ndarray):
    """Map one Spann3R torch state_dict entry to (flax path, value).

    Reference layout (spann3r.py:223-278): ``dust3r.*`` wraps the public
    DUSt3R_ViTLarge_BaseDecoder state_dict (enc_blocks / dec_blocks /
    dec_blocks2 / downstream_head{1,2}); the memory modules live at the
    top level (value_encoder.N, value_norm/out, pos_patch_embed,
    norm_{q,k,v}, attn_head_{1,2}).
    """
    p = key.split(".")
    if p[0] == "dust3r":
        q = p[1:]
        if q[0] == "patch_embed":
            leaf = "kernel" if q[2] == "weight" else "bias"
            return ("dust3r", "patch_embed", "proj", leaf), \
                _conv(w) if q[2] == "weight" else w
        if q[0] in ("enc_blocks", "dec_blocks", "dec_blocks2"):
            path, val = _convert_block_leaf(q[2:], w)
            return ("dust3r", f"{q[0]}_{q[1]}") + path, val
        if q[0] in ("enc_norm", "dec_norm"):
            return ("dust3r", q[0],
                    "scale" if q[1] == "weight" else "bias"), w
        if q[0] == "decoder_embed":
            leaf = "kernel" if q[1] == "weight" else "bias"
            return ("dust3r", "decoder_embed", leaf), \
                _linear(w) if q[1] == "weight" else w
        if q[0] in ("downstream_head1", "downstream_head2"):
            if q[1] == "proj":        # LinearPts3d
                leaf = "kernel" if q[2] == "weight" else "bias"
                return ("dust3r", q[0], "proj", leaf), \
                    _linear(w) if q[2] == "weight" else w
            if q[1] == "dpt":
                path, val = _convert_dpt(q[2:], w, key)
                return ("dust3r", q[0], "dpt") + path, val
        raise KeyError(f"unmapped spann3r dust3r key: {key}")
    if p[0] == "value_encoder":
        path, val = _convert_block_leaf(p[2:], w)
        return (f"value_encoder_{p[1]}",) + path, val
    if p[0] == "value_norm":
        return ("value_norm", "scale" if p[1] == "weight" else "bias"), w
    if p[0] == "value_out":
        leaf = "kernel" if p[1] == "weight" else "bias"
        return ("value_out", leaf), _linear(w) if p[1] == "weight" else w
    if p[0] == "pos_patch_embed":
        leaf = "kernel" if p[2] == "weight" else "bias"
        return ("pos_patch_embed", "proj", leaf), \
            _conv(w) if p[2] == "weight" else w
    if p[0] in ("norm_q", "norm_k", "norm_v"):
        return (p[0], "scale" if p[1] == "weight" else "bias"), w
    if p[0] in ("attn_head_1", "attn_head_2"):
        leaf = "kernel" if p[2] == "weight" else "bias"
        fc = {"0": "fc1", "2": "fc2"}[p[1]]
        return (p[0], fc, leaf), _linear(w) if p[2] == "weight" else w
    raise KeyError(f"unmapped spann3r key: {key}")


_SPANN3R_SKIP = ("mem_dropout", "dust3r.mask_token",
                 "dust3r.prediction_head", "dust3r.enc_pos_embed",
                 "dust3r.dec_pos_embed", "dust3r.mask_generator")


def convert_spann3r_state_dict(sd):
    """Spann3R torch state_dict -> nested flax params for models/spann3r.

    Parity-tested against a torch oracle assembled from the snapshot's
    dust3r blocks (tests/test_spann3r_convert.py).
    """
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    params = {}
    for key, val in sd.items():
        if any(key.startswith(s) for s in _SPANN3R_SKIP):
            continue
        w = np.asarray(val.float().numpy() if hasattr(val, "float") else val,
                       dtype=np.float32)
        path, v = _spann3r_key_to_flax(key, w)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = v
    return {"params": params}
