"""Spann3R checkpoint-converter parity (VERDICT r2 #8).

The reference loads Spann3R weights via --ckpt_path
(/root/reference/hislam2/modules/spann3r.py:223-500); its dust3r core
class (AsymmetricCroCo3DStereo) is absent from the snapshot, so the
oracle here ASSEMBLES the same architecture at tiny scale from the
snapshot's own blocks (src/dust3r/blocks.py Block/DecoderBlock, the
layout spann3r.py builds its modules from) with the reference state_dict
naming, converts the torch state_dict through
models/convert.convert_spann3r_state_dict, and checks our flax forward
reproduces the torch outputs.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = [pytest.mark.slow,  # integration tier (VERDICT r4 #9)
              pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")]

H = W = 32
ENC, ENCD, ENCH = 64, 2, 2
DEC, DECD, DECH = 48, 4, 2
PS = 16


@pytest.fixture(scope="module")
def torch_oracle():
    sys.path.insert(0, REF)
    sys.path.insert(0, REF + "/croco")
    import torch
    import torch.nn as tnn
    torch.manual_seed(0)
    from dust3r.blocks import Block, DecoderBlock
    from croco.models.pos_embed import RoPE2D

    rope = RoPE2D(freq=100.0)

    # direct cos/sin RoPE (same patch as tests/test_torch_parity.py)
    def direct_forward(self, tokens, positions):
        D = tokens.size(3) // 2
        inv_freq = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))

        def rope1d(tok, pos1d):
            ang = pos1d.float()[..., None] * inv_freq
            ang = torch.cat((ang, ang), dim=-1)
            cos, sin = ang.cos()[:, None], ang.sin()[:, None]
            h = tok.shape[-1] // 2
            rot = torch.cat((-tok[..., h:], tok[..., :h]), dim=-1)
            return tok * cos + rot * sin

        y, x = tokens.chunk(2, dim=-1)
        y = rope1d(y, positions[:, :, 0])
        x = rope1d(x, positions[:, :, 1])
        return torch.cat((y, x), dim=-1)

    import types
    rope.forward = types.MethodType(direct_forward, rope)

    def positions(b, nh, nw):
        y = torch.arange(nh)
        x = torch.arange(nw)
        return torch.cartesian_prod(y, x).view(1, nh * nw, 2) \
            .expand(b, -1, 2).clone()

    class PatchEmbedT(tnn.Module):
        def __init__(self, in_ch, dim):
            super().__init__()
            self.proj = tnn.Conv2d(in_ch, dim, PS, stride=PS)

        def forward(self, img):
            x = self.proj(img)
            b, c, nh, nw = x.shape
            return (x.flatten(2).transpose(1, 2),
                    positions(b, nh, nw))

    class Dust3rPairT(tnn.Module):
        def __init__(self):
            super().__init__()
            nl = lambda d: tnn.LayerNorm(d, eps=1e-6)
            self.patch_embed = PatchEmbedT(3, ENC)
            self.enc_blocks = tnn.ModuleList(
                [Block(ENC, ENCH, 4.0, qkv_bias=True, norm_layer=nl,
                       rope=rope) for _ in range(ENCD)])
            self.enc_norm = nl(ENC)
            self.decoder_embed = tnn.Linear(ENC, DEC)
            self.dec_blocks = tnn.ModuleList(
                [DecoderBlock(DEC, DECH, mlp_ratio=4.0, qkv_bias=True,
                              norm_layer=nl, norm_mem=True, rope=rope)
                 for _ in range(DECD)])
            self.dec_blocks2 = tnn.ModuleList(
                [DecoderBlock(DEC, DECH, mlp_ratio=4.0, qkv_bias=True,
                              norm_layer=nl, norm_mem=True, rope=rope)
                 for _ in range(DECD)])
            self.dec_norm = nl(DEC)
            self.downstream_head1 = tnn.Module()
            self.downstream_head1.proj = tnn.Linear(DEC, PS * PS * 4)
            self.downstream_head2 = tnn.Module()
            self.downstream_head2.proj = tnn.Linear(DEC, PS * PS * 4)

        def encode_image(self, img):
            x, pos = self.patch_embed(img)
            for blk in self.enc_blocks:
                x = blk(x, pos)
            return self.enc_norm(x), pos

        def decode(self, f1, pos1, f2, pos2):
            h1, h2 = [f1], [f2]
            x1 = self.decoder_embed(f1)
            x2 = self.decoder_embed(f2)
            for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
                x1n, _ = b1(x1, x2, pos1, pos2)
                x2n, _ = b2(x2, x1, pos2, pos1)
                x1, x2 = x1n, x2n
                h1.append(x1)
                h2.append(x2)
            h1[-1] = self.dec_norm(h1[-1])
            h2[-1] = self.dec_norm(h2[-1])
            return h1, h2

        def head(self, num, tok):
            hd = getattr(self, f"downstream_head{num}")
            raw = hd.proj(tok)
            b, n, _ = raw.shape
            nh, nw = H // PS, W // PS
            raw = raw.view(b, nh, nw, PS, PS, 4) \
                .permute(0, 1, 3, 2, 4, 5).reshape(b, H, W, 4)
            xyz, c = raw[..., :3], raw[..., 3]
            d = xyz.norm(dim=-1, keepdim=True)
            pts = xyz / d.clamp(min=1e-8) * torch.expm1(d.clamp(max=60.0))
            return pts, 1.0 + torch.exp(c)

    class Spann3RT(tnn.Module):
        def __init__(self):
            super().__init__()
            nl = lambda d: tnn.LayerNorm(d, eps=1e-6)
            self.dust3r = Dust3rPairT()
            self.value_encoder = tnn.ModuleList(
                [Block(ENC, ENCH, 4.0, qkv_bias=True, norm_layer=nl,
                       rope=rope) for _ in range(2)])
            self.value_norm = nl(ENC)
            self.value_out = tnn.Linear(ENC, ENC)
            self.pos_patch_embed = PatchEmbedT(3, ENC)
            self.norm_q = tnn.LayerNorm(ENC)
            self.norm_k = tnn.LayerNorm(ENC)
            self.norm_v = tnn.LayerNorm(ENC)
            d_in = ENC + DEC
            self.attn_head_1 = tnn.Sequential(
                tnn.Linear(d_in, d_in), tnn.GELU(), tnn.Linear(d_in, ENC))
            self.attn_head_2 = tnn.Sequential(
                tnn.Linear(d_in, d_in), tnn.GELU(), tnn.Linear(d_in, ENC))

        def encode_value(self, pts3d):
            x, pos = self.pos_patch_embed(pts3d)
            for blk in self.value_encoder:
                x = blk(x, pos)
            return self.value_out(self.value_norm(x))

    return Spann3RT().eval()


@pytest.fixture(scope="module")
def flax_pair(torch_oracle):
    import jax
    from cut3r_slam_tpu.models.spann3r import Spann3R, Spann3RConfig
    from cut3r_slam_tpu.models.dust3r_pair import Dust3rPairConfig
    from cut3r_slam_tpu.models.convert import convert_spann3r_state_dict
    cfg = Spann3RConfig(
        dust3r=Dust3rPairConfig(enc_embed_dim=ENC, enc_depth=ENCD,
                                enc_num_heads=ENCH, dec_embed_dim=DEC,
                                dec_depth=DECD, dec_num_heads=DECH),
        value_depth=2, value_num_heads=ENCH,
        work_mem_frames=2, long_mem_tokens=16)
    model = Spann3R(cfg)
    params = convert_spann3r_state_dict(torch_oracle.state_dict())
    return model, params


class TestSpann3RConverter:
    def test_pair_forward_parity(self, torch_oracle, flax_pair):
        import torch
        import jax.numpy as jnp
        model, params = flax_pair
        rng = np.random.default_rng(0)
        img0 = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
        img1 = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)

        with torch.no_grad():
            t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
            t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
            f0, p0 = torch_oracle.dust3r.encode_image(t0)
            f1, p1 = torch_oracle.dust3r.encode_image(t1)
            h0, h1 = torch_oracle.dust3r.decode(f0, p0, f1, p1)
            pts0_t, conf0_t = torch_oracle.dust3r.head(1, h0[-1])
            pts1_t, conf1_t = torch_oracle.dust3r.head(2, h1[-1])

        pred0, pred1 = model.apply(params, jnp.asarray(img0),
                                   jnp.asarray(img1),
                                   method="forward_pair")
        np.testing.assert_allclose(np.asarray(pred0["pts3d"]),
                                   pts0_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(pred1["pts3d"]),
                                   pts1_t.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(pred0["conf"]),
                                   conf0_t.numpy(), rtol=2e-4)

    def test_key_and_value_heads_parity(self, torch_oracle, flax_pair):
        import torch
        import jax.numpy as jnp
        model, params = flax_pair
        rng = np.random.default_rng(1)
        N = (H // PS) * (W // PS)
        feat = rng.normal(size=(1, N, ENC)).astype(np.float32)
        dec = rng.normal(size=(1, N, DEC)).astype(np.float32)
        pts = rng.normal(size=(1, H, W, 3)).astype(np.float32)

        with torch.no_grad():
            k_t = torch_oracle.attn_head_1(
                torch.cat([torch.from_numpy(feat),
                           torch.from_numpy(dec)], dim=-1)).numpy()
            v_t = torch_oracle.encode_value(
                torch.from_numpy(pts.transpose(0, 3, 1, 2))).numpy()

        k_j = model.apply(params, jnp.asarray(feat), jnp.asarray(dec), 1,
                          method="encode_feat_key")
        v_j = model.apply(params, jnp.asarray(pts), method="encode_value")
        np.testing.assert_allclose(np.asarray(k_j), k_t, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v_j), v_t, atol=2e-4)

    def test_memory_read_norms_parity(self, torch_oracle, flax_pair):
        """memory_read applies norm_q/k/v exactly as spann3r.py:150-170."""
        import torch
        import jax
        import jax.numpy as jnp
        model, params = flax_pair
        rng = np.random.default_rng(2)
        P, M = 4, 6
        q = rng.normal(size=(1, P, ENC)).astype(np.float32)
        mk = rng.normal(size=(1, M, ENC)).astype(np.float32)
        mv = rng.normal(size=(1, M, ENC)).astype(np.float32)

        with torch.no_grad():
            qt = torch_oracle.norm_q(torch.from_numpy(q))
            kt = torch_oracle.norm_k(torch.from_numpy(mk))
            vt = torch_oracle.norm_v(torch.from_numpy(mv))
            aff = torch.einsum("bpc,bxc->bpx", qt, kt) / np.sqrt(ENC)
            attn = torch.softmax(aff, dim=-1)
            attn = torch.where(attn < 5e-4, torch.zeros(()), attn)
            attn = attn / attn.sum(-1, keepdim=True)
            out_t = (torch.einsum("bpx,bxc->bpc", attn, vt)
                     + torch.from_numpy(q)).numpy()

        # pack K/V into a memory state with only long slots valid
        mem = model.apply(params, 1, P, method="init_memory")
        import dataclasses
        mem = dataclasses.replace(
            mem,
            long_k=jnp.zeros_like(mem.long_k).at[:, :M].set(mk),
            long_v=jnp.zeros_like(mem.long_v).at[:, :M].set(mv),
            long_valid=jnp.zeros_like(mem.long_valid).at[:, :M].set(True))
        out_j, _ = model.apply(params, jnp.asarray(q), mem,
                               method="memory_read")
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)
