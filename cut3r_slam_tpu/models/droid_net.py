"""DROID-SLAM network stack (Flax): feature/context encoders, ConvGRU
update operator, convex upsampling, and the full 12-step BA-in-the-loop
forward.

JAX counterpart of /root/reference/hislam2/modules/droid_net.py, gru.py
and extractor.py (the legacy-but-first-class L10 tracking stack). NHWC
convolutions; the BA inner solver is ops/ba.py; correlation lookups are
ops/corr.py. GradientClip (modules/clipping.py:19) becomes a
custom-gradient clamp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.corr import build_corr_pyramid, corr_lookup
from ..ops.ba import bundle_adjust
from ..geometry.projective import projective_transform, coords_grid

__all__ = ["BasicEncoder", "ConvGRU", "UpdateModule", "DroidNet",
           "cvx_upsample", "grad_clip"]


@jax.custom_vjp
def grad_clip(x):
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


grad_clip.defvjp(_gc_fwd, _gc_bwd)


class ResBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, name):
        if self.norm == "instance":
            # InstanceNorm = GroupNorm with one group per channel
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False, name=name)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    name="conv1")(x)
        y = self._norm("norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = self._norm("norm2")(y)
        y = nn.relu(y)
        if self.stride > 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name="downsample")(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT feature encoder at 1/8 resolution (extractor.py)."""
    output_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, img):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(img)
        if self.norm == "instance":
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, name="norm1")(x)
        x = nn.relu(x)
        x = ResBlock(64, 1, self.norm, name="layer1_0")(x)
        x = ResBlock(64, 1, self.norm, name="layer1_1")(x)
        x = ResBlock(96, 2, self.norm, name="layer2_0")(x)
        x = ResBlock(96, 1, self.norm, name="layer2_1")(x)
        x = ResBlock(128, 2, self.norm, name="layer3_0")(x)
        x = ResBlock(128, 1, self.norm, name="layer3_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class ConvGRU(nn.Module):
    """gru.py:5-33 with the global context gate."""
    h_planes: int = 128

    @nn.compact
    def __call__(self, net, inp):
        net_inp = jnp.concatenate([net, inp], axis=-1)
        glo = jax.nn.sigmoid(nn.Conv(self.h_planes, (1, 1), name="w")(net)) * net
        glo = glo.mean(axis=(1, 2), keepdims=True)

        z = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=1, name="convz")(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convz_glo")(glo))
        r = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), padding=1, name="convr")(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convr_glo")(glo))
        q = jnp.tanh(
            nn.Conv(self.h_planes, (3, 3), padding=1, name="convq")(
                jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(self.h_planes, (1, 1), name="convq_glo")(glo))
        return (1 - z) * net + z * q


def cvx_upsample(data: jax.Array, mask: jax.Array, factor: int = 8):
    """Convex upsampling (droid_net.py:21-38). data (N, h, w, C);
    mask (N, h, w, 9*factor^2)."""
    N, h, w, C = data.shape
    m = mask.reshape(N, h, w, 9, factor * factor)
    m = jax.nn.softmax(m, axis=3)
    # 3x3 neighborhood patches of data
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack([pad[:, dy:dy + h, dx:dx + w]
                         for dy in range(3) for dx in range(3)], axis=3)
    up = jnp.einsum("nhwkf,nhwkc->nhwfc", m, patches)
    up = up.reshape(N, h, w, factor, factor, C)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(N, h * factor, w * factor, C)
    return up


class GraphAgg(nn.Module):
    """Per-frame aggregation of edge states -> eta damping + upmask."""

    @nn.compact
    def __call__(self, net, ii, n_frames: int):
        E = net.shape[0]
        x = nn.relu(nn.Conv(128, (3, 3), padding=1, name="conv1")(net))
        # scatter-mean over edges with the same source frame
        seg = jax.ops.segment_sum(x, ii, num_segments=n_frames)
        cnt = jax.ops.segment_sum(jnp.ones((E,)), ii, num_segments=n_frames)
        x = seg / jnp.maximum(cnt, 1.0)[:, None, None, None]
        x = nn.relu(nn.Conv(128, (3, 3), padding=1, name="conv2")(x))
        eta = nn.softplus(grad_clip(
            nn.Conv(1, (3, 3), padding=1, name="eta_conv")(x)))[..., 0]
        upmask = nn.Conv(8 * 8 * 9, (1, 1), name="upmask_conv")(x)
        return 0.01 * eta, upmask


class UpdateModule(nn.Module):
    """droid_net.py:81-172: corr/flow encoders + GRU + delta/weight heads."""

    @nn.compact
    def __call__(self, net, inp, corr, flow, ii, n_frames: int):
        c = nn.relu(nn.Conv(128, (1, 1), name="corr_enc1")(corr))
        c = nn.relu(nn.Conv(128, (3, 3), padding=1, name="corr_enc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="flow_enc1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="flow_enc2")(f))

        net = ConvGRU(128, name="gru")(net, jnp.concatenate([inp, c, f], -1))

        d = nn.relu(nn.Conv(128, (3, 3), padding=1, name="delta1")(net))
        delta = grad_clip(nn.Conv(2, (3, 3), padding=1, name="delta2")(d))
        w = nn.relu(nn.Conv(128, (3, 3), padding=1, name="weight1")(net))
        weight = jax.nn.sigmoid(grad_clip(
            nn.Conv(2, (3, 3), padding=1, name="weight2")(w)))

        eta, upmask = GraphAgg(name="agg")(net, ii, n_frames)
        return net, delta, weight, eta, upmask


class DroidNet(nn.Module):
    """Full update network; forward = 12 GRU steps x 2 BA iterations."""

    def setup(self):
        self.fnet = BasicEncoder(128, "instance")
        self.cnet = BasicEncoder(256, "none")
        self.update = UpdateModule()

    def extract_features(self, images):
        """images (N, H, W, 3) in [0, 255] -> fmaps, net, inp at 1/8."""
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (images / 255.0 - mean) / std
        fmaps = self.fnet(x)
        ctx = self.cnet(x)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return fmaps, jnp.tanh(net), nn.relu(inp)

    def __call__(self, poses, images, disps, intrinsics, ii, jj,
                 edge_valid, num_steps: int = 12, fixedp: int = 2):
        """poses (P,7) w2c; images (P,H,W,3); disps (P,h,w) at 1/8 res;
        intrinsics (P,4) at 1/8 res; ii/jj (E,) + validity mask.

        Returns (poses, disps, residuals) after the GRU/BA loop.
        """
        fmaps, net0, inp0 = self.extract_features(images)
        net = net0[ii]
        inp = inp0[ii]
        pyramid = build_corr_pyramid(fmaps[ii], fmaps[jj])
        ht, wd = disps.shape[-2:]
        coords0 = coords_grid(ht, wd)
        n_frames = poses.shape[0]

        coords1, _ = projective_transform(poses, disps, intrinsics, ii, jj)
        target = coords1

        def gru_step(carry, _):
            poses, disps, net, target, coords1 = jax.tree.map(
                jax.lax.stop_gradient, carry)
            corr = corr_lookup(pyramid, coords1)
            resd = target - coords1
            flow = coords1 - coords0
            motion = jnp.clip(
                jnp.concatenate([flow, resd], axis=-1), -64.0, 64.0)
            net, delta, weight, eta, upmask = self.update(
                net, inp, corr, motion, ii, n_frames)
            target = coords1 + delta
            poses, disps, _ = bundle_adjust(
                target, weight, eta, poses, disps, intrinsics, ii, jj,
                edge_valid.astype(disps.dtype), fixedp=fixedp,
                n_frames=n_frames, steps=2)
            coords1, vmask = projective_transform(
                poses, disps, intrinsics, ii, jj)
            residual = vmask * (target - coords1)
            return (poses, disps, net, target, coords1), residual

        carry = (poses, disps, net, target, coords1)
        # Python loop (not scan): update() has per-step params shared, so a
        # scan is possible, but the reference detaches between steps and we
        # keep the same semantics with a short unrolled loop of 12.
        residual = None
        for _ in range(num_steps):
            carry, residual = gru_step(carry, None)
        poses, disps, net, target, coords1 = carry
        return poses, disps, residual
