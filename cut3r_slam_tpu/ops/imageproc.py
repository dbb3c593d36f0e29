"""Shared image-space math utilities (TV loss, Sobel edges, Gaussian blur).

TPU-native rebuild of the reference's shared math helpers
(/root/reference/hislam2/util/utils.py:232-268 total_variance/TV_loss,
:1052-1068 sobel_edges, :1070+ gaussian_blur). Instead of torch conv2d
with grouped kernels, the small separable/fixed stencils are expressed
as shifted-array FMAs — XLA fuses them into one VPU pass, no im2col, no
layout change, and everything stays jit/vmap/grad-friendly.

Conventions follow the reference: images channel-LAST here (the repo
standard), with the reference's channel-first torch API reproduced in
tests via transposes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["total_variance", "tv_loss", "sobel_edges", "gaussian_blur"]


def total_variance(img: jax.Array):
    """Forward-difference gradients with edge replication.

    img: (..., H, W) or (..., H, W, C) — differences run over the LAST
    two spatial axes, matching utils.py:232-238 (which pads the final
    column/row by repeating the last difference).
    Returns (grad_x, grad_y) with the same shape as ``img``.
    """
    spatial = -2
    if img.ndim >= 3 and img.shape[-1] in (1, 2, 3):
        # channel-last image: spatial axes are -3, -2
        h_ax, w_ax = -3, -2
    else:
        h_ax, w_ax = -2, -1

    def diff(x, ax):
        a = jnp.take(x, jnp.arange(x.shape[ax] - 1), axis=ax)
        b = jnp.take(x, jnp.arange(1, x.shape[ax]), axis=ax)
        d = a - b
        last = jnp.take(d, jnp.asarray([d.shape[ax] - 1]), axis=ax)
        return jnp.concatenate([d, last], axis=ax)

    del spatial
    return diff(img, w_ax), diff(img, h_ax)


def tv_loss(depth: jax.Array, normal: Optional[jax.Array] = None,
            image: Optional[jax.Array] = None,
            conf_masks: Optional[jax.Array] = None):
    """Edge-aware total-variation smoothness loss (utils.py:240-268).

    depth: (B, H, W); normal: (B, H, W, 3); image: (B, H, W, 3) RGB in
    [0, 1]; conf_masks: (B, H, W) multiplicative weights.
    Returns (loss, weights) exactly like the reference: weights =
    exp(-5 * |grad gray|) when an image is given, ones otherwise.
    """
    dgx, dgy = total_variance(depth)

    if image is not None:
        gray = (0.2989 * image[..., 0] + 0.5870 * image[..., 1]
                + 0.1140 * image[..., 2])
        igx, igy = total_variance(gray)
        mag = jnp.sqrt(igx * igx + igy * igy)
        weights = jnp.exp(-mag * 5.0)
    else:
        weights = jnp.ones_like(dgx)

    if conf_masks is None:
        conf_masks = jnp.ones_like(dgx)

    loss = (jnp.abs(dgx) * weights * conf_masks).mean() \
        + (jnp.abs(dgy) * weights * conf_masks).mean()

    if normal is not None:
        ngx, ngy = total_variance(normal)
        loss = loss + 0.05 * (
            (jnp.abs(ngx).mean(-1) * weights * conf_masks).mean()
            + (jnp.abs(ngy).mean(-1) * weights * conf_masks).mean())
    return loss, weights


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """x padded with zeros, shifted by (dy, dx) over the first two axes —
    equivalent to sampling x[i - dy, j - dx] with zero out-of-range."""
    H, W = x.shape[0], x.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, 1 - dy, H, axis=0), 1 - dx, W,
        axis=1)


def sobel_edges(img: jax.Array) -> jax.Array:
    """Per-channel Sobel edge magnitude (utils.py:1052-1068).

    img: (H, W, C) or (H, W). Zero padding like torch conv2d(padding=1).
    Returns sqrt(gx^2 + gy^2 + 1e-6), same shape.
    """
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    # torch's F.conv2d CROSS-CORRELATES, so output(i,j) =
    # sum_k w(k) x(i+k-1, j+k-1); _shift2d(x, -a, -b) gives x(i+a, j+b)
    s = {(a, b): _shift2d(x, -a, -b) for a in (-1, 0, 1) for b in (-1, 0, 1)}
    gx = (s[(-1, -1)] - s[(-1, 1)] + 2 * (s[(0, -1)] - s[(0, 1)])
          + s[(1, -1)] - s[(1, 1)])
    gy = (s[(-1, -1)] + 2 * s[(-1, 0)] + s[(-1, 1)]
          - s[(1, -1)] - 2 * s[(1, 0)] - s[(1, 1)])
    e = jnp.sqrt(gx * gx + gy * gy + 1e-6)
    return e[..., 0] if squeeze else e


def gaussian_blur(img: jax.Array, kernel_size: int = 5,
                  sigma: float = 1.0) -> jax.Array:
    """Separable Gaussian blur with zero padding (utils.py:1070+ uses
    torch conv2d padding=k//2, groups=C — zero boundary, darkened edges,
    reproduced bit-for-bit by two shifted-FMA passes).

    img: (H, W, C) or (H, W).
    """
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    half = kernel_size // 2
    coords = jnp.arange(kernel_size, dtype=x.dtype) - half
    g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()

    H, W = x.shape[0], x.shape[1]

    def pass_axis(y, axis):
        pad = [(0, 0)] * y.ndim
        pad[axis] = (half, half)
        yp = jnp.pad(y, pad)
        out = jnp.zeros_like(y)
        for k in range(kernel_size):
            out = out + g[k] * jax.lax.dynamic_slice_in_dim(
                yp, k, (H, W)[axis], axis=axis)
        return out

    out = pass_axis(pass_axis(x, 0), 1)
    return out[..., 0] if squeeze else out
