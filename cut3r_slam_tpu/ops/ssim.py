"""SSIM with an 11-tap Gaussian window (loss_utils.py:25-167 semantics)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ssim"]


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(img1: jax.Array, img2: jax.Array, window: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """img*: (H, W, C) in [0,1]. Returns mean SSIM (matches torch impl with
    same-padding and per-channel windows)."""
    g = _gaussian_kernel(window, sigma)

    def blur(x):
        # SEPARABLE depthwise blur: the 2D window is outer(g, g), so two
        # 1-D passes are mathematically identical to the 11x11 conv at
        # 2*W instead of W^2 taps — depthwise convs run on the TPU VPU,
        # where the 5.5x tap reduction is real time (the mapping loss
        # calls this every optimizer iteration, fwd AND bwd)
        C = x.shape[-1]
        kh = jnp.tile(g[:, None, None, None], (1, 1, 1, C))   # (W,1,1,C)
        kw = jnp.tile(g[None, :, None, None], (1, 1, 1, C))   # (1,W,1,C)
        y = jax.lax.conv_general_dilated(
            x[None], kh, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return jax.lax.conv_general_dilated(
            y, kw, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)[0]

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()
