"""Pallas rasterizer forward vs the XLA reference (interpret mode, CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.ops.gs_raster import RasterizeConfig, rasterize
from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas_forward

H, W = 32, 32
K4 = jnp.asarray([40.0, 40.0, W / 2, H / 2])
CFG = RasterizeConfig(height=H, width=W, max_dup=16, max_per_tile=64,
                      chunk=32, kernel_size=0.1)
RNG = np.random.default_rng(3)


def _scene(n=50):
    means = jnp.asarray(np.stack([
        RNG.uniform(-0.4, 0.4, n), RNG.uniform(-0.4, 0.4, n),
        RNG.uniform(1.0, 3.0, n)], -1), jnp.float32)
    q = RNG.normal(size=(n, 4))
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    quats = jnp.asarray(q, jnp.float32)
    scales = jnp.asarray(RNG.uniform(0.02, 0.1, (n, 3)), jnp.float32)
    opac = jnp.asarray(RNG.uniform(0.2, 0.9, n), jnp.float32)
    colors = jnp.asarray(RNG.uniform(0, 1, (n, 3)), jnp.float32)
    return means, quats, scales, opac, colors


def test_pallas_matches_xla_forward():
    means, quats, scales, opac, colors = _scene()
    ref = rasterize(means, quats, scales, opac, colors, K4, CFG)
    out = rasterize_pallas_forward(means, quats, scales, opac, colors,
                                   K4, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out["color"]),
                               np.asarray(ref["color"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["mdepth"]),
                               np.asarray(ref["mdepth"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["normal"]),
                               np.asarray(ref["normal"]), atol=1e-3)


def test_pallas_background():
    means, quats, scales, opac, colors = _scene(5)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    out = rasterize_pallas_forward(means, quats, scales, opac, colors,
                                   K4, CFG, bg=bg, interpret=True)
    c = np.asarray(out["color"])
    a = np.asarray(out["alpha"])
    empty = a < 1e-6
    assert empty.any()
    # near-empty pixels keep a T*(bg) residual scaled by (1 - alpha)
    np.testing.assert_allclose(c[empty],
                               np.tile([0.1, 0.2, 0.3], (empty.sum(), 1)),
                               atol=1e-3)
