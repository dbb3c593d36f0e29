"""Rasterizer unit tests: analytic scenes, occlusion, median depth, grads."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.ops.gs_raster import RasterizeConfig, rasterize

H, W = 32, 32
K4 = jnp.asarray([40.0, 40.0, W / 2, H / 2])
CFG = RasterizeConfig(height=H, width=W, max_dup=16, max_per_tile=64,
                      chunk=32, kernel_size=0.1)


def _one_gaussian(z=2.0, scale=0.1, opacity=0.9, color=(1.0, 0.0, 0.0),
                  xy=(0.0, 0.0)):
    means = jnp.asarray([[xy[0], xy[1], z]])
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), scale)
    return (means, quats, scales, jnp.asarray([opacity]),
            jnp.asarray([color], jnp.float32))


def test_single_gaussian_center():
    out = rasterize(*_one_gaussian(), K4, CFG)
    c = np.asarray(out["color"])
    a = np.asarray(out["alpha"])
    # center pixel should be strongly red, alpha ~ opacity (soft via conic)
    assert c[H // 2, W // 2, 0] > 0.5
    assert c[H // 2, W // 2, 1] < 1e-3
    assert a[H // 2, W // 2] > 0.5
    # far corner untouched
    assert a[0, 0] < 1e-3
    # depth at center ~ z (ray through center: ln ~ 1)
    d = np.asarray(out["depth"])
    assert abs(d[H // 2, W // 2] - 2.0) < 0.05
    md = np.asarray(out["mdepth"])
    assert abs(md[H // 2, W // 2] - 2.0) < 0.05


def test_occlusion_order():
    means = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 3.0]])
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.15)
    opac = jnp.asarray([0.95, 0.95])
    colors = jnp.asarray([[0, 1.0, 0], [1.0, 0, 0]])
    out = rasterize(means, quats, scales, opac, colors, K4, CFG)
    c = np.asarray(out["color"])[H // 2, W // 2]
    # near green dominates far red
    assert c[1] > 0.7 and c[0] < 0.2
    md = np.asarray(out["mdepth"])[H // 2, W // 2]
    assert abs(md - 1.0) < 0.05


def test_background_composited():
    bg = jnp.asarray([0.0, 0.0, 1.0])
    out = rasterize(*_one_gaussian(opacity=0.3), K4, CFG, bg=bg)
    c = np.asarray(out["color"])
    # empty pixel = bg
    np.testing.assert_allclose(c[0, 0], [0, 0, 1], atol=1e-4)


def test_flat_gaussian_normal():
    # disc with tiny z-scale facing camera -> normal ~ (0, 0, -1)
    means = jnp.asarray([[0.0, 0, 2.0]])
    quats = jnp.asarray([[1.0, 0, 0, 0]])
    scales = jnp.asarray([[0.3, 0.3, 1e-4]])
    out = rasterize(means, quats, scales, jnp.asarray([0.9]),
                    jnp.asarray([[1.0, 1, 1]]), K4, CFG)
    n = np.asarray(out["normal"])[H // 2, W // 2]
    assert abs(abs(n[2]) - 1.0) < 0.05


def test_tilted_disc_depth_gradient():
    """RaDe-GS ray-plane: a tilted disc's rendered depth varies across x."""
    # rotate disc 30 deg about y: quat wxyz = (cos15, 0, sin15, 0)
    th = np.deg2rad(30) / 2
    quats = jnp.asarray([[np.cos(th), 0.0, np.sin(th), 0.0]])
    means = jnp.asarray([[0.0, 0, 2.0]])
    scales = jnp.asarray([[0.5, 0.5, 1e-4]])
    out = rasterize(means, quats, scales, jnp.asarray([0.99]),
                    jnp.asarray([[1.0, 1, 1]]), K4, CFG)
    md = np.asarray(out["mdepth"])
    a = np.asarray(out["alpha"])
    row = H // 2
    xs = [W // 2 - 4, W // 2, W // 2 + 4]
    assert all(a[row, x] > 0.3 for x in xs)
    d = [md[row, x] for x in xs]
    # disc x-axis maps to (cos30, 0, -sin30): plane z = 2 - tan(30°)·X,
    # so depth strictly DECREASES with x
    assert d[0] > d[1] > d[2]
    # check against the true plane: X = (x - cx) * z / fx
    tan30 = np.tan(np.deg2rad(30))
    for x in xs:
        Xw = (x - W / 2) / 40.0
        z_true = 2.0 / (1 + tan30 * Xw)  # z = 2 - tan30 * X(z)
        # mdepth is distance/ln ~ z for this geometry
        assert abs(md[row, x] - z_true) < 0.1, (x, md[row, x], z_true)


def test_gradients_flow():
    means, quats, scales, opac, colors = _one_gaussian(opacity=0.6)
    target = jnp.zeros((H, W, 3))

    def loss(means, scales, opac, colors):
        out = rasterize(means, quats, scales, opac, colors, K4, CFG)
        return jnp.sum((out["color"] - target) ** 2) + jnp.sum(out["depth"])

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, opac, colors)
    for gi in g:
        arr = np.asarray(gi)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).max() > 0


def test_viewspace_probe_gradient():
    means, quats, scales, opac, colors = _one_gaussian(opacity=0.6, xy=(0.1, 0.1))
    probe = jnp.zeros((1, 2))

    def loss(probe):
        out = rasterize(means, quats, scales, opac, colors, K4, CFG,
                        means2d_probe=probe)
        return jnp.sum(out["color"][:, :, 0])

    g = np.asarray(jax.grad(loss)(probe))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_alpha_is_weight_sum():
    """out_alpha = sum(alpha*T), not 1 - T (forward.cu:637)."""
    out = rasterize(*_one_gaussian(opacity=0.5), K4, CFG)
    a = np.asarray(out["alpha"])[H // 2, W // 2]
    # single gaussian: weight = alpha = ~0.5 * coef at center
    assert 0.2 < a < 0.55


def test_fused_bin_key_matches_two_key_sort():
    """The packed uint32 (tile | quantized-depth) binning key must give
    the same per-tile entry lists (hence identical renders) as the exact
    2-key (tile, f32 depth) sort whenever depths are separated by more
    than the quantization step (~1e-4 relative)."""
    import dataclasses
    rng = np.random.default_rng(7)
    N = 64
    means = jnp.asarray(np.concatenate(
        [rng.uniform(-0.5, 0.5, (N, 2)),
         rng.uniform(1.0, 6.0, (N, 1))], axis=1), jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
    scales = jnp.full((N, 3), 0.05)
    opac = jnp.full((N,), 0.7)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

    cfg_fused = dataclasses.replace(CFG, fused_bin_key=True)
    cfg_exact = dataclasses.replace(CFG, fused_bin_key=False)
    out_f = rasterize(means, quats, scales, opac, colors, K4, cfg_fused)
    out_e = rasterize(means, quats, scales, opac, colors, K4, cfg_exact)
    for k in ("color", "depth", "alpha", "mdepth"):
        np.testing.assert_allclose(np.asarray(out_f[k]),
                                   np.asarray(out_e[k]), atol=1e-6,
                                   err_msg=f"output {k} diverged")
