"""Parity tests for the shared math leftovers (TV loss, Sobel, blur,
robust Sim3) against literal torch/numpy oracles implementing the
reference semantics (/root/reference/hislam2/util/utils.py:232-268,
913-1068)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.ops.imageproc import (total_variance, tv_loss,
                                          sobel_edges, gaussian_blur)
from cut3r_slam_tpu.geometry.sim3_align import (
    weighted_estimate_sim3, robust_weighted_estimate_sim3,
    weighted_align_point_maps, huber_loss)


def _np_weighted_sim3(src, tgt, weights):
    """Literal numpy port of the reference weighted_estimate_sim3."""
    w = weights / weights.sum()
    mu_s = (w[:, None] * src).sum(0)
    mu_t = (w[:, None] * tgt).sum(0)
    sc, tc = src - mu_s, tgt - mu_t
    ss = np.sqrt((w * (sc ** 2).sum(1)).sum())
    st = np.sqrt((w * (tc ** 2).sum(1)).sum())
    s = st / ss
    H = ((s * sc) * np.sqrt(w)[:, None]).T @ (tc * np.sqrt(w)[:, None])
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[2, :] *= -1
        R = Vt.T @ U.T
    t = mu_t - s * R @ mu_s
    return s, R, t


def _rand_sim3(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
    s = float(rng.uniform(0.5, 2.0))
    t = rng.normal(size=3)
    return s, R, t


def test_tv_loss_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 3.0, (2, 12, 16)).astype(np.float32)
    image = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
    normal = rng.normal(size=(2, 12, 16, 3)).astype(np.float32)
    conf = rng.uniform(0, 1, (2, 12, 16)).astype(np.float32)

    # literal torch oracle (utils.py:240-268)
    d = torch.tensor(depth)
    gx = d[:, :, :-1] - d[:, :, 1:]
    gy = d[:, :-1, :] - d[:, 1:, :]
    gx = torch.cat((gx, gx[:, :, -1:]), dim=2)
    gy = torch.cat((gy, gy[:, -1:, :]), dim=1)
    img = torch.tensor(image)
    gray = 0.2989 * img[..., 0] + 0.5870 * img[..., 1] + 0.1140 * img[..., 2]
    igx = gray[:, :, :-1] - gray[:, :, 1:]
    igy = gray[:, :-1, :] - gray[:, 1:, :]
    igx = torch.cat((igx, igx[:, :, -1:]), dim=2)
    igy = torch.cat((igy, igy[:, -1:, :]), dim=1)
    wts = torch.exp(-torch.sqrt(igx ** 2 + igy ** 2) * 5)
    cm = torch.tensor(conf)
    loss_t = (torch.abs(gx) * wts * cm).mean() + (torch.abs(gy) * wts * cm).mean()
    n = torch.tensor(normal)
    ngx = n[:, :, :-1] - n[:, :, 1:]
    ngy = n[:, :-1, :] - n[:, 1:, :]
    ngx = torch.cat((ngx, ngx[:, :, -1:]), dim=2)
    ngy = torch.cat((ngy, ngy[:, -1:, :]), dim=1)
    loss_t = loss_t + 0.05 * (
        (torch.abs(ngx).mean(-1) * wts * cm).mean()
        + (torch.abs(ngy).mean(-1) * wts * cm).mean())

    loss_j, wts_j = tv_loss(jnp.asarray(depth), normal=jnp.asarray(normal),
                            image=jnp.asarray(image),
                            conf_masks=jnp.asarray(conf))
    np.testing.assert_allclose(np.asarray(wts_j), wts.numpy(), atol=1e-6)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-6)


def test_total_variance_channel_last_image():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(9, 11, 3)).astype(np.float32)
    gx, gy = total_variance(jnp.asarray(img))
    assert gx.shape == img.shape and gy.shape == img.shape
    np.testing.assert_allclose(np.asarray(gx)[:, 0],
                               img[:, 0] - img[:, 1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy)[0],
                               img[0] - img[1], atol=1e-7)


def test_sobel_edges_matches_torch_conv():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (10, 14, 3)).astype(np.float32)
    x = torch.tensor(img).permute(2, 0, 1).unsqueeze(0)
    kx = torch.tensor([[1., 0, -1], [2, 0, -2], [1, 0, -1]]).view(1, 1, 3, 3)
    ky = torch.tensor([[1., 2, 1], [0, 0, 0], [-1, -2, -1]]).view(1, 1, 3, 3)
    gx = F.conv2d(x, kx.expand(3, -1, -1, -1), padding=1, groups=3)
    gy = F.conv2d(x, ky.expand(3, -1, -1, -1), padding=1, groups=3)
    ref = torch.sqrt(gx ** 2 + gy ** 2 + 1e-6).squeeze(0).permute(1, 2, 0)
    out = sobel_edges(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_gaussian_blur_matches_torch_conv():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (12, 9, 3)).astype(np.float32)
    k, sigma = 5, 1.0
    coords = torch.arange(k, dtype=torch.float32) - k // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    kernel = (g[:, None] * g[None, :]).expand(3, 1, -1, -1)
    x = torch.tensor(img).permute(2, 0, 1).unsqueeze(0)
    ref = F.conv2d(x, kernel, padding=k // 2,
                   groups=3).squeeze(0).permute(1, 2, 0)
    out = gaussian_blur(jnp.asarray(img), kernel_size=k, sigma=sigma)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_weighted_sim3_recovers_known_transform():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(200, 3)).astype(np.float32)
    s, R, t = _rand_sim3(rng)
    tgt = (s * src @ R.T + t).astype(np.float32)
    w = rng.uniform(0.2, 1.0, 200).astype(np.float32)
    sj, Rj, tj = weighted_estimate_sim3(jnp.asarray(src), jnp.asarray(tgt),
                                        jnp.asarray(w))
    assert abs(float(sj) - s) < 1e-4
    np.testing.assert_allclose(np.asarray(Rj), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tj), t, atol=1e-4)
    # numpy-oracle parity on a non-exact problem
    tgt_n = tgt + rng.normal(scale=0.01, size=tgt.shape).astype(np.float32)
    so, Ro, to = _np_weighted_sim3(src.astype(np.float64),
                                   tgt_n.astype(np.float64),
                                   w.astype(np.float64))
    sj, Rj, tj = weighted_estimate_sim3(jnp.asarray(src),
                                        jnp.asarray(tgt_n), jnp.asarray(w))
    assert abs(float(sj) - so) < 1e-4
    np.testing.assert_allclose(np.asarray(Rj), Ro, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tj), to, atol=1e-3)


def test_robust_sim3_rejects_outliers():
    rng = np.random.default_rng(5)
    src = rng.normal(size=(300, 3)).astype(np.float32)
    s, R, t = _rand_sim3(rng)
    tgt = (s * src @ R.T + t).astype(np.float32)
    # corrupt 15% of correspondences badly
    n_bad = 45
    tgt[:n_bad] += rng.normal(scale=3.0, size=(n_bad, 3)).astype(np.float32)
    w = np.ones(300, np.float32)
    # plain weighted fit is dragged off by the outliers ...
    s0, R0, t0 = weighted_estimate_sim3(jnp.asarray(src), jnp.asarray(tgt),
                                        jnp.asarray(w))
    # ... the Huber IRLS recovers the inlier transform
    s1, R1, t1 = robust_weighted_estimate_sim3(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w), delta=0.1,
        max_iters=20)
    err0 = abs(float(s0) - s) + np.abs(np.asarray(R0) - R).max()
    err1 = abs(float(s1) - s) + np.abs(np.asarray(R1) - R).max()
    assert err1 < 0.02
    assert err1 < err0 / 3


def test_huber_loss_piecewise():
    r = jnp.asarray([-0.5, -0.05, 0.0, 0.05, 0.5])
    out = np.asarray(huber_loss(r, 0.1))
    np.testing.assert_allclose(
        out, [0.1 * (0.5 - 0.05), 0.5 * 0.05 ** 2, 0.0, 0.5 * 0.05 ** 2,
              0.1 * (0.5 - 0.05)], atol=1e-7)


def test_weighted_align_point_maps_masks_low_conf():
    rng = np.random.default_rng(6)
    pm2 = rng.normal(size=(1, 8, 10, 3)).astype(np.float32)
    s, R, t = _rand_sim3(rng)
    pm1 = (s * pm2.reshape(-1, 3) @ R.T + t).reshape(pm2.shape)
    # garbage where confidence is below threshold
    conf = rng.uniform(0, 2, (1, 8, 10)).astype(np.float32)
    bad = conf < 1.0
    pm1 = np.where(bad[..., None], 99.0, pm1).astype(np.float32)
    sj, Rj, tj = weighted_align_point_maps(pm1, conf, pm2, conf, 1.0)
    assert abs(float(sj) - s) < 1e-3
    np.testing.assert_allclose(np.asarray(Rj), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tj), t, atol=1e-3)


def test_loss_ssim_matches_torch_2d_window():
    """ops/ssim.ssim (separable depthwise blur) vs the reference's
    2-D-window conv SSIM (hislam2 loss_utils.py:25-167 semantics,
    torch groups=C conv with zero 'SAME' padding). The separable form is
    mathematically identical (outer(g, g) + linearity), so the
    tolerance is float noise."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from cut3r_slam_tpu.ops.ssim import ssim, _gaussian_kernel

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (24, 31, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)

    g = np.asarray(_gaussian_kernel(11, 1.5))
    k2d = np.outer(g, g).astype(np.float32)
    w = torch.tensor(np.tile(k2d[None, None], (3, 1, 1, 1)))

    def blur_t(x):
        xt = torch.tensor(x.transpose(2, 0, 1)[None])
        return F.conv2d(xt, w, padding=5, groups=3)[0].numpy() \
            .transpose(1, 2, 0)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = blur_t(a), blur_t(b)
    s1 = blur_t(a * a) - mu1 * mu1
    s2 = blur_t(b * b) - mu2 * mu2
    s12 = blur_t(a * b) - mu1 * mu2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
           / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))).mean()

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - float(ref)) < 1e-5, (got, float(ref))
