"""Gaussian-to-point integration (`ops/gs_integrate.py`) vs a brute-force
numpy port of the reference integrateCUDA control flow
(`/root/reference/thirdparty/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:996-1374`) on a tiny scene, plus behavioral sanity checks.

The oracle consumes the implementation's OWN per-Gaussian preprocess
quantities (mean2d/conic/opacity/ray_plane/radius — those have their own
parity tests vs the CUDA formulas in test_gs_raster.py) and re-implements
only the per-point integration loop in plain numpy, so this file tests
the new logic: contribution bookkeeping with the 1e-4 transmittance
clamp, the 3D ray-space alpha, the median-plane SDF, and tile culling.
"""
import numpy as np
import jax.numpy as jnp

from cut3r_slam_tpu.ops.gs_raster import RasterizeConfig, _preprocess
from cut3r_slam_tpu.ops.gs_integrate import (_inv_ray_cov, integrate_points,
                                             mark_visible)

H, W = 32, 48
K4 = np.array([40.0, 40.0, W / 2, H / 2], np.float32)
CFG = RasterizeConfig(height=H, width=W, max_dup=16, max_per_tile=64)


def make_scene(seed=0, n=24):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-0.9, 0.9, n), rng.uniform(-0.55, 0.55, n),
        rng.uniform(1.5, 4.0, n)], axis=-1).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    scales = rng.uniform(0.08, 0.3, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.4, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return means, q, scales, opac, colors


def impl_preprocess(means, quats, scales, opac):
    """The implementation's per-Gaussian quantities, as numpy."""
    fx, fy = K4[0], K4[1]
    pre = _preprocess(jnp.asarray(means), jnp.asarray(quats),
                      jnp.asarray(scales), jnp.asarray(opac),
                      jnp.asarray(K4), CFG)
    icr = _inv_ray_cov(
        jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(means[:, 0] / means[:, 2]),
        jnp.asarray(means[:, 1] / means[:, 2]),
        pre["t_center"], jnp.asarray(means[:, 2]), fx, fy)
    out = {k: np.asarray(v) for k, v in pre.items()}
    out["icr"] = np.asarray(icr)
    out["cond"] = np.min(scales ** 2, axis=-1) > 1e-8
    return out


def brute_force(points, pre, colors, bg):
    """Numpy port of the integrateCUDA per-point loop over the
    implementation's preprocess arrays (exact depth order, tile rect
    culling as in _bin_gaussians)."""
    n = pre["mean2d"].shape[0]
    order = [i for i in np.argsort(pre["depth_z"], kind="stable")
             if pre["valid"][i] and pre["radius"][i] > 0]
    offs = [(0.0, 0.0), (-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5), (0.5, 0.5)]
    fx, fy, cx, cy = K4

    out_a, out_c, out_s = [], [], []
    for p in points:
        px = fx * p[0] / p[2] + cx
        py = fy * p[1] / p[2] + cy
        pd = np.linalg.norm(p)
        vis = p[2] > 0.2 and 0 <= px < W and 0 <= py < H
        if not vis:
            out_a.append(0.0)
            out_c.append(np.zeros(3))
            out_s.append(0.0)
            continue
        fxp, fyp = int(px) + 0.5, int(py) + 0.5
        tx_pt, ty_pt = int(px) // 16, int(py) // 16
        T = 1.0
        corner_T = [1.0] * 5
        C = np.zeros(3)
        contrib, mid = [], None
        for i in order:
            xy, r = pre["mean2d"][i], pre["radius"][i]
            # tile culling: the kernel only sees gaussians binned to the
            # point's tile (3-sigma rect, duplicateWithKeys semantics)
            if not (int((xy[0] - r) // 16) <= tx_pt
                    <= int((xy[0] + r) // 16)
                    and int((xy[1] - r) // 16) <= ty_pt
                    <= int((xy[1] + r) // 16)):
                continue
            con, op = pre["conic"][i], pre["opacity"][i]
            used = False
            for k, (ox, oy) in enumerate(offs):
                d = xy - np.array([fxp + ox, fyp + oy])
                power = (-0.5 * (con[0] * d[0] ** 2 + con[2] * d[1] ** 2)
                         - con[1] * d[0] * d[1])
                if power > 0:
                    continue
                alpha = min(0.99, op * np.exp(power))
                if alpha < 1 / 255:
                    continue
                test_T = corner_T[k] * (1 - alpha)
                if test_T < 1e-4:
                    continue          # skip WITHOUT updating corner_T
                if k == 0:
                    C += colors[i] * alpha * T
                    if T > 0.5:
                        mid = i
                    T = test_T
                corner_T[k] = test_T
                used = True
            if used:
                contrib.append(i)
        # second pass: 3D alpha at the point over the contributors
        Tp, ai = 1.0, 0.0
        for i in contrib:
            d = pre["mean2d"][i] - np.array([px, py])
            gd = pre["t_center"][i] + pre["ray_plane"][i] @ d
            if pre["cond"][i]:
                dz = pre["t_center"][i] - min(pd, gd)
            else:
                if pd < gd:
                    continue
                dz = pre["t_center"][i]
            d3 = np.array([d[0], d[1], dz])
            alpha = min(0.99, pre["opacity"][i]
                        * np.exp(-0.5 * d3 @ pre["icr"][i] @ d3))
            if alpha < 1 / 255:
                continue
            ai += alpha * Tp
            Tp *= 1 - alpha
        sdf = 0.0
        if mid is not None:
            d = pre["mean2d"][mid] - np.array([px, py])
            sdf = (pre["t_center"][mid] + pre["ray_plane"][mid] @ d) - pd
        out_a.append(ai)
        out_c.append(C + T * bg)
        out_s.append(sdf)
    return np.array(out_a), np.array(out_c), np.array(out_s)


def test_integrate_matches_bruteforce():
    means, quats, scales, opac, colors = make_scene()
    rng = np.random.default_rng(7)
    pts = np.stack([rng.uniform(-0.8, 0.8, 40), rng.uniform(-0.5, 0.5, 40),
                    rng.uniform(1.2, 4.5, 40)], axis=-1).astype(np.float32)
    # include points at gaussian centers and an out-of-frustum point
    pts = np.concatenate([pts, means[:4], [[0, 0, -1.0]]]).astype(np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)

    out = integrate_points(jnp.asarray(pts), jnp.asarray(means),
                           jnp.asarray(quats), jnp.asarray(scales),
                           jnp.asarray(opac), jnp.asarray(colors),
                           jnp.asarray(K4), CFG, bg=jnp.asarray(bg),
                           point_chunk=16)
    pre = impl_preprocess(means, quats, scales, opac)
    ref_a, ref_c, ref_s = brute_force(pts, pre, colors, bg)
    a = np.asarray(out["alpha_integrated"])
    c = np.asarray(out["color_integrated"])
    s = np.asarray(out["point_sdf"])
    assert np.max(np.abs(a - ref_a)) < 2e-3
    assert np.max(np.abs(c - ref_c)) < 2e-3
    assert np.max(np.abs(s - ref_s)) < 2e-3
    # projected coordinates
    fx, fy, cx, cy = K4
    exp_x = fx * pts[:, 0] / pts[:, 2] + cx
    vis = np.asarray(out["visible"])
    assert vis.sum() > 20
    assert np.allclose(np.asarray(out["point_coordinate"])[vis, 0],
                       exp_x[vis], atol=1e-3)


def test_integrate_behavior():
    means, quats, scales, opac, colors = make_scene(seed=3, n=10)
    # an opaque wall of gaussians at z=2 in front of query points at z=3
    means[:, 2] = 2.0
    opac[:] = 0.95
    behind = np.array([[0.0, 0.0, 3.0]], np.float32)
    front = np.array([[0.0, 0.0, 0.5]], np.float32)
    out = integrate_points(
        jnp.asarray(np.concatenate([behind, front])), jnp.asarray(means),
        jnp.asarray(quats), jnp.asarray(scales), jnp.asarray(opac),
        jnp.asarray(colors), jnp.asarray(K4), CFG, point_chunk=2)
    a = np.asarray(out["alpha_integrated"])
    s = np.asarray(out["point_sdf"])
    # behind the wall: high accumulated alpha, negative sdf
    assert a[0] > 0.5
    assert s[0] < 0
    # in front of the wall: (near-)transparent, positive sdf
    assert a[1] < a[0] * 0.5
    assert s[1] > 0


def test_mark_visible():
    pts = jnp.asarray(np.array(
        [[0, 0, 1.0], [0, 0, 0.1], [0, 0, -2.0], [5, 5, 3.0]], np.float32))
    v = np.asarray(mark_visible(pts))
    assert v.tolist() == [True, False, False, True]
