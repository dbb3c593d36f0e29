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


def test_pallas_mdepth_tie_breaking():
    """Exact transmittance ties (alpha = sigmoid(0) = 0.5 stacks) must
    select the SAME median contributor in both backends: the XLA cumprod
    yields Tb == 0.5 exactly while the log-space scan yields 0.5 +- 1e-8,
    so an unbiased `> 0.5` test flips between them (VERDICT r3 #7).
    MEDIAN_T_THRESH's 1e-4 bias makes both exclude the tied entry."""
    n = 12
    # identical stacked Gaussians at staggered depths covering the frame
    means = jnp.asarray(np.stack([
        np.zeros(n), np.zeros(n), np.linspace(1.0, 2.0, n)], -1),
        jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1))
    scales = jnp.full((n, 3), 0.8, jnp.float32)
    opac = jnp.full((n,), 0.5, jnp.float32)  # exact-0.5 alpha ties
    colors = jnp.asarray(RNG.uniform(0, 1, (n, 3)), jnp.float32)
    ref = rasterize(means, quats, scales, opac, colors, K4, CFG)
    out = rasterize_pallas_forward(means, quats, scales, opac, colors,
                                   K4, CFG, interpret=True)
    md_r = np.asarray(ref["mdepth"])
    md_p = np.asarray(out["mdepth"])
    assert (md_r > 0).any()  # the scene actually exercises the selector
    np.testing.assert_allclose(md_p, md_r, atol=1e-3)


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


def _loss_fn(raster_fn, **kw):
    def f(means, quats, scales, opac, colors):
        out = raster_fn(means, quats, scales, opac, colors, K4, CFG, **kw)
        # touch every differentiable output the mapping losses use
        return (out["color"].sum() + 0.5 * out["alpha"].sum()
                + 0.3 * out["depth"].sum() + 0.2 * out["mdepth"].sum()
                + 0.1 * out["normal"].sum())
    return f


def test_pallas_backward_matches_xla_ad():
    """Custom-VJP Pallas backward vs JAX AD of the XLA rasterizer
    (backward.cu:145-632 semantics)."""
    import jax
    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
    means, quats, scales, opac, colors = _scene(40)
    g_ref = jax.grad(_loss_fn(rasterize), argnums=(0, 1, 2, 3, 4))(
        means, quats, scales, opac, colors)
    g_pal = jax.grad(_loss_fn(rasterize_pallas, interpret=True),
                     argnums=(0, 1, 2, 3, 4))(
        means, quats, scales, opac, colors)
    names = ["means", "quats", "scales", "opac", "colors"]
    for n, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=n)


def test_pallas_probe_grad_matches_xla():
    """The viewspace densification probe cotangent must match."""
    import jax
    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
    means, quats, scales, opac, colors = _scene(30)
    probe = jnp.zeros((means.shape[0], 2))

    def f(fn, **kw):
        def g(p):
            out = fn(means, quats, scales, opac, colors, K4, CFG,
                     means2d_probe=p, **kw)
            return out["color"].sum() + out["depth"].sum()
        return g

    g_ref = jax.grad(f(rasterize))(probe)
    g_pal = jax.grad(f(rasterize_pallas, interpret=True))(probe)
    a, b = np.asarray(g_ref), np.asarray(g_pal)
    scale = np.abs(a).max() + 1e-6
    np.testing.assert_allclose(b / scale, a / scale, atol=5e-4)


def test_multi_view_fused_parity():
    """rasterize_pallas_multi (ONE blend over V*n_tiles tiles) must match
    per-view rasterize_pallas on every output AND on the gradients of a
    window-style loss — the fused path is what the mapping optimizer
    runs per iteration (slam/mapping.py window_loss_fused)."""
    import jax
    from cut3r_slam_tpu.ops.gs_raster_pallas import (rasterize_pallas,
                                                     rasterize_pallas_multi)
    means, quats, scales, opac, colors = _scene(60)
    V = 3
    # three nearby camera poses as per-view CAMERA-frame transforms
    w2cs = []
    for i in range(V):
        th = 0.05 * i
        R = np.asarray([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.asarray([0.02 * i, -0.01 * i, 0.03 * i], np.float32)
        w2cs.append((R, t))

    def to_cam(m, q, R, t):
        mc = m @ R.T + t
        # rotate quats by R (wxyz)
        from cut3r_slam_tpu.geometry.quaternion import (matrix_to_quat,
                                                        xyzw_to_wxyz)
        from cut3r_slam_tpu.slam.renderer import _quat_mult_wxyz
        qr = xyzw_to_wxyz(matrix_to_quat(jnp.asarray(R)))
        return mc, _quat_mult_wxyz(qr[None], q)

    mc_list, qc_list = zip(*[to_cam(means, quats, jnp.asarray(R),
                                    jnp.asarray(t)) for R, t in w2cs])
    mc = jnp.stack(mc_list)
    qc = jnp.stack(qc_list)

    multi = rasterize_pallas_multi(mc, qc, scales, opac, colors, K4, CFG,
                                   interpret=True)
    for v in range(V):
        single = rasterize_pallas(mc[v], qc[v], scales, opac, colors, K4,
                                  CFG, interpret=True)
        for k in ("color", "alpha", "depth", "mdepth", "normal"):
            np.testing.assert_allclose(np.asarray(multi[k][v]),
                                       np.asarray(single[k]), atol=1e-4,
                                       err_msg=f"{k} view {v}")
        np.testing.assert_array_equal(np.asarray(multi["visibility"][v]),
                                      np.asarray(single["visibility"]))

    # gradients of a weighted multi-view loss wrt the SHARED attributes
    wts = jnp.asarray([1.0, 0.7, 0.3])

    def loss_multi(m, s, o, c):
        out = rasterize_pallas_multi(m, qc, s, o, c, K4, CFG,
                                     interpret=True)
        per = out["color"].mean((1, 2, 3)) + out["depth"].mean((1, 2))
        return (per * wts).sum()

    def loss_seq(m, s, o, c):
        tot = 0.0
        for v in range(V):
            out = rasterize_pallas(m[v], qc[v], s, o, c, K4, CFG,
                                   interpret=True)
            tot = tot + wts[v] * (out["color"].mean() + out["depth"].mean())
        return tot

    g_m = jax.grad(loss_multi, argnums=(0, 1, 2, 3))(mc, scales, opac,
                                                     colors)
    g_s = jax.grad(loss_seq, argnums=(0, 1, 2, 3))(mc, scales, opac,
                                                   colors)
    for n, a, b in zip(["means", "scales", "opac", "colors"], g_s, g_m):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=n)


# ---------------------------------------------------------------------------
# compiled-mode parity (VERDICT r2 #2) — runs ONLY when a TPU is present;
# conftest pins tests to CPU, so this spawns nothing on CPU-only hosts.
# ---------------------------------------------------------------------------

def _tpu_available():
    import jax
    try:
        return any(d.platform == "tpu" for d in jax.devices("tpu"))
    except RuntimeError:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="no TPU in this host")
def test_pallas_compiled_on_tpu_matches_xla():
    """Mosaic-compiled kernels vs XLA on the chip: dense scene at a
    bench-like load. Verified interactively on a v5 chip (fwd 19 ms /
    bwd 32 ms Pallas vs 22 / 44 ms XLA at 2^14 Gaussians, 256x256);
    tolerances account for the TPU's transcendental approximations.
    mdepth is included since MEDIAN_T_THRESH's tie bias (VERDICT r3 #7):
    the selector (last entry with Tb above threshold) now agrees between
    the XLA cumprod and the Pallas log-space scan even on exact-0.5
    transmittance ties."""
    import jax
    dev = jax.devices("tpu")[0]
    n = 4096
    Ht = Wt = 128
    K4t = jnp.asarray([0.9 * Wt, 0.9 * Wt, Wt / 2, Ht / 2])
    cfg = RasterizeConfig(height=Ht, width=Wt, max_per_tile=256)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    means = means.at[:, 2].add(4.0)
    quats = jnp.tile(jnp.asarray([1., 0, 0, 0], jnp.float32), (n, 1))
    scales = jnp.full((n, 3), 0.02, jnp.float32)
    opac = jnp.full((n,), 0.8, jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    args = jax.device_put((means, quats, scales, opac, cols, K4t), dev)

    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
    out_p = rasterize_pallas(*args, cfg, interpret=False)
    out_x = rasterize(*args, cfg)
    for k, tol in (("color", 1e-2), ("alpha", 1e-2), ("depth", 2e-2),
                   ("mdepth", 1e-3), ("normal", 1e-2)):
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_x[k]), atol=tol)

    def loss(fn, interp):
        def f(m):
            kw = {"interpret": interp} if fn is rasterize_pallas else {}
            o = fn(m, *args[1:], cfg, **kw)
            return (o["color"].mean() + o["depth"].mean()
                    + o["alpha"].mean() + o["normal"].mean())
        return f

    gp = np.asarray(jax.jit(jax.grad(loss(rasterize_pallas, False)))(means))
    gx = np.asarray(jax.jit(jax.grad(loss(rasterize, None)))(means))
    rel = np.abs(gp - gx).max() / (np.abs(gx).max() + 1e-12)
    assert rel < 5e-3, rel


@pytest.mark.skipif(not _tpu_available(), reason="no TPU in this host")
def test_pallas_multi_compiled_on_tpu_matches_single():
    """Mosaic-COMPILED multi-view fused blend vs per-view compiled
    renders (ADVICE r4 #3): the fused path is the production TPU window
    optimizer (MappingConfig.fused_window_render), and its compiled grid
    (V*n_tiles tiles, different TB selection) is otherwise only covered
    in interpret mode. Values AND gradients of a window-style loss."""
    import jax
    dev = jax.devices("tpu")[0]
    n = 4096
    Ht = Wt = 128
    K4t = jnp.asarray([0.9 * Wt, 0.9 * Wt, Wt / 2, Ht / 2])
    cfg = RasterizeConfig(height=Ht, width=Wt, max_per_tile=256)
    rng = np.random.default_rng(1)
    means = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    means = means.at[:, 2].add(4.0)
    quats = jnp.tile(jnp.asarray([1., 0, 0, 0], jnp.float32), (n, 1))
    scales = jnp.full((n, 3), 0.02, jnp.float32)
    opac = jnp.full((n,), 0.8, jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    V = 3
    offs = jnp.asarray(np.stack([rng.uniform(-0.05, 0.05, 3)
                                 for _ in range(V)]), jnp.float32)
    mc = means[None] + offs[:, None, :]
    qc = jnp.tile(quats[None], (V, 1, 1))
    mc, qc, scales, opac, cols, K4t = jax.device_put(
        (mc, qc, scales, opac, cols, K4t), dev)

    from cut3r_slam_tpu.ops.gs_raster_pallas import (rasterize_pallas,
                                                     rasterize_pallas_multi)
    multi = rasterize_pallas_multi(mc, qc, scales, opac, cols, K4t, cfg)
    for v in range(V):
        single = rasterize_pallas(mc[v], qc[v], scales, opac, cols, K4t,
                                  cfg)
        for k, tol in (("color", 1e-3), ("alpha", 1e-3), ("depth", 2e-3),
                       ("normal", 1e-3)):
            np.testing.assert_allclose(np.asarray(multi[k][v]),
                                       np.asarray(single[k]), atol=tol,
                                       err_msg=f"{k} view {v}")

    wts = jnp.asarray([1.0, 0.7, 0.3])

    def loss_multi(m, c):
        out = rasterize_pallas_multi(m, qc, scales, opac, c, K4t, cfg)
        per = out["color"].mean((1, 2, 3)) + out["depth"].mean((1, 2))
        return (per * wts).sum()

    def loss_seq(m, c):
        tot = 0.0
        for v in range(V):
            out = rasterize_pallas(m[v], qc[v], scales, opac, c, K4t, cfg)
            tot = tot + wts[v] * (out["color"].mean() + out["depth"].mean())
        return tot

    g_m = jax.jit(jax.grad(loss_multi, argnums=(0, 1)))(mc, cols)
    g_s = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(mc, cols)
    for nm, a, b in zip(["means", "colors"], g_s, g_m):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-3,
                                   err_msg=nm)


def test_planned_bins_grads_match_fresh():
    """Cached-plan bins (compute_bin_plan: fixed occupancy order + the
    pre-sorted pack-backward segment reduction) must reproduce the
    fresh-binning render AND its gradients — the mapping optimizer runs
    every segment render through this path."""
    import jax
    from cut3r_slam_tpu.ops.gs_raster import compute_bins, compute_bin_plan
    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
    means, quats, scales, opac, colors = _scene(60)
    eg, em = compute_bins(means, quats, scales, opac, K4, CFG)
    plan = compute_bin_plan(eg, em, means.shape[0], CFG)
    bins = (eg, em) + tuple(plan)

    out_f = rasterize_pallas(means, quats, scales, opac, colors, K4, CFG,
                             interpret=True)
    out_p = rasterize_pallas(means, quats, scales, opac, colors, K4, CFG,
                             interpret=True, bins=bins)
    for k in ("color", "alpha", "depth", "mdepth", "normal"):
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_f[k]), atol=1e-5,
                                   err_msg=k)

    g_f = jax.grad(_loss_fn(rasterize_pallas, interpret=True),
                   argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac,
                                            colors)
    g_p = jax.grad(_loss_fn(rasterize_pallas, interpret=True, bins=bins),
                   argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac,
                                            colors)
    for n, a, b in zip(["means", "quats", "scales", "opac", "colors"],
                       g_f, g_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=n)


@pytest.mark.parametrize("mode", ["segsum", "cumsum", "take"])
def test_planned_bwd_modes_agree(mode, monkeypatch):
    """All three lowerings of the planned segment reduction are the same
    math — their gradients must agree to float tolerance."""
    import jax
    from cut3r_slam_tpu.ops import gs_raster_pallas as gp
    from cut3r_slam_tpu.ops.gs_raster import compute_bins, compute_bin_plan
    means, quats, scales, opac, colors = _scene(50)
    eg, em = compute_bins(means, quats, scales, opac, K4, CFG)
    bins = (eg, em) + tuple(compute_bin_plan(eg, em, means.shape[0], CFG))
    monkeypatch.setattr(gp, "_PLAN_BWD_MODE", mode)
    g = jax.grad(_loss_fn(gp.rasterize_pallas, interpret=True, bins=bins),
                 argnums=(0, 4))(means, quats, scales, opac, colors)
    monkeypatch.undo()
    g_ref = jax.grad(_loss_fn(gp.rasterize_pallas, interpret=True),
                     argnums=(0, 4))(means, quats, scales, opac, colors)
    for a, b in zip(g_ref, g):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)


def test_multi_view_planned_bins_parity():
    """Fused multi-view render with stacked per-view cached plans vs the
    same render with fresh binning (the window optimizer's per-segment
    path, slam/mapping.py _bin_window)."""
    import jax
    from cut3r_slam_tpu.ops.gs_raster import compute_bins, compute_bin_plan
    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas_multi
    means, quats, scales, opac, colors = _scene(60)
    V = 3
    offs = jnp.asarray(np.stack([RNG.uniform(-0.05, 0.05, 3)
                                 for _ in range(V)]), jnp.float32)
    mc = means[None] + offs[:, None, :]
    qc = jnp.tile(quats[None], (V, 1, 1))

    def one_bins(m, q):
        eg, em = compute_bins(m, q, scales, opac, K4, CFG)
        return (eg, em) + tuple(compute_bin_plan(eg, em, m.shape[0], CFG))

    bins = jax.lax.map(lambda xs: one_bins(*xs), (mc, qc))

    out_f = rasterize_pallas_multi(mc, qc, scales, opac, colors, K4, CFG,
                                   interpret=True)
    out_p = rasterize_pallas_multi(mc, qc, scales, opac, colors, K4, CFG,
                                   interpret=True, bins=bins)
    for k in ("color", "alpha", "depth", "mdepth", "normal"):
        np.testing.assert_allclose(np.asarray(out_p[k]),
                                   np.asarray(out_f[k]), atol=1e-5,
                                   err_msg=k)

    def loss(fn_bins):
        def f(m, s, o, c):
            out = rasterize_pallas_multi(m, qc, s, o, c, K4, CFG,
                                         interpret=True, bins=fn_bins)
            return out["color"].mean() + out["depth"].mean()
        return f

    g_f = jax.grad(loss(None), argnums=(0, 1, 2, 3))(mc, scales, opac,
                                                     colors)
    g_p = jax.grad(loss(bins), argnums=(0, 1, 2, 3))(mc, scales, opac,
                                                     colors)
    for n, a, b in zip(["means", "scales", "opac", "colors"], g_f, g_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=n)
