"""Gaussian mapping backend (per-frame variant).

Counterpart of /root/reference/hislam2/gs_backend_per_frame.py (GSBackEnd).
Host code only orchestrates; every optimization loop is a single jitted
`lax.scan` with static shapes:

* ``pose_refine`` (:202-326): 50 Adam iterations on one view's se3 deltas;
  loss = 5·ratio·L1_rgb[alpha>th] + ratio·var(log d − log d_gt) +
  0.05·(2−ratio)·‖δ‖²; afterwards the gt depth is scale-corrected
  (clamp [0.95, 1.05]) and reprojected to world for Gaussian seeding.
* ``optimization`` (:451-594): windowed mapping, window padded to a fixed
  size with per-view weights; RGB 0.8·L1+0.2·(1−SSIM), inverse-depth L1,
  depth-normal consistency, isotropic regularization, per-view exposure.
* ``global_BA`` (:946-1058): one random view per iteration in fixed-length
  jitted segments; densification stats accumulate on-device and
  densify_and_prune runs between segments.
* ``gaussian_update`` (:701-774): loop-closure rigid SE3 transform of all
  Gaussians belonging to the corrected submaps (mask by kf_id — no
  prune/cat/optimizer surgery needed in the arena design; Adam moments of
  moved Gaussians are zeroed like the reference's rebuild).

The Gaussian optimizer is a hand-rolled Adam over the arena param dict
with the reference's per-group learning rates and an exponential position
schedule, so moments can be masked/reset at reallocated slots.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gs_raster import RasterizeConfig
from ..ops.ssim import ssim
from ..geometry.pointmap import depth_to_normal, depth_to_pointmap
from ..geometry.lie import se3_matrix
from ..geometry.quaternion import quat_normalize
from .camera import CameraBuffer, se3_delta_to_matrix
from .gaussian_map import (GaussianArena, seed_from_pointmap,
                           densify_and_prune, last_alive_bound)
from .renderer import (render_view, render_window, bin_view,
                       _quat_mult_wxyz)

__all__ = ["MappingConfig", "MappingBackend"]


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    height: int
    width: int
    capacity: int = 2 ** 18          # Gaussian arena slots
    cam_capacity: int = 512
    window_size: int = 10
    pose_refine_iters: int = 50
    pose_lr: float = 0.0003
    exposure_lr: float = 0.001
    lambda_depth: float = 0.5
    lambda_normal: float = 0.05
    lambda_iso: float = 10.0
    position_lr: float = 0.00016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    densify_grad_threshold: float = 0.0002
    opacity_threshold: float = 0.005
    gba_segment: int = 50
    opt_segment: int = 10  # iterations per compiled optimization segment
    # Per-new-view iteration counts inside run() — reference values are
    # hardcoded 20/50/10 (gs_backend_per_frame.py:776-862). These only
    # change how many times the SAME compiled segments are invoked, so
    # lowering them (e.g. the CPU smoke bench) never recompiles.
    window_opt_iters: int = 20    # optimization() over the sliding window
    new_view_opt_iters: int = 50  # single-view polish of the newest KF
    gba_per_view: int = 10        # global_BA iters = gba_per_view * n_views
    alpha_th: float = 0.5
    # Host-side early stopping for the windowed optimization: after each
    # compiled opt_segment, stop when the segment loss improved by less
    # than this RELATIVE fraction (the loss plateaus fast on windows
    # whose older views were already optimized in previous events —
    # only the new KFs are fresh). 0.0 = off (the reference's fixed
    # iteration counts, gs_backend_per_frame.py:776-862). Purely host
    # control flow over the SAME compiled segments: no recompiles, and
    # the segment losses it reads are already materialized at each
    # generator yield.
    opt_early_stop_rel: float = 0.0
    # global-BA batching: each solver iteration renders this many random
    # views and applies ONE Adam step on the MEAN Gaussian gradient
    # (poses/exposures update per-view). 1 = the reference's
    # one-view-per-iteration semantics; >1 trades per-view Adam steps
    # for batch parallelism — under a mesh with an `mv` axis the views
    # of an iteration are sharded across devices (parallel/mapping.py).
    gba_views_per_iter: int = 1
    # iterations between view RESAMPLING in global BA: each block of
    # iterations keeps its gba_views_per_iter random views and reuses
    # one cached tile binning (+ pack-backward plan) across the block —
    # the binning sort is the dominant per-render fixed cost on TPU and
    # random per-iteration views can never amortize it. 1 = resample
    # every iteration (the reference's semantics,
    # gs_backend_per_frame.py:1005); >1 trades sampling granularity for
    # binning reuse (poses move < a pixel per block at the mapping LRs,
    # the same slack argument as compute_bins' segment reuse).
    gba_resample_every: int = 1
    # batch the pose refinement of a submap's new keyframes into one
    # program (vmapped single-view problems; sharded over `mv` under a
    # mesh). False = the reference's sequential chain, where each new
    # KF's initial pose chains through the previous REFINED pose and a
    # window optimization runs between consecutive refines.
    parallel_kf_refine: bool = False
    downsample: int = 2
    max_per_tile: int = 512
    kernel_size: float = 0.1
    compensate_exposure: bool = True
    # "auto": Pallas tile kernels on TPU, XLA scan elsewhere
    raster_backend: str = "auto"  # "auto" | "pallas" | "xla"
    raster_interpret: bool = False  # Pallas interpret mode (CPU testing)
    # Live-prefix bucketing: hot programs (pose refine, window
    # optimization, global BA, data_update renders) run on
    # arena[:bucket], where bucket is the smallest capacity/div
    # (div in bucket_divs) covering every alive slot — per-render
    # preprocess/bin/pack cost then scales with the live Gaussian count
    # like the CUDA rasterizer's, instead of with arena capacity. Seeds
    # fill the lowest free slots, so alive stays a prefix; each bucket
    # size is a distinct compiled program (lazy, cached).
    bucket_live_prefix: bool = True
    bucket_divs: Tuple[int, ...] = (8, 4, 2, 1)
    # Fused multi-view window rendering (Pallas backend only): each
    # window-optimization iteration renders ALL its views through ONE
    # blend kernel + ONE backward (ops/gs_raster_pallas.
    # rasterize_pallas_multi) instead of a rematerialized scan of
    # single-view renders — per-render fixed costs amortize V-fold and
    # the forward recompute disappears. Same math; the XLA backend (CPU
    # tests) keeps the sequential scan.
    fused_window_render: bool = True


def _mask_grads(grads, alive):
    """Zero gradients of dead arena slots — their forward is masked but
    the preprocess math on zeroed params produces NaN cotangents."""
    def f(g):
        return jnp.where(alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
    return jax.tree.map(f, grads)


def _adam_init(params):
    return (jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))


def _adam_step(params, grads, state, lrs, b1=0.9, b2=0.999, eps=1e-8):
    m, v, t = state
    t = t + 1
    m = jax.tree.map(lambda a, g: b1 * a + (1 - b1) * g, m, grads)
    v = jax.tree.map(lambda a, g: b2 * a + (1 - b2) * g * g, v, grads)
    bc1 = 1 - b1 ** t.astype(jnp.float32)
    bc2 = 1 - b2 ** t.astype(jnp.float32)

    def upd(p, mm, vv, lr):
        return p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps)

    params = {k: upd(params[k], m[k], v[k], lrs[k]) for k in params}
    return params, (m, v, t)


class MappingBackend:
    def __init__(self, cfg: MappingConfig, K4: np.ndarray, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with an ``mv`` axis — the
        windowed optimization then renders its views in parallel across
        the axis (one shard of the window per device, Gaussian grads
        psum'd over ICI; parallel/mapping.py). None = sequential scan
        (single chip)."""
        self.cfg = cfg
        self.mesh = mesh
        self.K4 = jnp.asarray(K4, jnp.float32)
        use_pallas = (cfg.raster_backend == "pallas"
                      or (cfg.raster_backend == "auto"
                          and jax.default_backend() == "tpu"))
        self.raster_cfg = RasterizeConfig(
            height=cfg.height, width=cfg.width,
            max_per_tile=cfg.max_per_tile, kernel_size=cfg.kernel_size,
            use_pallas=use_pallas, interpret=cfg.raster_interpret)
        self.arena = GaussianArena.empty(cfg.capacity)
        self.adam = _adam_init(self.arena.params())
        self.cams = CameraBuffer.empty(cfg.cam_capacity, cfg.height, cfg.width)
        self.current_window: List[int] = []
        self.initialized = False
        self.timer = None  # optional utils.profiling.StageTimer
        self._rng = jax.random.PRNGKey(0)
        self._build_jits()
        if mesh is not None and dict(mesh.shape).get("mv", 1) > 1:
            from ..parallel.mapping import (make_parallel_optimize,
                                            make_parallel_gba_batch,
                                            make_parallel_pose_refine)
            self._optimize = make_parallel_optimize(self, mesh)
            self._gba_batch = make_parallel_gba_batch(self, mesh)
            self._pose_refine_batch = make_parallel_pose_refine(self, mesh)

    # ------------------------------------------------------------------
    def _lrs(self):
        c = self.cfg
        return {"xyz": c.position_lr, "f_dc": c.feature_lr,
                "opacity_logit": c.opacity_lr, "log_scales": c.scaling_lr,
                "quat": c.rotation_lr}

    # ---------------- live-prefix bucketing (see MappingConfig) -------
    def _live_bucket(self) -> int:
        """Smallest configured bucket covering every alive slot."""
        cfg = self.cfg
        if not cfg.bucket_live_prefix:
            return cfg.capacity
        bound = int(last_alive_bound(self.arena.alive))
        for div in sorted(cfg.bucket_divs, reverse=True):
            b = cfg.capacity // div
            if bound <= b:
                return b
        return cfg.capacity

    def _sliced(self, bucket: int):
        """(arena, adam) views of the first ``bucket`` slots."""
        arena_b = self.arena.slice_prefix(bucket)
        m, v, t = self.adam
        adam_b = (jax.tree.map(lambda x: x[:bucket], m),
                  jax.tree.map(lambda x: x[:bucket], v), t)
        return arena_b, adam_b

    def _write_back(self, arena_b: GaussianArena, adam_b):
        """Scatter bucket-shaped state back into the full arena/adam."""
        self.arena = self.arena.write_prefix(arena_b)
        m, v, _ = self.adam
        mb, vb, t = adam_b
        self.adam = (
            jax.tree.map(lambda f, p: f.at[: p.shape[0]].set(p), m, mb),
            jax.tree.map(lambda f, p: f.at[: p.shape[0]].set(p), v, vb), t)

    def _build_jits(self):
        cfg = self.cfg
        rcfg = self.raster_cfg
        K4 = self.K4
        W_SIZE = cfg.window_size
        alpha_th = cfg.alpha_th

        # ------------------------- pose refine -------------------------
        def pose_refine_loss(deltas, params, alive, image, depth_gt, w2c,
                             bins):
            out = render_view(params, alive, w2c, K4, rcfg,
                              trans_delta=deltas["t"], rot_delta=deltas["r"],
                              bins=bins)
            img = out["color"]
            d = out["depth"]
            a = out["alpha"]
            amask = jax.lax.stop_gradient(a > alpha_th)
            ratio = amask.mean()
            rgb_l = jnp.abs((image - img) * amask[..., None]).sum() \
                / jnp.maximum(amask.sum() * 3, 1.0)
            dmask = amask & (depth_gt > 1e-3) & (d > 1e-3)
            diff = jnp.where(dmask, jnp.log(jnp.maximum(d, 1e-6))
                             - jnp.log(jnp.maximum(depth_gt, 1e-6)), 0.0)
            n = jnp.maximum(dmask.sum(), 1.0)
            mean = diff.sum() / n
            var = (diff * diff).sum() / n - mean * mean
            pose_l = (deltas["r"] ** 2).sum() + (deltas["t"] ** 2).sum()
            return 5 * ratio * rgb_l + ratio * var \
                + 0.05 * (2 - ratio) * pose_l

        def pose_refine(params, alive, image, depth_gt, w2c):
            deltas = {"t": jnp.zeros(3), "r": jnp.zeros(3)}
            lrs = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}
            adam = _adam_init(deltas)

            # segmented binning: the tile sort is recomputed once per
            # opt_segment iterations at the CURRENT delta (pose moves up
            # to a few px per segment — inside the 3-sigma rect slack),
            # instead of on every one of the 50 iterations
            seg = max(1, min(cfg.opt_segment, cfg.pose_refine_iters))
            n_seg = -(-cfg.pose_refine_iters // seg)  # ceil: never fewer

            def step(carry, _):
                deltas, adam, bins = carry
                g = jax.grad(pose_refine_loss)(deltas, params, alive, image,
                                               depth_gt, w2c, bins)
                deltas, adam = _adam_step(deltas, g, adam, lrs)
                return (deltas, adam, bins), None

            def seg_body(carry, _):
                deltas, adam = carry
                bins = bin_view(params, alive, w2c, K4, rcfg,
                                trans_delta=deltas["t"],
                                rot_delta=deltas["r"])
                (deltas, adam, _), _ = jax.lax.scan(
                    step, (deltas, adam, bins), None, length=seg)
                return (deltas, adam), None

            (deltas, _), _ = jax.lax.scan(seg_body, (deltas, adam), None,
                                          length=n_seg)
            new_w2c = se3_delta_to_matrix(deltas["t"], deltas["r"]) @ w2c

            # return-args pass (:286-326): scale-corrected gt depth + world
            # pointmap + low-alpha validity mask for seeding
            out = render_view(params, alive, new_w2c, K4, rcfg)
            a = out["alpha"]
            d = out["depth"]
            amask = (a > alpha_th) & (depth_gt > 1e-3) & (d > 1e-3)
            ratio = (a > alpha_th).mean()
            diff = jnp.where(amask, jnp.log(jnp.maximum(d, 1e-6))
                             - jnp.log(jnp.maximum(depth_gt, 1e-6)), 0.0)
            scale = jnp.exp(diff.sum() / jnp.maximum(amask.sum(), 1.0))
            scale = jnp.where(ratio > 0.3, jnp.clip(scale, 0.95, 1.05), 1.0)
            gt_scaled = scale * depth_gt
            valid = (a <= alpha_th) & (depth_gt > 1e-3)
            c2w = jnp.linalg.inv(new_w2c)
            pointmap = depth_to_pointmap(gt_scaled, K4, c2w=c2w)
            return new_w2c, gt_scaled, pointmap, valid

        self._pose_refine = jax.jit(pose_refine)
        self._pose_refine_impl = pose_refine  # un-jitted, for overrides

        # batched over views (VERDICT r3 #3): a submap's new keyframes
        # are independent single-view problems once their initial poses
        # are fixed — one program refines them all. lax.map (not vmap)
        # keeps the Pallas kernel out of vmap batching; the mesh
        # override shards the view axis instead
        # (parallel/mapping.make_parallel_pose_refine).
        def pose_refine_batch(params, alive, images, depth_gts, w2cs):
            return jax.lax.map(
                lambda xs: pose_refine(params, alive, *xs),
                (images, depth_gts, w2cs))

        # fused variant (Pallas backend): each iteration renders ALL the
        # batch's views through ONE blend kernel + ONE backward with
        # per-view pose deltas (render_window) instead of lax.map'ing B
        # independent 50-iteration programs — the per-render fixed costs
        # (kernel ramp-up, pack-gradient reduction) amortize B-fold. The
        # problems stay independent: the loss is a SUM of per-view terms
        # and Adam on the stacked deltas is elementwise, so the math
        # equals the lax.map path (tests/test_mapping.py::
        # test_pose_refine_batch_fused_parity).
        def _pose_view_terms(img, d, a, image, depth_gt, dt, dr):
            amask = jax.lax.stop_gradient(a > alpha_th)
            ratio = amask.mean()
            rgb_l = jnp.abs((image - img) * amask[..., None]).sum() \
                / jnp.maximum(amask.sum() * 3, 1.0)
            dmask = amask & (depth_gt > 1e-3) & (d > 1e-3)
            diff = jnp.where(dmask, jnp.log(jnp.maximum(d, 1e-6))
                             - jnp.log(jnp.maximum(depth_gt, 1e-6)), 0.0)
            n = jnp.maximum(dmask.sum(), 1.0)
            mean = diff.sum() / n
            var = (diff * diff).sum() / n - mean * mean
            pose_l = (dr ** 2).sum() + (dt ** 2).sum()
            return 5 * ratio * rgb_l + ratio * var \
                + 0.05 * (2 - ratio) * pose_l

        def pose_refine_batch_fused(params, alive, images, depth_gts,
                                    w2cs):
            B = images.shape[0]
            deltas = {"t": jnp.zeros((B, 3)), "r": jnp.zeros((B, 3))}
            lrs = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}
            adam = _adam_init(deltas)
            seg = max(1, min(cfg.opt_segment, cfg.pose_refine_iters))
            n_seg = -(-cfg.pose_refine_iters // seg)

            def loss_fn(deltas, bins):
                outs = render_window(params, alive, w2cs, K4, rcfg,
                                     trans_deltas=deltas["t"],
                                     rot_deltas=deltas["r"], bins=bins)
                losses = jax.vmap(_pose_view_terms)(
                    outs["color"], outs["depth"], outs["alpha"],
                    images, depth_gts, deltas["t"], deltas["r"])
                return losses.sum()

            def step(carry, _):
                deltas, adam, bins = carry
                g = jax.grad(loss_fn)(deltas, bins)
                deltas, adam = _adam_step(deltas, g, adam, lrs)
                return (deltas, adam, bins), None

            def seg_body(carry, _):
                deltas, adam = carry
                bins = jax.lax.map(
                    lambda xs: bin_view(params, alive, xs[0], K4, rcfg,
                                        trans_delta=xs[1], rot_delta=xs[2]),
                    (w2cs, deltas["t"], deltas["r"]))
                (deltas, adam, _), _ = jax.lax.scan(
                    step, (deltas, adam, bins), None, length=seg)
                return (deltas, adam), None

            (deltas, _), _ = jax.lax.scan(seg_body, (deltas, adam), None,
                                          length=n_seg)
            new_w2c = jnp.einsum(
                "vij,vjk->vik",
                jax.vmap(se3_delta_to_matrix)(deltas["t"], deltas["r"]),
                w2cs)

            # return-args pass: ONE fused forward render of the batch
            outs = render_window(params, alive, new_w2c, K4, rcfg)

            def finish(a, d, depth_gt, w2c):
                amask = (a > alpha_th) & (depth_gt > 1e-3) & (d > 1e-3)
                ratio = (a > alpha_th).mean()
                diff = jnp.where(amask, jnp.log(jnp.maximum(d, 1e-6))
                                 - jnp.log(jnp.maximum(depth_gt, 1e-6)),
                                 0.0)
                scale = jnp.exp(diff.sum() / jnp.maximum(amask.sum(), 1.0))
                scale = jnp.where(ratio > 0.3,
                                  jnp.clip(scale, 0.95, 1.05), 1.0)
                gt_scaled = scale * depth_gt
                valid = (a <= alpha_th) & (depth_gt > 1e-3)
                c2w = jnp.linalg.inv(w2c)
                pointmap = depth_to_pointmap(gt_scaled, K4, c2w=c2w)
                return gt_scaled, pointmap, valid

            gt_scaled, pointmaps, valids = jax.vmap(finish)(
                outs["alpha"], outs["depth"], depth_gts, new_w2c)
            return new_w2c, gt_scaled, pointmaps, valids

        if rcfg.use_pallas:
            self._pose_refine_batch = jax.jit(pose_refine_batch_fused)
        else:
            self._pose_refine_batch = jax.jit(pose_refine_batch)
        self._pose_refine_batch_seq = jax.jit(pose_refine_batch)

        # ------------------------- mapping window ----------------------
        # window_loss_raw: UNNORMALIZED weighted sum over however many
        # views the passed arrays hold (full window sequentially, or one
        # device's shard under parallel/mapping.make_parallel_optimize —
        # the view count comes from images.shape[0], not the config).
        def _view_terms(out, image, expo_a, expo_b, gt_d, gdn=None):
            """Per-view loss terms from rendered maps (shared by the
            fused multi-view path — vmapped — and the sequential scan).
            ``gdn``: optional PRECOMPUTED depth_to_normal(gt_d) — the gt
            normal map is loop-invariant across an optimization segment's
            iterations, so callers hoist it out of the scan (XLA does not
            move the large op out of the scan body itself)."""
            img = out["color"]
            if cfg.compensate_exposure:
                img = img @ expo_a + expo_b
            d = out["depth"]
            rgb_l = 0.8 * jnp.abs(image - img).mean() \
                + 0.2 * (1 - ssim(img, image))
            dmask = jax.lax.stop_gradient((gt_d > 1e-3) & (d > 1e-3))
            inv_d = jnp.where(dmask, 1.0 / jnp.maximum(d, 1e-6)
                              - 1.0 / jnp.maximum(gt_d, 1e-6), 0.0)
            depth_l = jnp.abs(inv_d).sum() / jnp.maximum(dmask.sum(), 1.0)
            dn = depth_to_normal(d, K4)
            if gdn is None:
                gdn = depth_to_normal(gt_d, K4)
            norm_l = ((1 - (dn * gdn).sum(-1)) * dmask).sum() \
                / jnp.maximum(dmask.sum(), 1.0)
            return rgb_l, depth_l, norm_l

        def _iso_term(params, vis):
            scales = jnp.exp(params["log_scales"])
            return (jnp.abs(scales - scales.mean(1, keepdims=True)).mean(1)
                    * vis).sum() / jnp.maximum(vis.sum(), 1.0)

        def window_loss_fused(params, pose_deltas, exposure, alive, images,
                              depths_gt, w2c_base, weights, optimize_pose,
                              bins=None, gt_normals=None):
            """Fused multi-view variant: ONE Pallas blend fwd (+ ONE bwd)
            renders the whole window per iteration instead of a scan of
            V single-view renders — the per-render fixed costs (kernel
            ramp-up, small-op dispatch, the pack-gradient scatter)
            amortize V-fold, and no remat recompute is needed: the fused
            program's residuals (packed A + per-chunk transmittance) fit
            HBM at W=10/512x384/2^17 where the scan's XLA-AD residuals
            did not. Same math as the scan path (the loss is a weighted
            sum of independent per-view terms); parity is asserted in
            tests/test_mapping.py::test_window_loss_fused_parity."""
            V = images.shape[0]
            tds = pose_deltas["t"] if optimize_pose else jnp.zeros((V, 3))
            rds = pose_deltas["r"] if optimize_pose else jnp.zeros((V, 3))
            outs = render_window(params, alive, w2c_base, K4, rcfg,
                                 trans_deltas=tds, rot_deltas=rds,
                                 bins=bins)
            if gt_normals is None:
                gt_normals = jax.lax.map(
                    lambda d: depth_to_normal(d, K4), depths_gt)
            rgb_l, depth_l, norm_l = jax.vmap(
                lambda o, im, ea, eb, gd, gn: _view_terms(
                    o, im, ea, eb, gd, gdn=gn))(
                {k: outs[k] for k in ("color", "depth")}, images,
                exposure["a"], exposure["b"], depths_gt, gt_normals)
            iso = jax.vmap(lambda v: _iso_term(params, v))(
                outs["visibility"])
            losses = (rgb_l + cfg.lambda_depth * depth_l
                      + cfg.lambda_normal * norm_l + cfg.lambda_iso * iso)
            total = (losses * weights).sum()
            return total, (outs["radii"], outs["visibility"])

        def window_loss_raw(params, pose_deltas, exposure, alive, images,
                            depths_gt, w2c_base, weights, optimize_pose,
                            bins=None, gt_normals=None):
            if rcfg.use_pallas and cfg.fused_window_render:
                return window_loss_fused(params, pose_deltas, exposure,
                                         alive, images, depths_gt,
                                         w2c_base, weights, optimize_pose,
                                         bins=bins, gt_normals=gt_normals)

            def per_view(i):
                td = pose_deltas["t"][i] if optimize_pose else jnp.zeros(3)
                rd = pose_deltas["r"][i] if optimize_pose else jnp.zeros(3)
                probe = jnp.zeros((params["xyz"].shape[0], 2))
                vbins = (None if bins is None
                         else jax.tree.map(lambda b: b[i], bins))
                out = render_view(params, alive, w2c_base[i], K4, rcfg,
                                  trans_delta=td, rot_delta=rd,
                                  means2d_probe=probe, bins=vbins)
                rgb_l, depth_l, norm_l = _view_terms(
                    out, images[i], exposure["a"][i], exposure["b"][i],
                    depths_gt[i],
                    gdn=None if gt_normals is None else gt_normals[i])
                vis = out["visibility"]
                iso = _iso_term(params, vis)
                loss = (rgb_l + cfg.lambda_depth * depth_l
                        + cfg.lambda_normal * norm_l + cfg.lambda_iso * iso)
                return loss, out["radii"], vis

            # sequential over the window with rematerialization: a vmap
            # here keeps W_SIZE full rasterizer forwards live at once and
            # OOMs HBM at 512x384/2^17 gaussians; the reference renders
            # window views one-by-one too (gs_backend_per_frame.py:451+)
            def body(acc, i):
                loss, radii, vis = jax.checkpoint(per_view)(i)
                return acc + loss * weights[i], (radii, vis)

            total, (radii, vis) = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(images.shape[0]))
            return total, (radii, vis)

        def window_loss(params, pose_deltas, exposure, alive, images,
                        depths_gt, w2c_base, weights, optimize_pose,
                        bins=None, gt_normals=None):
            total, aux = window_loss_raw(params, pose_deltas, exposure,
                                         alive, images, depths_gt,
                                         w2c_base, weights, optimize_pose,
                                         bins=bins, gt_normals=gt_normals)
            return total / jnp.maximum(weights.sum(), 1.0), aux

        # exposed for parallel/mapping.make_parallel_optimize
        self._window_loss_raw = window_loss_raw
        self._bin_window = lambda params, alive, w2c: jax.lax.map(
            lambda w: bin_view(params, alive, w, K4, rcfg), w2c)

        def optimize(arena: GaussianArena, adam, cams: CameraBuffer,
                     window_idx, weights, iters: int, optimize_pose: bool,
                     pd_adam=None, ex_adam=None):
            params = arena.params()
            images = cams.image[window_idx].astype(jnp.float32) / 255.0
            depths_gt = cams.depth[window_idx].astype(jnp.float32)
            w2c = cams.w2c[window_idx]
            # view count from the INDEX SHAPE, not the config: jit
            # re-specializes per window arity, so single-view callers
            # (init seeding, the 50-iter new-KF polish) get a V=1
            # program instead of rendering W_SIZE-1 zero-weight pads
            V = window_idx.shape[0]
            pose_deltas = {"t": jnp.zeros((V, 3)),
                           "r": jnp.zeros((V, 3))}
            exposure = {"a": cams.exposure_a[window_idx],
                        "b": cams.exposure_b[window_idx]}
            # pose/exposure Adam moments thread across opt segments (the
            # reference keeps them for the whole optimization() call,
            # gs_backend_per_frame.py:477); callers pass the carried state
            if pd_adam is None:
                pd_adam = _adam_init(pose_deltas)
            if ex_adam is None:
                ex_adam = _adam_init(exposure)
            lrs_pd = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}
            lrs_ex = {"a": cfg.exposure_lr, "b": cfg.exposure_lr}

            # ONE binning per view per SEGMENT (this whole jit is one
            # segment of `iters` iterations): the tile sort is ~20% of a
            # render, and with jax.checkpoint around per_view it used to
            # run twice per view per iteration. Cached bins enter the
            # remat region as saved residuals, not recomputed values.
            bins = jax.lax.map(
                lambda w: bin_view(params, arena.alive, w, K4, rcfg), w2c)
            # gt normal maps are constant across the whole segment —
            # computed once here instead of inside every scan iteration
            gdns = jax.lax.map(lambda d: depth_to_normal(d, K4), depths_gt)

            def step(carry, _):
                params, adam, pose_deltas, pd_adam, exposure, ex_adam, w2c = carry
                (loss, _aux), grads = jax.value_and_grad(
                    window_loss, argnums=(0, 1, 2), has_aux=True)(
                    params, pose_deltas, exposure, arena.alive, images,
                    depths_gt, w2c, weights, optimize_pose, bins, gdns)
                gp, gd, ge = grads
                gp = _mask_grads(gp, arena.alive)
                params, adam = _adam_step(params, gp, adam, self._lrs())
                if optimize_pose:
                    pose_deltas, pd_adam = _adam_step(pose_deltas, gd,
                                                      pd_adam, lrs_pd)
                    # update_pose: fold deltas into w2c and zero them
                    M = jax.vmap(se3_delta_to_matrix)(pose_deltas["t"],
                                                      pose_deltas["r"])
                    w2c = jnp.einsum("vij,vjk->vik", M, w2c)
                    pose_deltas = jax.tree.map(jnp.zeros_like, pose_deltas)
                    if cfg.compensate_exposure:
                        exposure, ex_adam = _adam_step(exposure, ge,
                                                       ex_adam, lrs_ex)
                return (params, adam, pose_deltas, pd_adam, exposure,
                        ex_adam, w2c), loss

            carry = (params, adam, pose_deltas, pd_adam, exposure, ex_adam, w2c)
            carry, losses = jax.lax.scan(step, carry, None, length=iters)
            params, adam, _, pd_adam, exposure, ex_adam, w2c = carry
            return params, adam, w2c, exposure, losses[-1], pd_adam, ex_adam

        self._optimize = jax.jit(optimize,
                                 static_argnames=("iters", "optimize_pose"))
        # sequential program kept under its own name: the view-parallel
        # override (parallel/mapping.py) only makes sense for full
        # windows; single-view calls always route here
        self._optimize_seq = self._optimize

        # ------------------------- global BA segment -------------------
        # Like the reference global_BA (gs_backend_per_frame.py:946-1058),
        # each iteration jointly optimizes the random view's se3 pose delta
        # and exposure (keyframe_optimizers + update_pose each iteration),
        # not just the Gaussians. Per-view Adam moments live in fixed
        # (cam_capacity, ...) buffers gathered/scattered at the view index.
        #
        # Batched (VERDICT r3 #3): each iteration consumes a ROW of
        # view_idx (seg, k) — k distinct random views whose Gaussian
        # gradients reduce to ONE mean Adam step while poses/exposures
        # update per-view. k=1 is the reference's one-view-per-iteration
        # loop. The per-view pass lives in self._gba_batch so a device
        # mesh can shard the batch axis (parallel/mapping.make_parallel_
        # gba_batch: lax.map here -> shard_map + psum there).
        def gba_view_loss(params, alive, probe, pe, image, depth_gt, w2c,
                          gdn=None):
            out = render_view(params, alive, w2c, K4, rcfg,
                              trans_delta=pe["t"], rot_delta=pe["r"],
                              means2d_probe=probe)
            img = out["color"] @ pe["a"] + pe["b"]
            d = out["depth"]
            rgb_l = 0.8 * jnp.abs(image - img).mean() \
                + 0.2 * (1 - ssim(img, image))
            dmask = jax.lax.stop_gradient((depth_gt > 1e-3) & (d > 1e-3))
            inv_d = jnp.where(dmask, 1.0 / jnp.maximum(d, 1e-6)
                              - 1.0 / jnp.maximum(depth_gt, 1e-6), 0.0)
            depth_l = jnp.abs(inv_d).sum() / jnp.maximum(dmask.sum(), 1.0)
            dn = depth_to_normal(d, K4)
            if gdn is None:
                gdn = depth_to_normal(depth_gt, K4)
            norm_l = ((1 - (dn * gdn).sum(-1)) * dmask).sum() \
                / jnp.maximum(dmask.sum(), 1.0)
            rn = out["normal"]
            rn_l = ((1 - (rn * gdn).sum(-1)) * dmask).sum() \
                / jnp.maximum(dmask.sum(), 1.0)
            scales = jnp.exp(params["log_scales"])
            vis = out["visibility"]
            iso = (jnp.abs(scales - scales.mean(1, keepdims=True)
                           ).mean(1) * vis).sum() \
                / jnp.maximum(vis.sum(), 1.0)
            loss = (rgb_l + cfg.lambda_depth / 10 * depth_l
                    + cfg.lambda_normal * (norm_l + rn_l)
                    + cfg.lambda_iso * iso)
            return loss, (out["radii"], vis)

        def gba_batch_grads(params, alive, images_u8, depths, w2c_all,
                            expa_all, expb_all, vi_batch, bins=None,
                            gt_normals=None):
            """Per-view losses/grads for a batch of view indices, with
            the Gaussian-space quantities already REDUCED over the batch
            (sum for grads/stats, max for radii) so the mesh-parallel
            override only has to psum them. Returns
            (losses (k,), gp_sum tree, ga_c (P,), den_c (P,), mr_c (P,),
             gpes (k, ...) tree, w2cs (k, 4, 4)). ``gt_normals``:
            optional (k, H, W, 3) precomputed gt normal maps (hoisted per
            resampling block — loop-invariant across its iterations)."""

            def one(xs):
                vi, gdn = xs
                image = images_u8[vi].astype(jnp.float32) / 255.0
                depth_gt = depths[vi].astype(jnp.float32)
                w2c = w2c_all[vi]
                pose_exp = {"t": jnp.zeros(3), "r": jnp.zeros(3),
                            "a": expa_all[vi], "b": expb_all[vi]}
                probe = jnp.zeros((params["xyz"].shape[0], 2))
                (loss, (radii, vis)), (gp, gprobe, gpe) = jax.value_and_grad(
                    gba_view_loss, argnums=(0, 2, 3), has_aux=True)(
                    params, alive, probe, pose_exp, image, depth_gt, w2c,
                    gdn)
                gp = _mask_grads(gp, alive)
                gprobe = jnp.where(alive[:, None], gprobe, 0.0)
                # densification stats (gaussian_model.py:779-783); the
                # probe grad xy-norm feeds grad_accum, its magnitude
                # also feeds the abs channel (z-components unused in our
                # rasterizer: both use the screen-space grad norm)
                gnorm = jnp.sqrt(jnp.sum(gprobe * gprobe, -1) + 1e-24)
                ga_c = jnp.where(vis, gnorm, 0.0)
                mr_c = jnp.where(vis, radii, 0.0)
                return loss, gp, ga_c, vis.astype(jnp.float32), mr_c, gpe, w2c

            if gt_normals is None:
                gt_normals = jax.lax.map(
                    lambda vi: depth_to_normal(
                        depths[vi].astype(jnp.float32), K4), vi_batch)
            losses, gps, ga_cs, viss, mr_cs, gpes, w2cs = \
                jax.lax.map(one, (vi_batch, gt_normals))
            gp_sum = jax.tree.map(lambda g: g.sum(0), gps)
            return (losses, gp_sum, ga_cs.sum(0), viss.sum(0),
                    mr_cs.max(0), gpes, w2cs)

        self._gba_batch = gba_batch_grads

        # fused variant (Pallas): the batch's views render through ONE
        # blend kernel + ONE backward (render_window with per-view pose
        # deltas, exposures and probes) instead of a lax.map of k
        # independent renders. Identical math: the total loss is the sum
        # of the per-view gba_view_loss terms, so the Gaussian gradient
        # IS gp_sum and each view's pose/exposure/probe gradient comes
        # from its own term (tests/test_mapping.py::
        # test_gba_batch_fused_parity). ``bins``: optional stacked
        # cached binning for the batch (gba_resample_every blocks).
        def gba_batch_fused(params, alive, images_u8, depths, w2c_all,
                            expa_all, expb_all, vi_batch, bins=None,
                            gt_normals=None):
            images = images_u8[vi_batch].astype(jnp.float32) / 255.0
            depth_gt = depths[vi_batch].astype(jnp.float32)
            if gt_normals is None:
                gt_normals = jax.lax.map(
                    lambda d: depth_to_normal(d, K4), depth_gt)
            w2cs = w2c_all[vi_batch]
            k = vi_batch.shape[0]
            P = params["xyz"].shape[0]
            pose_exp = {"t": jnp.zeros((k, 3)), "r": jnp.zeros((k, 3)),
                        "a": expa_all[vi_batch], "b": expb_all[vi_batch]}
            probe = jnp.zeros((k, P, 2))

            def view_terms(color, d, rn, vis, image, ea, eb, gt_d, gdn):
                img = color @ ea + eb
                rgb_l = 0.8 * jnp.abs(image - img).mean() \
                    + 0.2 * (1 - ssim(img, image))
                dmask = jax.lax.stop_gradient((gt_d > 1e-3) & (d > 1e-3))
                inv_d = jnp.where(dmask, 1.0 / jnp.maximum(d, 1e-6)
                                  - 1.0 / jnp.maximum(gt_d, 1e-6), 0.0)
                depth_l = jnp.abs(inv_d).sum() \
                    / jnp.maximum(dmask.sum(), 1.0)
                dn = depth_to_normal(d, K4)
                norm_l = ((1 - (dn * gdn).sum(-1)) * dmask).sum() \
                    / jnp.maximum(dmask.sum(), 1.0)
                rn_l = ((1 - (rn * gdn).sum(-1)) * dmask).sum() \
                    / jnp.maximum(dmask.sum(), 1.0)
                scales = jnp.exp(params["log_scales"])
                iso = (jnp.abs(scales - scales.mean(1, keepdims=True)
                               ).mean(1) * vis).sum() \
                    / jnp.maximum(vis.sum(), 1.0)
                return (rgb_l + cfg.lambda_depth / 10 * depth_l
                        + cfg.lambda_normal * (norm_l + rn_l)
                        + cfg.lambda_iso * iso)

            def loss_fn(params, probe, pe):
                outs = render_window(params, alive, w2cs, K4, rcfg,
                                     trans_deltas=pe["t"],
                                     rot_deltas=pe["r"], bins=bins,
                                     means2d_probe=probe)
                losses = jax.vmap(view_terms)(
                    outs["color"], outs["depth"], outs["normal"],
                    outs["visibility"], images, pe["a"], pe["b"],
                    depth_gt, gt_normals)
                return losses.sum(), (losses, outs["radii"],
                                      outs["visibility"])

            (_, (losses, radii, vis)), (gp, gprobe, gpe) = \
                jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                   has_aux=True)(params, probe, pose_exp)
            gp = _mask_grads(gp, alive)
            gprobe = jnp.where(alive[None, :, None], gprobe, 0.0)
            gnorm = jnp.sqrt(jnp.sum(gprobe * gprobe, -1) + 1e-24)
            ga_c = jnp.where(vis, gnorm, 0.0)
            mr_c = jnp.where(vis, radii, 0.0)
            return (losses, gp, ga_c.sum(0),
                    vis.astype(jnp.float32).sum(0), mr_c.max(0), gpe,
                    w2cs)

        if rcfg.use_pallas:
            self._gba_batch = gba_batch_fused

        def gba_segment(arena: GaussianArena, adam, cams: CameraBuffer,
                        view_idx, rng):
            params = arena.params()
            stats = (arena.grad_accum, arena.grad_accum_abs, arena.denom,
                     arena.max_radii)
            C = cams.w2c.shape[0]
            k_batch = view_idx.shape[1]
            pd_lrs = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}
            zero_pv = {
                "t": jnp.zeros((C, 3)), "r": jnp.zeros((C, 3)),
                "a": jnp.zeros((C, 3, 3)), "b": jnp.zeros((C, 3))}
            pv_state = (zero_pv, jax.tree.map(jnp.zeros_like, zero_pv),
                        jnp.zeros((C,), jnp.int32))

            m_iters = max(1, cfg.gba_resample_every)

            def one_iter(carry, _xs, vi_batch=None, bins=None,
                         gt_normals=None):
                (params, adam, stats, w2c_all, expa_all, expb_all,
                 pv_state) = carry
                ga, gaa, den, mr = stats

                losses, gp_sum, ga_c, den_c, mr_c, gpes, w2cs = \
                    self._gba_batch(params, arena.alive, cams.image,
                                    cams.depth, w2c_all, expa_all,
                                    expb_all, vi_batch, bins=bins,
                                    gt_normals=gt_normals)

                gp = jax.tree.map(lambda g: g / k_batch, gp_sum)
                params, adam = _adam_step(params, gp, adam, self._lrs())

                # per-view Adam on pose delta + exposure (vectorized over
                # the batch; vi_batch entries are distinct so the
                # scatters don't collide), then fold the deltas into w2c
                # (update_pose) and store back
                pose_exp = {"t": jnp.zeros((k_batch, 3)),
                            "r": jnp.zeros((k_batch, 3)),
                            "a": expa_all[vi_batch],
                            "b": expb_all[vi_batch]}
                pv_m, pv_v, pv_t = pv_state
                t_vi = pv_t[vi_batch] + 1                      # (k,)
                bc1 = 1 - 0.9 ** t_vi.astype(jnp.float32)
                bc2 = 1 - 0.999 ** t_vi.astype(jnp.float32)
                lrs_pe = {"t": pd_lrs["t"], "r": pd_lrs["r"],
                          "a": cfg.exposure_lr, "b": cfg.exposure_lr}
                new_pe = {}
                for k in pose_exp:
                    ex = (1,) * (gpes[k].ndim - 1)
                    mk = 0.9 * pv_m[k][vi_batch] + 0.1 * gpes[k]
                    vk = 0.999 * pv_v[k][vi_batch] + 0.001 * gpes[k] ** 2
                    pv_m[k] = pv_m[k].at[vi_batch].set(mk)
                    pv_v[k] = pv_v[k].at[vi_batch].set(vk)
                    new_pe[k] = pose_exp[k] - lrs_pe[k] \
                        * (mk / bc1.reshape((-1,) + ex)) \
                        / (jnp.sqrt(vk / bc2.reshape((-1,) + ex)) + 1e-8)
                pv_state = (pv_m, pv_v, pv_t.at[vi_batch].set(t_vi))
                new_w2c = jnp.einsum(
                    "vij,vjk->vik",
                    jax.vmap(se3_delta_to_matrix)(new_pe["t"], new_pe["r"]),
                    w2cs)
                w2c_all = w2c_all.at[vi_batch].set(new_w2c)
                expa_all = expa_all.at[vi_batch].set(new_pe["a"])
                expb_all = expb_all.at[vi_batch].set(new_pe["b"])
                ga = ga + ga_c
                gaa = gaa + ga_c
                den = den + den_c
                mr = jnp.maximum(mr, mr_c)
                return (params, adam, (ga, gaa, den, mr), w2c_all,
                        expa_all, expb_all, pv_state), losses.mean()

            def one_block(carry, vi_batch):
                """One resampling block: bin the block's views ONCE at
                the block-start poses (Pallas only) and hoist the
                block-invariant gt normal maps, then m_iters iterations
                against the cached binning."""
                from functools import partial as _partial
                if rcfg.use_pallas and m_iters > 1:
                    (params_c, _, _, w2c_all, _, _, _) = carry
                    bins = jax.lax.map(
                        lambda vi: bin_view(params_c, arena.alive,
                                            w2c_all[vi], K4, rcfg),
                        vi_batch)
                else:
                    bins = None
                gdns = jax.lax.map(
                    lambda vi: depth_to_normal(
                        cams.depth[vi].astype(jnp.float32), K4), vi_batch)
                carry, losses = jax.lax.scan(
                    _partial(one_iter, vi_batch=vi_batch, bins=bins,
                             gt_normals=gdns),
                    carry, None, length=m_iters)
                return carry, losses.mean()

            carry0 = (params, adam, stats, cams.w2c, cams.exposure_a,
                      cams.exposure_b, pv_state)
            (params, adam, stats, w2c_all, expa_all, expb_all, _), losses = \
                jax.lax.scan(one_block, carry0, view_idx)
            arena = arena.with_params(params)
            arena = dataclasses.replace(
                arena, grad_accum=stats[0], grad_accum_abs=stats[1],
                denom=stats[2], max_radii=stats[3])
            return arena, adam, w2c_all, expa_all, expb_all, losses.mean()

        self._gba_segment = jax.jit(gba_segment)

        # ------------------------- LC rigid update ---------------------
        def lc_transform(arena: GaussianArena, adam, submap_ids, pose_upd):
            """Rigidly move Gaussians of the listed submaps (:701-774).

            submap_ids: (S,) int; pose_upd: (S, 7) SE3 [t, q xyzw] per submap.
            """
            match = arena.kf_id[:, None] == submap_ids[None, :]  # (N, S)
            sel = match.any(-1) & arena.alive
            which = jnp.argmax(match, axis=-1)
            T = se3_matrix(jnp.concatenate(
                [pose_upd[:, :3], quat_normalize(pose_upd[:, 3:7])], -1))
            Tg = T[which]  # (N, 4, 4)
            new_xyz = jnp.einsum("nij,nj->ni", Tg[:, :3, :3], arena.xyz) \
                + Tg[:, :3, 3]
            from ..geometry.quaternion import matrix_to_quat, xyzw_to_wxyz
            qrot = xyzw_to_wxyz(matrix_to_quat(Tg[:, :3, :3]))
            new_quat = _quat_mult_wxyz(qrot, quat_normalize(arena.quat))
            arena = dataclasses.replace(
                arena,
                xyz=jnp.where(sel[:, None], new_xyz, arena.xyz),
                quat=jnp.where(sel[:, None], new_quat, arena.quat))
            # zero Adam moments of moved gaussians (reference rebuilds them)
            m, v, t = adam
            m = jax.tree.map(lambda x: jnp.where(
                sel.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x), m)
            v = jax.tree.map(lambda x: jnp.where(
                sel.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x), v)
            return arena, (m, v, t)

        self._lc_transform = jax.jit(lc_transform)

        # ------------------------- data update -------------------------
        def render_for_update(arena: GaussianArena, cams: CameraBuffer, vi):
            params = arena.params()
            out = render_view(params, arena.alive, cams.w2c[vi], K4, rcfg)
            d = out["depth"]
            a = out["alpha"]
            gt = cams.depth[vi].astype(jnp.float32)
            vmask = (d > 1e-3) & (gt > 1e-3) & (a > 0.9)
            diff = jnp.where(vmask, jnp.log(jnp.maximum(d, 1e-6))
                             - jnp.log(jnp.maximum(gt, 1e-6)), 0.0)
            scale = jnp.exp(diff.sum() / jnp.maximum(vmask.sum(), 1.0))
            scale = jnp.clip(scale, 0.95, 1.05)
            gt_scaled = scale * gt
            c2w = jnp.linalg.inv(cams.w2c[vi])
            pointmap = depth_to_pointmap(gt_scaled, K4, c2w=c2w)
            return gt_scaled, pointmap, c2w

        self._render_for_update = jax.jit(render_for_update)

        # batched variant: ONE dispatch + ONE readback for a whole
        # window — the per-view loop cost ~30 tunnel round trips
        # (26 ms each measured) per mapping event (bench round-5).
        # Pointmaps are NOT read back (23 MB/event over the tunnel);
        # data_update recomputes them on host from depth + c2w, the
        # identical unprojection (geometry/pointmap.depth_to_pointmap).
        def render_for_update_batch(arena: GaussianArena,
                                    cams: CameraBuffer, kis):
            d, _, c = jax.lax.map(
                lambda k: render_for_update(arena, cams, k), kis)
            return d, c

        self._render_for_update_batch = jax.jit(render_for_update_batch)

    # ==================================================================
    # host orchestration
    # ==================================================================
    def _tm(self, stage: str):
        """Stage-timing context for run()'s sub-phases: device-synced on
        exit (tiny host readbacks — the axon tunnel ignores
        block_until_ready) so the bench breakdown attributes a mapping
        event's wall time to the phase that actually spent it. No-op
        without a timer."""
        import contextlib
        if self.timer is None:
            return contextlib.nullcontext()
        outer = self

        @contextlib.contextmanager
        def cm():
            with outer.timer(stage):
                yield
                _ = np.asarray(outer.arena.xyz[0, 0])
                _ = np.asarray(outer.cams.w2c[0, 0, 0])
        return cm()

    def reset_state(self):
        """Fresh arena/cams/optimizer state, SAME jitted closures —
        lets a benchmark (or a second sequence) rerun the exact compiled
        programs with zero retracing."""
        self.arena = GaussianArena.empty(self.cfg.capacity)
        self.adam = _adam_init(self.arena.params())
        self.cams = CameraBuffer.empty(self.cfg.cam_capacity,
                                       self.cfg.height, self.cfg.width)
        self.current_window = []
        self.initialized = False
        self._rng = jax.random.PRNGKey(0)

    def add_keyframe(self, idx: int, image_u8: np.ndarray, depth: np.ndarray,
                     w2c: np.ndarray):
        self.cams = self.cams.add(idx, jnp.asarray(image_u8),
                                  jnp.asarray(depth), jnp.asarray(w2c))

    def seed(self, idx: int, pointmap, colors, conf_mask, submap_idx: int):
        """extend_from_pcd_seq equivalent for one keyframe."""
        self.arena, n, used = seed_from_pointmap(
            self.arena, jnp.asarray(pointmap).reshape(-1, 3),
            jnp.asarray(colors).reshape(-1, 3),
            jnp.asarray(conf_mask).reshape(-1),
            jnp.int32(submap_idx))
        # new slots start with zero Adam moments (reference: fresh optimizer
        # entries on cat, gaussian_model.py:374-417)
        m, v, t = self.adam

        def _mask(x):
            return jnp.where(used.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x)
        self.adam = (jax.tree.map(_mask, m), jax.tree.map(_mask, v), t)
        return int(n)

    def _window_arrays(self, window: List[int]):
        W_SIZE = self.cfg.window_size
        idx = np.zeros(W_SIZE, np.int32)
        wts = np.zeros(W_SIZE, np.float32)
        for i, k in enumerate(window[-W_SIZE:]):
            idx[i] = k
            wts[i] = 1.0
        return jnp.asarray(idx), jnp.asarray(wts)

    def optimization(self, iters: int, window: List[int],
                     optimize_pose: bool = True):
        loss = 0.0
        for loss in self.optimization_steps(iters, window, optimize_pose):
            pass
        return loss

    def optimization_steps(self, iters: int, window: List[int],
                           optimize_pose: bool = True):
        """Segmented so every call shares ONE compiled program per
        optimize_pose variant (single-core XLA compiles are the
        bottleneck on this box). Pose/exposure Adam moments thread
        across the segments, matching the reference's per-call horizon
        (gs_backend_per_frame.py:477); the Gaussian Adam state persists
        across calls exactly as the reference's optimizer does.

        GENERATOR: yields the running loss after each compiled segment —
        one bounded slice of device work — so the interleaved-mapping
        scheduler (SLAMSystem, Mapping.interleave) can spread an
        optimization across tracking frames. ``optimization()`` drains
        it in one go (the reference's stop-the-world behavior)."""
        if len(window) == 1:
            # V=1 specialization: a 10x cheaper program than rendering
            # the padded window with zero weights (same math — padded
            # views contribute exactly 0 loss and 0 gradient)
            idx = jnp.asarray(np.asarray(window, np.int32))
            wts = jnp.ones((1,), jnp.float32)
            opt_fn = self._optimize_seq
        else:
            idx, wts = self._window_arrays(window)
            opt_fn = self._optimize
        V = int(idx.shape[0])
        seg = self.cfg.opt_segment
        loss = 0.0
        w2c = exposure = None
        pd_adam = _adam_init({"t": jnp.zeros((V, 3)),
                              "r": jnp.zeros((V, 3))})
        ex_adam = _adam_init({"a": jnp.zeros((V, 3, 3)),
                              "b": jnp.zeros((V, 3))})
        arena_b, adam_b = self._sliced(self._live_bucket())
        n_segs = max(1, (int(iters) + seg - 1) // seg)
        stop_rel = float(self.cfg.opt_early_stop_rel)
        prev_loss = None
        for s in range(n_segs):
            params, adam_b, w2c, exposure, loss, pd_adam, ex_adam = \
                opt_fn(arena_b, adam_b, self.cams, idx, wts,
                       seg, bool(optimize_pose), pd_adam, ex_adam)
            arena_b = arena_b.with_params(params)
            if optimize_pose:
                # write poses AND exposure back every segment — the next
                # segment regathers both from cams, so skipping the
                # exposure writeback would discard its progress
                n = int(wts.sum())
                ki = jnp.asarray(np.asarray(idx)[:n])
                self.cams = dataclasses.replace(
                    self.cams,
                    w2c=self.cams.w2c.at[ki].set(w2c[:n]),
                    exposure_a=self.cams.exposure_a.at[ki].set(
                        exposure["a"][:n]),
                    exposure_b=self.cams.exposure_b.at[ki].set(
                        exposure["b"][:n]))
            if stop_rel > 0.0:
                cur = float(loss)
                if prev_loss is not None and \
                        abs(prev_loss - cur) <= stop_rel * max(
                            abs(prev_loss), 1e-12):
                    break  # plateaued: remaining segments are no-ops
                prev_loss = cur
            if s < n_segs - 1:
                # arena writeback before EVERY yield: between slices the
                # tracker may render/evaluate against self.arena
                self._write_back(arena_b, adam_b)
                yield float(loss)
        self._write_back(arena_b, adam_b)
        yield float(loss)

    def pose_refine(self, idx: int):
        """Refine one view's pose; returns (pointmap, valid) for seeding."""
        image = self.cams.image[idx].astype(jnp.float32) / 255.0
        depth_gt = self.cams.depth[idx].astype(jnp.float32)
        arena_b = self.arena.slice_prefix(self._live_bucket())
        new_w2c, gt_scaled, pointmap, valid = self._pose_refine(
            arena_b.params(), arena_b.alive, image, depth_gt,
            self.cams.w2c[idx])
        self.cams = dataclasses.replace(
            self.cams,
            w2c=self.cams.w2c.at[idx].set(new_w2c),
            depth=self.cams.depth.at[idx].set(gt_scaled.astype(jnp.bfloat16)))
        ds = self.cfg.downsample
        return pointmap[::ds, ::ds], valid[::ds, ::ds]

    def pose_refine_multi(self, idxs: List[int]):
        """Refine several views' poses in ONE batched program (their
        initial poses must already be chained/consistent — see run()'s
        parallel_kf_refine path). Returns downsampled (pointmaps, valids)
        stacked over views, like pose_refine per view."""
        ki = jnp.asarray(np.asarray(idxs, np.int32))
        images = self.cams.image[ki].astype(jnp.float32) / 255.0
        depth_gts = self.cams.depth[ki].astype(jnp.float32)
        arena_b = self.arena.slice_prefix(self._live_bucket())
        new_w2c, gt_scaled, pointmaps, valids = self._pose_refine_batch(
            arena_b.params(), arena_b.alive, images, depth_gts,
            self.cams.w2c[ki])
        self.cams = dataclasses.replace(
            self.cams,
            w2c=self.cams.w2c.at[ki].set(new_w2c),
            depth=self.cams.depth.at[ki].set(
                gt_scaled.astype(jnp.bfloat16)))
        ds = self.cfg.downsample
        return pointmaps[:, ::ds, ::ds], valids[:, ::ds, ::ds]

    def global_ba(self, total_iters: int, densify: bool = True):
        for _ in self.global_ba_steps(total_iters, densify):
            pass

    def global_ba_steps(self, total_iters: int, densify: bool = True):
        """``total_iters`` counts VIEW RENDERS (the reference's iteration
        unit); with gba_views_per_iter = k > 1 each solver step consumes
        k of them, so the Gaussian Adam step count drops k-fold while
        per-view pose/exposure updates stay per-render.

        GENERATOR yielding after each compiled segment (like
        optimization_steps); global_ba() drains."""
        view_ids = [i for i in range(self.cfg.cam_capacity)
                    if bool(self.cams.valid[i])]
        if not view_ids or total_iters <= 0:
            return
        k_batch = max(1, min(self.cfg.gba_views_per_iter, len(view_ids)))
        if self.mesh is not None:
            # keep the sharded batch axis a device multiple (pad by
            # repeats would double-count a view's pose update; shrink
            # instead — only matters when views < devices at startup)
            n_dev = dict(self.mesh.shape).get("mv", 1)
            if k_batch % n_dev != 0:
                k_batch = max(n_dev if len(view_ids) >= n_dev else 1,
                              (k_batch // n_dev) * n_dev)
            if k_batch > len(view_ids):
                k_batch = 1
        seg = self.cfg.gba_segment
        m = max(1, self.cfg.gba_resample_every)
        n_steps = max(1, (total_iters + k_batch - 1) // k_batch)
        blocks_per_seg = max(1, seg // m)
        n_blocks = max(1, (n_steps + m - 1) // m)
        n_segs = max(1, (n_blocks + blocks_per_seg - 1) // blocks_per_seg)
        ids = jnp.asarray(view_ids, jnp.int32)
        for s in range(n_segs):
            self._rng, k1, k2 = jax.random.split(self._rng, 3)
            keys = jax.random.split(k1, blocks_per_seg)
            vi = jax.vmap(lambda kk: jax.random.choice(
                kk, ids, shape=(k_batch,), replace=False))(keys)
            arena_b, adam_b = self._sliced(self._live_bucket())
            arena_b, adam_b, w2c_all, expa_all, expb_all, _ = \
                self._gba_segment(arena_b, adam_b, self.cams, vi, k2)
            self._write_back(arena_b, adam_b)
            # joint pose+exposure writeback (reference update_pose per iter)
            self.cams = dataclasses.replace(
                self.cams, w2c=w2c_all, exposure_a=expa_all,
                exposure_b=expb_all)
            if densify and (s == max(n_segs // 2 - 1, 0)):
                self._rng, k3 = jax.random.split(self._rng)
                self.arena = densify_and_prune(
                    self.arena, k3,
                    max_grad=self.cfg.densify_grad_threshold,
                    min_opacity=self.cfg.opacity_threshold)
                m, v, t = self.adam
                dead = ~self.arena.alive

                def _mask(x):
                    return jnp.where(
                        dead.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x)
                self.adam = (jax.tree.map(_mask, m), jax.tree.map(_mask, v), t)
            yield s

    def gaussian_update(self, submap_ids, pose_updates, camera_idx,
                        camera_w2c):
        """Loop-closure writeback: move Gaussians + update cam poses."""
        for k, w2c in zip(camera_idx, camera_w2c):
            if bool(self.cams.valid[k]):
                self.cams = dataclasses.replace(
                    self.cams, w2c=self.cams.w2c.at[k].set(jnp.asarray(w2c)))
        self.arena, self.adam = self._lc_transform(
            self.arena, self.adam, jnp.asarray(submap_ids, jnp.int32),
            jnp.asarray(pose_updates, jnp.float32))
        for k in camera_idx:
            if bool(self.cams.valid[k]):
                self.pose_refine(int(k))

    def data_update(self, window: List[int]):
        """Return refined depths/pointmaps/poses for tracker writeback.

        One padded batched render (pad with window[0] so every call at
        any tail-window length shares the full-window program) and one
        readback, instead of 3 readbacks per view."""
        arena_b = self.arena.slice_prefix(self._live_bucket())
        V = len(window)
        W_SIZE = self.cfg.window_size
        ki = np.asarray((list(window) + [window[0]] * W_SIZE)[:W_SIZE],
                        np.int32)
        d, c = self._render_for_update_batch(arena_b, self.cams,
                                             jnp.asarray(ki))
        d, c = np.asarray(d)[:V], np.asarray(c)[:V]
        # host unprojection (same math as depth_to_pointmap with c2w)
        fx, fy, cx, cy = np.asarray(self.K4)
        gy, gx = np.meshgrid(np.arange(d.shape[1], dtype=np.float32),
                             np.arange(d.shape[2], dtype=np.float32),
                             indexing="ij")
        X = (gx[None] - cx) / fx * d
        Y = (gy[None] - cy) / fy * d
        pts = np.stack([X, Y, d], axis=-1)
        p = np.einsum("vij,vhwj->vhwi", c[:, :3, :3], pts) \
            + c[:, None, None, :3, 3]
        return {"depths": d, "pointmaps": p,
                "c2w": c, "window": list(window)}

    # ------------------------------------------------------------------
    def _timed_steps(self, stage: str, gen):
        """Drive a sub-generator one slice at a time, timing each slice
        under ``stage`` WITHOUT the timer spanning the yielded-out
        period (the caller may run tracking frames between slices)."""
        while True:
            with self._tm(stage):
                try:
                    v = next(gen)
                except StopIteration:
                    return
            yield v

    def run(self, packet: Dict, iterations: int = 100):
        """Per-submap mapping update, drained in one stop-the-world call
        (the reference's behavior). See run_steps for the sliced form."""
        gen = self.run_steps(packet, iterations)
        while True:
            try:
                next(gen)
            except StopIteration as e:
                return e.value

    def run_steps(self, packet: Dict, iterations: int = 100):
        """Per-submap mapping update (gs_backend_per_frame.py:776-862).

        GENERATOR: yields after each bounded slice of device work (a KF
        pose refinement, an optimization segment, a global-BA segment)
        and RETURNS the data_update dict. SLAMSystem's interleaved
        scheduler (Mapping.interleave > 0) steps a few slices per
        tracking frame so one submap's mapping no longer stops the world
        (the reference amortizes the same way by running the mapper in a
        separate asynchronous process, hi2.py:56-99)."""
        viz_idx = list(packet["viz_idx"])
        imgs = packet["images"]          # (V, H, W, 3) uint8 mapping res
        depths = packet["depths"]        # (V, H, W) float
        pointmaps = packet["pointmaps"]  # (V, h, w, 3) half-res world
        confs = packet["confs"]          # (V, h, w)
        w2cs = packet["w2c"]             # (V, 4, 4)
        submap_idx = int(packet["submap_idx"])
        ds = self.cfg.downsample

        new_pos = [i for i, idx in enumerate(viz_idx)
                   if not bool(self.cams.valid[idx])]
        if (self.initialized and self.cfg.parallel_kf_refine
                and len(new_pos) > 1):
            # ---- batched path (VERDICT r3 #3): refine ALL new KFs in
            # one program, then one joint window optimization ----------
            # Initial poses chain through the PREDECESSOR like the
            # sequential loop, except a predecessor that is itself new
            # this call contributes its INIT pose (its refinement hasn't
            # happened yet — the joint window optimization afterwards
            # re-couples the poses; parity vs sequential is tested in
            # tests/test_parallel_mapping.py).
            init_w2c = {}
            for i in new_pos:
                idx = viz_idx[i]
                w2c = w2cs[i]
                if i > 0:
                    prev_i = i - 1
                    prev = viz_idx[prev_i]
                    rel = w2cs[i] @ np.linalg.inv(w2cs[prev_i])
                    base = (init_w2c[prev_i] if prev_i in init_w2c
                            else np.asarray(self.cams.w2c[prev]))
                    w2c = rel @ base
                init_w2c[i] = w2c
                self.add_keyframe(idx, imgs[i], depths[i], w2c)
            new_idxs = [viz_idx[i] for i in new_pos]
            with self._tm("map_refine"):
                pms, vals = self.pose_refine_multi(new_idxs)
            yield "refine"
            with self._tm("map_seed"):
                # ONE readback for the whole batch's pointmaps/valids
                # (per-view np.asarray paid a 26 ms tunnel RTT each)
                pms_np = np.asarray(pms)
                vals_np = np.asarray(vals)
                for j, i in enumerate(new_pos):
                    idx = viz_idx[i]
                    rgb_ds = imgs[i][::ds, ::ds].astype(np.float32) / 255.0
                    self.seed(idx, pms_np[j], rgb_ds,
                              vals_np[j] > 0, submap_idx)
                    if len(self.current_window) < self.cfg.window_size:
                        self.current_window = self.current_window + [idx]
                    else:
                        self.current_window = self.current_window[1:] + [idx]
            yield "seed"
            # same per-KF iteration budget as the sequential loop
            yield from self._timed_steps(
                "map_window",
                self.optimization_steps(
                    self.cfg.window_opt_iters * len(new_pos),
                    self.current_window))
            if self.cfg.new_view_opt_iters > 0:
                # the sequential path polishes each new KF V=1 in turn;
                # jointly the new KFs form one small window (same math:
                # per-view losses are independent, optimize_pose=False)
                yield from self._timed_steps(
                    "map_polish",
                    self.optimization_steps(self.cfg.new_view_opt_iters,
                                            new_idxs,
                                            optimize_pose=False))
            n_views = int(np.sum(np.asarray(self.cams.valid)))
            yield from self._timed_steps(
                "map_gba",
                self.global_ba_steps(self.cfg.gba_per_view * n_views,
                                     densify=True))
            with self._tm("map_update"):
                return self.data_update(self.current_window)

        for i, idx in enumerate(viz_idx):
            if bool(self.cams.valid[idx]):
                continue
            w2c = w2cs[i]
            if i > 0:
                # chain through the refined previous pose (:810-814)
                prev = viz_idx[i - 1]
                rel = w2cs[i] @ np.linalg.inv(w2cs[i - 1])
                w2c = rel @ np.asarray(self.cams.w2c[prev])
            self.add_keyframe(idx, imgs[i], depths[i], w2c)

            if not self.initialized:
                rgb_ds = imgs[i][::ds, ::ds].astype(np.float32) / 255.0
                with self._tm("map_seed"):
                    self.seed(idx, pointmaps[i], rgb_ds, confs[i] > 0.0,
                              submap_idx)
                self.current_window = [idx]
                yield from self._timed_steps(
                    "map_window",
                    self.optimization_steps(iterations,
                                            self.current_window))
                self.initialized = True
            else:
                if len(self.current_window) < self.cfg.window_size:
                    self.current_window = self.current_window + [idx]
                else:
                    self.current_window = self.current_window[1:] + [idx]
                with self._tm("map_refine"):
                    pointmap, valid = self.pose_refine(idx)
                yield "refine"
                rgb_ds = imgs[i][::ds, ::ds].astype(np.float32) / 255.0
                with self._tm("map_seed"):
                    self.seed(idx, np.asarray(pointmap), rgb_ds,
                              np.asarray(valid) > 0, submap_idx)
                yield from self._timed_steps(
                    "map_window",
                    self.optimization_steps(self.cfg.window_opt_iters,
                                            self.current_window))
                if self.cfg.new_view_opt_iters > 0:
                    yield from self._timed_steps(
                        "map_polish",
                        self.optimization_steps(
                            self.cfg.new_view_opt_iters,
                            [self.current_window[-1]],
                            optimize_pose=False))

        n_views = int(np.sum(np.asarray(self.cams.valid)))
        yield from self._timed_steps(
            "map_gba",
            self.global_ba_steps(self.cfg.gba_per_view * n_views,
                                 densify=True))
        with self._tm("map_update"):
            return self.data_update(self.current_window)

    def finalize(self, iters: int = 2000):
        self.global_ba(iters, densify=True)

    # ------------------------------------------------------------------
    # checkpointing (gaussian_model.py:107-144 capture/restore +
    # gs_backend_per_frame.py:1073-1093 save/load)
    # ------------------------------------------------------------------
    def save(self, path: str):
        import numpy as _np
        import os as _os
        _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
        def to_np(v):
            # numpy can't round-trip bfloat16 through npz (saves as void)
            if hasattr(v, "dtype") and v.dtype == jnp.bfloat16:
                return _np.asarray(v.astype(jnp.float32))
            return _np.asarray(v)

        arena_np = {f"arena_{k}": to_np(v)
                    for k, v in dataclasses.asdict(self.arena).items()}
        cams_np = {f"cams_{k}": to_np(v)
                   for k, v in dataclasses.asdict(self.cams).items()}
        m, v, t = self.adam
        adam_np = {f"adam_m_{k}": _np.asarray(x) for k, x in m.items()}
        adam_np.update({f"adam_v_{k}": _np.asarray(x) for k, x in v.items()})
        adam_np["adam_t"] = _np.asarray(t)
        _np.savez_compressed(path, window=_np.asarray(self.current_window),
                             initialized=_np.asarray(self.initialized),
                             **arena_np, **cams_np, **adam_np)

    def load(self, path: str):
        import numpy as _np
        z = _np.load(path)
        self.arena = GaussianArena(**{
            k: jnp.asarray(z[f"arena_{k}"])
            for k in dataclasses.asdict(self.arena)})
        cams_kw = {k: jnp.asarray(z[f"cams_{k}"])
                   for k in dataclasses.asdict(self.cams)}
        cams_kw["depth"] = cams_kw["depth"].astype(jnp.bfloat16)
        self.cams = CameraBuffer(**cams_kw)
        keys = list(self.arena.params())
        self.adam = ({k: jnp.asarray(z[f"adam_m_{k}"]) for k in keys},
                     {k: jnp.asarray(z[f"adam_v_{k}"]) for k in keys},
                     jnp.asarray(z["adam_t"]))
        self.current_window = [int(x) for x in z["window"]]
        self.initialized = bool(z["initialized"])

    def eval_view(self, idx: int):
        """PSNR for one keyframe (eval_utils.py:14-105 core metric)."""
        out = self._render_for_update(self.arena, self.cams, jnp.int32(idx))
        # render once more for color via the optimize path
        params = self.arena.params()
        img = render_view(params, self.arena.alive, self.cams.w2c[idx],
                          self.K4, self.raster_cfg)["color"]
        gt = np.asarray(self.cams.image[idx], np.float32) / 255.0
        mse = float(np.mean((np.asarray(img) - gt) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))
