"""View-parallel Gaussian mapping over a device mesh.

The windowed mapping optimization (slam/mapping.py `optimize`, rebuilt
from /root/reference/hislam2/gs_backend_per_frame.py:451-594) renders
every window view per iteration. On one chip that is a sequential
`lax.scan` over views; on a slice (the BASELINE target is a v5e-8) the
views are embarrassingly parallel: the loss is a weighted SUM of
independent per-view render losses, so each device renders its shard of
the window and the Gaussian-parameter gradients are `psum`'d over ICI.

This module builds that SPMD program with `shard_map` over a mesh axis
``mv`` (mapping-views):

- Gaussian params / Adam moments / alive mask: replicated (`P()`); the
  arena is tens of MB, well under per-chip HBM.
- per-view arrays (images, depths, w2c, weights, pose deltas, exposure
  and their Adam moments): sharded on the leading view axis (`P("mv")`).
  The window is padded to a device multiple by REPEATING view 0 with
  weight 0 (zero-weight views contribute zero loss and zero grads but
  keep every lane's math finite).
- per iteration: local `value_and_grad` of the UNNORMALIZED shard loss
  (slam/mapping.py `window_loss_raw`), then one `psum` of the Gaussian
  grads + scalar loss/weight sums; pose/exposure grads stay device-local
  (their variables are per-view). Division by the GLOBAL weight sum
  reproduces the sequential `window_loss` normalization exactly, so the
  parallel and sequential paths agree to float tolerance
  (tests/test_parallel_mapping.py).

Math identity: sequential loss = (sum_i w_i l_i) / sum_i w_i; the shard
split is a reordering of the outer sum only.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 stable API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: the blend scan's replicated init carry meets
        # mv-varying chunk inputs; the varying-axis propagation check
        # rejects that mix even though the math is shard-local.
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # older experimental location
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

__all__ = ["make_parallel_optimize", "make_parallel_gba_batch",
           "make_parallel_pose_refine"]


def make_parallel_gba_batch(backend, mesh, axis: str = "mv"):
    """Mesh-parallel drop-in for ``MappingBackend._gba_batch`` (the
    per-iteration view batch of the global BA, VERDICT r3 #3): the view
    axis of the batch shards over ``axis``, each device renders + grads
    its local views, and the Gaussian-space reductions (summed grads,
    summed densification stats, max radii) ride ONE psum/pmax over ICI.
    Per-view outputs (losses, pose/exposure grads, w2c rows) stay
    sharded and concatenate back at the out_specs boundary. Exact same
    math as the sequential lax.map — the batch mean is associative —
    verified in tests/test_parallel_mapping.py.

    The host guarantees the batch size is a device multiple
    (MappingBackend.global_ba rounds gba_views_per_iter).
    """
    seq_batch = backend._gba_batch

    def local(params, alive, images_u8, depths, w2c_all, expa_all,
              expb_all, vi_local):
        (losses, gp_sum, ga_c, den_c, mr_c, gpes, w2cs) = seq_batch(
            params, alive, images_u8, depths, w2c_all, expa_all,
            expb_all, vi_local)
        gp_sum = jax.tree.map(lambda g: jax.lax.psum(g, axis), gp_sum)
        ga_c = jax.lax.psum(ga_c, axis)
        den_c = jax.lax.psum(den_c, axis)
        mr_c = jax.lax.pmax(mr_c, axis)
        return losses, gp_sum, ga_c, den_c, mr_c, gpes, w2cs

    def gba_batch(params, alive, images_u8, depths, w2c_all, expa_all,
                  expb_all, vi_batch, bins=None, gt_normals=None):
        # ``bins``/``gt_normals`` (the single-chip fused path's cached
        # block binning + hoisted gt normals) are not sharded here: each
        # device re-derives its local views' fresh — same slack contract
        # as compute_bins, marginally fresher entries
        del bins, gt_normals
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(axis)),
            out_specs=(P(axis), P(), P(), P(), P(), P(axis), P(axis)))
        return fn(params, alive, images_u8, depths, w2c_all, expa_all,
                  expb_all, vi_batch)

    return gba_batch


def make_parallel_pose_refine(backend, mesh, axis: str = "mv"):
    """Mesh-parallel drop-in for ``MappingBackend._pose_refine_batch``:
    a submap's new keyframes are INDEPENDENT single-view pose problems
    (no shared state is written during refinement), so the view axis
    shards over ``axis`` with params/alive replicated and ZERO
    collectives — pure data parallelism over ICI-free local work. Views
    pad to a device multiple by repeating view 0 (padded outputs are
    sliced off)."""
    inner = backend._pose_refine_impl
    n_dev = dict(mesh.shape)[axis]

    def local(params, alive, images, depth_gts, w2cs):
        return jax.lax.map(lambda xs: inner(params, alive, *xs),
                           (images, depth_gts, w2cs))

    @jax.jit
    def batch(params, alive, images, depth_gts, w2cs):
        V = images.shape[0]
        V_pad = -(-V // n_dev) * n_dev

        def _padv(x):
            if x.shape[0] == V_pad:
                return x
            reps = jnp.broadcast_to(x[:1],
                                    (V_pad - x.shape[0],) + x.shape[1:])
            return jnp.concatenate([x, reps], axis=0)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis))
        outs = fn(params, alive, _padv(images), _padv(depth_gts),
                  _padv(w2cs))
        return jax.tree.map(lambda x: x[:V], outs)

    return batch


def make_parallel_optimize(backend, mesh, axis: str = "mv"):
    """Return a drop-in replacement for ``MappingBackend._optimize`` that
    shards the window's views over ``mesh`` axis ``axis``.

    Same signature/returns as the sequential jit (slam/mapping.py):
    (arena, adam, cams, window_idx, weights, iters, optimize_pose,
    pd_adam, ex_adam) -> (params, adam, w2c, exposure, loss, pd_adam,
    ex_adam) with per-view outputs sliced back to window_size rows.
    """
    from ..slam.mapping import _adam_init, _adam_step, _mask_grads
    from ..slam.camera import se3_delta_to_matrix

    cfg = backend.cfg
    wl_raw = backend._window_loss_raw
    lrs_g = backend._lrs()
    lrs_pd = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}
    lrs_ex = {"a": cfg.exposure_lr, "b": cfg.exposure_lr}
    n_dev = dict(mesh.shape)[axis]
    W = cfg.window_size
    W_pad = -(-W // n_dev) * n_dev

    def _padv(x):
        """Pad the leading view axis to W_pad by repeating row 0 (always
        a valid camera) — padded rows carry weight 0."""
        if x.shape[0] == W_pad:
            return x
        reps = jnp.broadcast_to(x[:1], (W_pad - x.shape[0],) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    def _pad_moments(st):
        m, v, t = st
        return (jax.tree.map(_padv, m), jax.tree.map(_padv, v), t)

    # tree-prefix specs for an Adam tuple: sharded moments, replicated t
    adam_v_spec = (P(axis), P(axis), P())

    def run_impl(params, adam, pose_deltas, pd_adam, exposure, ex_adam,
                 alive, images, depths_gt, w2c, weights,
                 iters, optimize_pose):
        # one binning per local view per segment (see slam/mapping.py) —
        # shard-local: each device bins only its own window shard
        bins = backend._bin_window(params, alive, w2c)
        # gt normals are segment-invariant: hoisted out of the scan
        from ..geometry.pointmap import depth_to_normal
        gdns = jax.lax.map(lambda d: depth_to_normal(d, backend.K4),
                           depths_gt)

        def step(carry, _):
            (params, adam, pose_deltas, pd_adam, exposure, ex_adam,
             w2c) = carry
            (tot, _aux), grads = jax.value_and_grad(
                wl_raw, argnums=(0, 1, 2), has_aux=True)(
                params, pose_deltas, exposure, alive, images,
                depths_gt, w2c, weights, optimize_pose, bins, gdns)
            gp, gd, ge = grads
            wsum = jnp.maximum(jax.lax.psum(weights.sum(), axis), 1.0)
            loss = jax.lax.psum(tot, axis) / wsum
            gp = jax.tree.map(lambda g: jax.lax.psum(g, axis) / wsum, gp)
            gp = _mask_grads(gp, alive)
            params, adam = _adam_step(params, gp, adam, lrs_g)
            if optimize_pose:
                gd = jax.tree.map(lambda g: g / wsum, gd)
                pose_deltas, pd_adam = _adam_step(pose_deltas, gd,
                                                  pd_adam, lrs_pd)
                M = jax.vmap(se3_delta_to_matrix)(pose_deltas["t"],
                                                  pose_deltas["r"])
                w2c = jnp.einsum("vij,vjk->vik", M, w2c)
                pose_deltas = jax.tree.map(jnp.zeros_like, pose_deltas)
                if cfg.compensate_exposure:
                    ge = jax.tree.map(lambda g: g / wsum, ge)
                    exposure, ex_adam = _adam_step(exposure, ge,
                                                   ex_adam, lrs_ex)
            return (params, adam, pose_deltas, pd_adam, exposure,
                    ex_adam, w2c), loss

        carry = (params, adam, pose_deltas, pd_adam, exposure, ex_adam,
                 w2c)
        carry, losses = jax.lax.scan(step, carry, None, length=iters)
        params, adam, _, pd_adam, exposure, ex_adam, w2c = carry
        return params, adam, w2c, exposure, losses[-1], pd_adam, ex_adam

    @partial(jax.jit, static_argnames=("iters", "optimize_pose"))
    def optimize(arena, adam, cams, window_idx, weights, iters,
                 optimize_pose, pd_adam=None, ex_adam=None):
        params = arena.params()
        alive = arena.alive
        images = _padv(cams.image[window_idx].astype(jnp.float32) / 255.0)
        depths_gt = _padv(cams.depth[window_idx].astype(jnp.float32))
        w2c = _padv(cams.w2c[window_idx])
        weights = _padv(weights).at[W:].set(0.0)
        pose_deltas = {"t": jnp.zeros((W_pad, 3)),
                       "r": jnp.zeros((W_pad, 3))}
        exposure = {"a": _padv(cams.exposure_a[window_idx]),
                    "b": _padv(cams.exposure_b[window_idx])}
        pd_adam = (_adam_init(pose_deltas) if pd_adam is None
                   else _pad_moments(pd_adam))
        ex_adam = (_adam_init(exposure) if ex_adam is None
                   else _pad_moments(ex_adam))

        fn = shard_map(
            partial(run_impl, iters=iters, optimize_pose=optimize_pose),
            mesh=mesh,
            in_specs=(P(), (P(), P(), P()), P(axis), adam_v_spec,
                      P(axis), adam_v_spec, P(), P(axis), P(axis),
                      P(axis), P(axis)),
            out_specs=(P(), (P(), P(), P()), P(axis), P(axis), P(),
                       adam_v_spec, adam_v_spec))
        params, adam, w2c, exposure, loss, pd_adam, ex_adam = fn(
            params, adam, pose_deltas, pd_adam, exposure, ex_adam,
            alive, images, depths_gt, w2c, weights)
        # per-view outputs back at the sequential window_size layout
        exposure = jax.tree.map(lambda x: x[:W], exposure)
        return (params, adam, w2c[:W], exposure, loss,
                jax.tree.map(lambda x: x[:W] if hasattr(x, "ndim")
                             and x.ndim and x.shape[0] == W_pad else x,
                             pd_adam),
                jax.tree.map(lambda x: x[:W] if hasattr(x, "ndim")
                             and x.ndim and x.shape[0] == W_pad else x,
                             ex_adam))

    return optimize
