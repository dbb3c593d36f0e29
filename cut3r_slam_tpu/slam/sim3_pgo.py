"""Sim(3) pose-graph bundle adjustment.

Counterpart of /root/reference/hislam2/pgo_buffer.py (PGOBuffer +
global_relative_posesim3_constraints): accumulate relative SE(3)
constraints with covariances between keyframes, search loop candidates by
flow distance + orientation gate, and refine absolute Sim(3) poses by
Gauss-Newton over the constraint graph. The reference differentiates
numerically (pgo_buffer.py:19-36 central differences); here the residual
Jacobians come from `jax.jacfwd` over the sim3 retraction — same
semantics, exact derivatives.
"""
from __future__ import annotations

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.lie import (sim3_exp, sim3_log, sim3_mul, sim3_inv,
                            se3_mul, se3_inv)

__all__ = ["Sim3PGO", "sim3_pgo_solve", "sim3_pgo_solve_dense",
           "PGBABuffer"]


def _residual(g_all, ii, jj, rel_meas):
    """Per-edge residual: log(meas^{-1} * g_i^{-1} * g_j) in sim(3)."""
    gi = g_all[ii]
    gj = g_all[jj]
    pred = sim3_mul(sim3_inv(gi), gj)
    return sim3_log(sim3_mul(sim3_inv(rel_meas), pred))


def _edge_jacobians(g_all, ii, jj, rel_meas):
    """Per-edge residual + (7, 14) Jacobian wrt the edge's two local
    sim(3) perturbations — vmapped over edges, cost linear in E."""
    def r_local(xi2, gi, gj, meas):
        gi2 = sim3_mul(sim3_exp(xi2[:7]), gi)
        gj2 = sim3_mul(sim3_exp(xi2[7:]), gj)
        pred = sim3_mul(sim3_inv(gi2), gj2)
        return sim3_log(sim3_mul(sim3_inv(meas), pred))

    z14 = jnp.zeros(14)

    def one(gi, gj, meas):
        r = r_local(z14, gi, gj, meas)
        J = jax.jacfwd(r_local)(z14, gi, gj, meas)
        return r, J

    return jax.vmap(one)(g_all[ii], g_all[jj], rel_meas)


@partial(jax.jit, static_argnames=("iters", "fixed"))
def sim3_pgo_solve(poses_sim3: jax.Array, ii: jax.Array, jj: jax.Array,
                   rel_meas: jax.Array, weights: jax.Array,
                   iters: int = 10, fixed: int = 1,
                   damping: float = 1e-4) -> jax.Array:
    """Gauss-Newton Sim(3) PGO with block-sparse normal equations.

    poses_sim3: (N, 8) absolute Sim3 [t, q xyzw, s]; ii/jj: (E,) edges;
    rel_meas: (E, 8) measured relative Sim3 (frame i -> j);
    weights: (E,) per-edge confidence. First ``fixed`` poses pinned.

    The Hessian is assembled by scatter-adding per-edge 7x7 blocks
    (cost linear in E, like ops/ba.py), not by a dense jacfwd over all
    N*7 variables; only the final solve touches the (N*7)^2 system.
    Matches ``sim3_pgo_solve_dense`` to float tolerance
    (tests/test_sim3_pgo.py).

    Returns refined (N, 8).
    """
    N = poses_sim3.shape[0]
    D = 7

    def gn_step(g_all, _):
        r, J = _edge_jacobians(g_all, ii, jj, rel_meas)   # (E,7), (E,7,14)
        # fixed poses: their perturbation columns are identically zero
        Ji = J[..., :D] * (ii >= fixed)[:, None, None]
        Jj = J[..., D:] * (jj >= fixed)[:, None, None]
        w = weights[:, None, None]
        Hb = jnp.zeros((N, N, D, D))
        Hb = Hb.at[ii, ii].add(w * jnp.einsum("eri,erj->eij", Ji, Ji))
        Hb = Hb.at[ii, jj].add(w * jnp.einsum("eri,erj->eij", Ji, Jj))
        Hb = Hb.at[jj, ii].add(w * jnp.einsum("eri,erj->eij", Jj, Ji))
        Hb = Hb.at[jj, jj].add(w * jnp.einsum("eri,erj->eij", Jj, Jj))
        b = jnp.zeros((N, D))
        wr = weights[:, None] * r
        b = b.at[ii].add(-jnp.einsum("erd,er->ed", Ji, wr))
        b = b.at[jj].add(-jnp.einsum("erd,er->ed", Jj, wr))
        H = Hb.transpose(0, 2, 1, 3).reshape(N * D, N * D) \
            + damping * jnp.eye(N * D)
        dx = jnp.linalg.solve(H, b.reshape(-1)).reshape(N, D)
        dx = dx.at[:fixed].set(0.0)
        return sim3_mul(sim3_exp(dx), g_all), jnp.sum(weights * (r * r).sum(-1))

    g, costs = jax.lax.scan(gn_step, poses_sim3, None, length=iters)
    return g


@partial(jax.jit, static_argnames=("iters", "fixed"))
def sim3_pgo_solve_dense(poses_sim3: jax.Array, ii: jax.Array,
                         jj: jax.Array, rel_meas: jax.Array,
                         weights: jax.Array, iters: int = 10,
                         fixed: int = 1,
                         damping: float = 1e-4) -> jax.Array:
    """Reference dense-jacfwd formulation (kept as the parity oracle for
    the block-sparse assembly above; O(N^2) memory — small N only)."""
    N = poses_sim3.shape[0]
    D = 7

    def gn_step(g_all, _):
        def r_of_xi(xi_flat):
            xi = xi_flat.reshape(N, D)
            xi = xi.at[:fixed].set(0.0)
            g = sim3_mul(sim3_exp(xi), g_all)
            return _residual(g, ii, jj, rel_meas).reshape(-1)

        r0 = r_of_xi(jnp.zeros(N * D))
        J = jax.jacfwd(r_of_xi)(jnp.zeros(N * D))  # (E*7, N*7)
        w = jnp.repeat(weights, D)
        JtW = J.T * w[None, :]
        H = JtW @ J + damping * jnp.eye(N * D)
        b = -JtW @ r0
        dx = jnp.linalg.solve(H, b).reshape(N, D)
        dx = dx.at[:fixed].set(0.0)
        return sim3_mul(sim3_exp(dx), g_all), jnp.sum(w * r0 * r0)

    g, costs = jax.lax.scan(gn_step, poses_sim3, None, length=iters)
    return g


class Sim3PGO:
    """Constraint accumulator + solver (PGOBuffer.spin semantics)."""

    def __init__(self, max_frames: int = 512):
        self.max_frames = max_frames
        self.ii: List[int] = []
        self.jj: List[int] = []
        self.rel: List[np.ndarray] = []
        self.w: List[float] = []

    def add_relative_se3(self, i: int, j: int, rel_se3: np.ndarray,
                         weight: float = 1.0):
        """Store an SE(3) constraint as Sim3 with unit scale
        (pgo_buffer.py:39-62 add_rel_poses)."""
        rel = np.concatenate([np.asarray(rel_se3, np.float32),
                              np.ones(1, np.float32)])
        self.ii.append(i)
        self.jj.append(j)
        self.rel.append(rel)
        self.w.append(weight)

    def add_sequential_constraints(self, poses_se3: np.ndarray,
                                   weight: float = 1.0):
        """Odometry edges between consecutive keyframes."""
        import jax.numpy as jnp
        for i in range(len(poses_se3) - 1):
            rel = np.asarray(se3_mul(se3_inv(jnp.asarray(poses_se3[i])),
                                     jnp.asarray(poses_se3[i + 1])))
            self.add_relative_se3(i, i + 1, rel, weight)

    def loop_candidates(self, positions: np.ndarray, z_axes: np.ndarray,
                        current: int, dist_thresh: float = 0.5,
                        angle_thresh: float = 0.7,
                        temporal_gap: int = 20) -> np.ndarray:
        """Flow-distance + orientation gate (pgo_buffer.py:180-196)."""
        d = np.linalg.norm(positions - positions[current], axis=1)
        cos = (z_axes @ z_axes[current]) / np.maximum(
            np.linalg.norm(z_axes, axis=1)
            * np.linalg.norm(z_axes[current]), 1e-8)
        idx = np.arange(len(positions))
        m = (d < dist_thresh) & (cos > angle_thresh) \
            & (np.abs(idx - current) > temporal_gap)
        return idx[m]

    def solve(self, poses_se3: np.ndarray, iters: int = 10,
              fixed: int = 1) -> np.ndarray:
        """Refine absolute poses; returns (N, 8) Sim3."""
        n = len(poses_se3)
        g0 = np.concatenate([np.asarray(poses_se3, np.float32),
                             np.ones((n, 1), np.float32)], axis=1)
        if not self.ii:
            return g0
        return np.asarray(sim3_pgo_solve(
            jnp.asarray(g0), jnp.asarray(self.ii, jnp.int32),
            jnp.asarray(self.jj, jnp.int32),
            jnp.asarray(np.stack(self.rel)),
            jnp.asarray(self.w, jnp.float32), iters=iters, fixed=fixed))


class PGBABuffer:
    """Live-path Sim(3) PGBA (pgo_buffer.py:65-216 semantics, single
    controller): accumulate odometry constraints as the frontend tracks
    keyframes, add loop constraints when the loop backend fires, and
    refine all keyframe poses with the Gauss-Newton Sim(3) solver.

    Shape discipline: pose count is padded to a multiple of 32 and the
    edge list to a multiple of 64 (zero-weight identity self-loops) so
    ``sim3_pgo_solve`` recompiles only across buckets.

    The reference weights constraints by BA-residual covariance
    (pgo_buffer.py:98-115). Here the default is odometry weight 1 /
    loop weight ``loop_weight``; with ``conf_weighting=True`` each edge
    is additionally scaled by the mean CUT3R confidence of its two
    keyframes' stored submap conf maps (conf = 1 - 1/c in [0,1)) — the
    closest per-edge uncertainty statistic the frontend already
    computes. tests/test_sim3_pgo.py ablates this on a synthetic loop.
    """

    def __init__(self, loop_weight: float = 2.0, iters: int = 6,
                 conf_weighting: bool = False):
        self.pgo = Sim3PGO()
        self.loop_weight = loop_weight
        self.iters = iters
        self.conf_weighting = conf_weighting
        self._odo_upto = 0  # sequential edges exist for [0, _odo_upto)

    def _kf_conf(self, kf, i: int) -> float:
        from .keyframe import SUBMAP_SIZE
        return float(jnp.mean(
            kf.submap_conf[i // SUBMAP_SIZE, i % SUBMAP_SIZE]))

    def _edge_weight(self, kf, i: int, j: int, base: float) -> float:
        if not self.conf_weighting:
            return base
        c = 0.5 * (self._kf_conf(kf, i) + self._kf_conf(kf, j))
        # conf in [0,1): map to a [0.25, 1.75) multiplier so confident
        # pairs dominate without zeroing low-conf odometry entirely
        return base * (0.25 + 1.5 * max(min(c, 1.0), 0.0))

    def on_new_keyframes(self, kf, upto: int):
        """Add odometry edges i->i+1 for newly tracked keyframes."""
        for i in range(max(self._odo_upto - 1, 0), upto - 1):
            rel = np.asarray(se3_mul(se3_inv(jnp.asarray(kf.pose[i])),
                                     jnp.asarray(kf.pose[i + 1])))
            self.pgo.add_relative_se3(
                i, i + 1, rel, self._edge_weight(kf, i, i + 1, 1.0))
        self._odo_upto = max(self._odo_upto, upto)

    def on_loop(self, matched: int, current: int, kf):
        """Add a loop-closure edge from the (LC-corrected) poses."""
        rel = np.asarray(se3_mul(se3_inv(jnp.asarray(kf.pose[matched])),
                                 jnp.asarray(kf.pose[current])))
        self.pgo.add_relative_se3(
            matched, current, rel,
            self._edge_weight(kf, matched, current, self.loop_weight))

    def solve_and_writeback(self, kf) -> np.ndarray:
        """Refine kf.pose[:count] in place; depths scale by each pose's
        Sim3 scale. Returns the (n, 8) refined Sim3 poses."""
        n = kf.count
        if n < 2 or not self.pgo.ii:
            return np.zeros((0, 8), np.float32)
        n_pad = ((n + 31) // 32) * 32
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32),
                        (n_pad, 1))
        poses[:n] = kf.pose[:n]
        ii = list(self.pgo.ii)
        jj = list(self.pgo.jj)
        rel = list(self.pgo.rel)
        w = list(self.pgo.w)
        e_pad = ((len(ii) + 63) // 64) * 64
        ident = np.array([0, 0, 0, 0, 0, 0, 1, 1], np.float32)
        while len(ii) < e_pad:
            ii.append(0)
            jj.append(0)
            rel.append(ident)
            w.append(0.0)
        g0 = np.concatenate([poses, np.ones((n_pad, 1), np.float32)], 1)
        g = np.asarray(sim3_pgo_solve(
            jnp.asarray(g0), jnp.asarray(ii, jnp.int32),
            jnp.asarray(jj, jnp.int32), jnp.asarray(np.stack(rel)),
            jnp.asarray(w, jnp.float32), iters=self.iters, fixed=1))
        kf.pose[:n] = g[:n, :7]
        scales = g[:n, 7]
        kf.depth[:n] *= scales[:, None, None]
        return g[:n]
