"""Dense bundle adjustment with Schur-complement Cholesky (DROID-style).

JAX counterpart of /root/reference/hislam2/geom/ba.py and geom/chol.py:
projective residuals + analytic Jacobians (geometry/projective.py) are
scatter-assembled into the block Hessian — pose-pose H, pose-depth E,
diagonal depth-depth C — with `segment_sum` replacing torch_scatter, then
solved by a damped Schur complement and dense Cholesky, followed by SE(3)
retraction and disparity retraction with the reference's clamping
(ba.py:100-106). Depth covariance comes from the same factorization
(chol.py:70-77).

Everything is shape-static: edge lists are fixed-capacity with a validity
mask, so the whole BA iteration jits once.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_retr
from ..geometry.projective import projective_transform

__all__ = ["bundle_adjust", "moba", "schur_solve", "block_solve"]


def _damp(H, ep=0.1, lm=1e-4):
    d = jnp.arange(H.shape[-1])
    return H.at[..., d, d].add(ep + lm * H[..., d, d])


def block_solve(H: jax.Array, b: jax.Array, ep=0.1, lm=1e-4) -> jax.Array:
    """(B, N, N, D, D), (B, N, D) -> (B, N, D) via damped Cholesky."""
    B, N, _, D, _ = H.shape
    Hf = H.transpose(0, 1, 3, 2, 4).reshape(B, N * D, N * D)
    Hf = _damp(Hf, ep, lm)
    bf = b.reshape(B, N * D)
    L = jnp.linalg.cholesky(Hf)
    x = jax.scipy.linalg.cho_solve((L, True), bf[..., None])
    x = jnp.where(jnp.isfinite(x), x, 0.0)  # chol.py:8-19 failure guard
    return x.reshape(B, N, D)


def schur_solve(H, E, C, v, w, ep=0.1, lm=1e-4,
                with_cov: bool = True):
    """Damped Schur-complement solve (chol.py:47-78).

    H (B,P,P,D,D), E (B,P,M,D,HW), C (B,M,HW), v (B,P,D), w (B,M,HW).
    Returns (dx (B,P,D), dz (B,M,HW)[, dzcov (M,HW)]).
    """
    B, P, M, D, HW = E.shape
    Hf = H.transpose(0, 1, 3, 2, 4).reshape(B, P * D, P * D)
    Ef = E.transpose(0, 1, 3, 2, 4).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW)
    Hf = _damp(Hf, ep, lm)
    vf = v.reshape(B, P * D)
    wf = w.reshape(B, M * HW)

    EQ = Ef * Q[:, None, :]
    S = Hf - EQ @ Ef.swapaxes(1, 2)
    rhs = vf - jnp.einsum("bpm,bm->bp", EQ, wf)

    L = jnp.linalg.cholesky(S)
    dx = jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]
    # failed factorization -> zero update, like the reference's
    # CholeskySolver exception guard (geom/chol.py:8-19)
    ok = jnp.isfinite(dx).all(axis=-1, keepdims=True)
    dx = jnp.where(ok, dx, 0.0)
    dz = Q * (wf - jnp.einsum("bpm,bp->bm", Ef, dx))
    dz = jnp.where(jnp.isfinite(dz), dz, 0.0)
    dxr = dx.reshape(B, P, D)
    dzr = dz.reshape(B, M, HW)
    if not with_cov:
        return dxr, dzr

    # depth covariance: diag(Q) + || L^{-1} E Q ||^2 columns (chol.py:74-77)
    Linv_EQ = jax.scipy.linalg.solve_triangular(L, EQ, lower=True)
    dzcov = jnp.sum(Linv_EQ * Linv_EQ, axis=1) + Q
    return dxr, dzr, dzcov.reshape(B, M, HW)[0]


def _scatter_mat(A, ii, jj, n, m):
    """(B, N, D1, D2) edge blocks -> (B, n*m, D1, D2) by (ii, jj) cell."""
    ok = (ii >= 0) & (jj >= 0) & (ii < n) & (jj < m)
    idx = jnp.where(ok, ii * m + jj, n * m)
    A = jnp.where(ok[None, :, None, None], A, 0.0)
    return jax.ops.segment_sum(A.swapaxes(0, 1), idx,
                               num_segments=n * m + 1)[:-1].swapaxes(0, 1)


def _scatter_vec(b, ii, n):
    ok = (ii >= 0) & (ii < n)
    idx = jnp.where(ok, ii, n)
    b = jnp.where(ok.reshape((1, -1) + (1,) * (b.ndim - 2)), b, 0.0)
    return jax.ops.segment_sum(b.swapaxes(0, 1), idx,
                               num_segments=n + 1)[:-1].swapaxes(0, 1)


@partial(jax.jit, static_argnames=("fixedp", "n_frames", "steps"))
def bundle_adjust(target: jax.Array, weight: jax.Array, eta: jax.Array,
                  poses: jax.Array, disps: jax.Array, intrinsics: jax.Array,
                  ii: jax.Array, jj: jax.Array, edge_valid: jax.Array,
                  fixedp: int = 1, n_frames: int = None, steps: int = 1):
    """Full BA (ba.py:32-107). poses: (P0, 7) w2c; disps: (P0, H, W);
    target/weight: (E, H, W, 2); ii/jj: (E,) with `edge_valid` mask;
    eta: (P0, H, W) damping. All depth variables are optimized (kx = all
    frames), matching the reference when every frame appears in ii.

    Returns (poses, disps, dzcov).
    """
    P0 = poses.shape[0] if n_frames is None else n_frames
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    D = 6
    E_n = ii.shape[0]
    P = P0 - fixedp

    def one_step(carry, _):
        poses, disps = carry
        coords, valid, (Ji, Jj, Jz) = projective_transform(
            poses, disps, intrinsics, ii, jj, jacobian=True)
        r = (target - coords) * valid * edge_valid[:, None, None, None]
        w = 0.001 * (valid * weight) * edge_valid[:, None, None, None]

        Jif = Ji.reshape(1, E_n, HW * 2, D)
        Jjf = Jj.reshape(1, E_n, HW * 2, D)
        rf = r.reshape(1, E_n, HW * 2, 1)
        wf = w.reshape(1, E_n, HW * 2, 1)
        wJiT = (wf * Jif).swapaxes(2, 3)
        wJjT = (wf * Jjf).swapaxes(2, 3)
        Jzf = Jz.reshape(1, E_n, ht * wd, 2)

        Hii = wJiT @ Jif
        Hij = wJiT @ Jjf
        Hji = wJjT @ Jif
        Hjj = wJjT @ Jjf
        vi = (wJiT @ rf)[..., 0]
        vj = (wJjT @ rf)[..., 0]

        Ei = (wJiT.reshape(1, E_n, D, HW, 2) * Jzf[:, :, None]).sum(-1)
        Ej = (wJjT.reshape(1, E_n, D, HW, 2) * Jzf[:, :, None]).sum(-1)
        w2 = wf.reshape(1, E_n, HW, 2)
        r2 = rf.reshape(1, E_n, HW, 2)
        wk = jnp.sum(w2 * r2 * Jzf, axis=-1)
        Ck = jnp.sum(w2 * Jzf * Jzf, axis=-1)

        iis = ii - fixedp
        jjs = jj - fixedp
        kk = ii  # depth variable of edge = source frame

        H = (_scatter_mat(Hii, iis, iis, P, P)
             + _scatter_mat(Hij, iis, jjs, P, P)
             + _scatter_mat(Hji, jjs, iis, P, P)
             + _scatter_mat(Hjj, jjs, jjs, P, P)).reshape(1, P, P, D, D)
        Em = (_scatter_mat(Ei.swapaxes(2, 3), iis, kk, P, P0)
              + _scatter_mat(Ej.swapaxes(2, 3), jjs, kk, P, P0))
        Em = Em.swapaxes(2, 3).reshape(1, P, P0, D, HW)
        v = _scatter_vec(vi, iis, P) + _scatter_vec(vj, jjs, P)
        C = _scatter_vec(Ck, kk, P0)
        wv = _scatter_vec(wk, kk, P0)
        C = C + eta.reshape(1, P0, HW) + 1e-7

        dx, dz, dzcov = schur_solve(H, Em, C, v, wv)

        new_poses = poses.at[fixedp:].set(
            se3_retr(poses[fixedp:], dx[0]))
        new_disps = disps + dz[0].reshape(P0, ht, wd)
        new_disps = jnp.where(new_disps > 10, 0.0, new_disps)
        new_disps = jnp.clip(new_disps, 0.001)
        return (new_poses, new_disps), dzcov

    (poses, disps), dzcov = jax.lax.scan(one_step, (poses, disps), None,
                                         length=steps)
    return poses, disps, dzcov[-1]


@partial(jax.jit, static_argnames=("fixedp", "steps"))
def moba(target: jax.Array, weight: jax.Array, poses: jax.Array,
         disps: jax.Array, intrinsics: jax.Array, ii: jax.Array,
         jj: jax.Array, edge_valid: jax.Array, fixedp: int = 1,
         steps: int = 1) -> jax.Array:
    """Motion-only BA (ba.py:110-158): depths fixed, pose-only solve."""
    P0 = poses.shape[0]
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    D = 6
    E_n = ii.shape[0]
    P = P0 - fixedp

    def one_step(poses, _):
        coords, valid, (Ji, Jj, _) = projective_transform(
            poses, disps, intrinsics, ii, jj, jacobian=True)
        r = (target - coords) * valid * edge_valid[:, None, None, None]
        w = 0.001 * (valid * weight) * edge_valid[:, None, None, None]

        Jif = Ji.reshape(1, E_n, HW * 2, D)
        Jjf = Jj.reshape(1, E_n, HW * 2, D)
        rf = r.reshape(1, E_n, HW * 2, 1)
        wf = w.reshape(1, E_n, HW * 2, 1)
        wJiT = (wf * Jif).swapaxes(2, 3)
        wJjT = (wf * Jjf).swapaxes(2, 3)

        iis = ii - fixedp
        jjs = jj - fixedp
        H = (_scatter_mat(wJiT @ Jif, iis, iis, P, P)
             + _scatter_mat(wJiT @ Jjf, iis, jjs, P, P)
             + _scatter_mat(wJjT @ Jif, jjs, iis, P, P)
             + _scatter_mat(wJjT @ Jjf, jjs, jjs, P, P)).reshape(1, P, P, D, D)
        v = _scatter_vec((wJiT @ rf)[..., 0], iis, P) \
            + _scatter_vec((wJjT @ rf)[..., 0], jjs, P)

        dx = block_solve(H, v)
        return poses.at[fixedp:].set(se3_retr(poses[fixedp:], dx[0])), None

    poses, _ = jax.lax.scan(one_step, poses, None, length=steps)
    return poses
