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

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_retr
from ..geometry.projective import projective_transform

__all__ = ["bundle_adjust", "moba", "jdsa", "schur_solve", "block_solve"]


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


def _bilinear_upsample_with_jacobian(scales: jax.Array, ht: int, wd: int):
    """Per-frame low-res scale grid -> full-res multiplier + Jacobian.

    scales: (M, hs, ws). Returns (vals (M, ht, wd),
    J (ht*wd, hs*ws) bilinear weights — shared across frames).
    Replaces droid_backends.bi_inter (geom/ba.py:167).
    """
    M, hs, ws = scales.shape
    gy = jnp.linspace(0, hs - 1 - 1e-6, ht)
    gx = jnp.linspace(0, ws - 1 - 1e-6, wd)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    fy = (gy - y0)[:, None]
    fx = (gx - x0)[None, :]
    y1 = jnp.clip(y0 + 1, 0, hs - 1)
    x1 = jnp.clip(x0 + 1, 0, ws - 1)

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    vals = (scales[:, y0[:, None], x0[None, :]] * w00
            + scales[:, y0[:, None], x1[None, :]] * w01
            + scales[:, y1[:, None], x0[None, :]] * w10
            + scales[:, y1[:, None], x1[None, :]] * w11)

    # dense Jacobian (ht*wd, hs*ws): 4 weights per row
    rows = jnp.arange(ht * wd)
    yy0 = jnp.repeat(y0, wd)
    xx0 = jnp.tile(x0, ht)
    yy1 = jnp.repeat(y1, wd)
    xx1 = jnp.tile(x1, ht)
    J = jnp.zeros((ht * wd, hs * ws))
    J = J.at[rows, yy0 * ws + xx0].add(w00.reshape(-1))
    J = J.at[rows, yy0 * ws + xx1].add(w01.reshape(-1))
    J = J.at[rows, yy1 * ws + xx0].add(w10.reshape(-1))
    J = J.at[rows, yy1 * ws + xx1].add(w11.reshape(-1))
    return vals, J


@partial(jax.jit, static_argnames=())
def jdsa(target: jax.Array, weight: jax.Array, eta: jax.Array,
         poses: jax.Array, disps: jax.Array, intrinsics: jax.Array,
         disps_prior: jax.Array, dscales: jax.Array, ii: jax.Array,
         jj: jax.Array, edge_valid: jax.Array, alpha: float = 0.01):
    """Joint Depth & Scale Adjustment (geom/ba.py:161-241).

    Fuses mono-prior disparities (scaled by per-frame low-res grids
    ``dscales`` (P, hs, ws), bilinearly upsampled) with the depth-only BA
    system: C/w come from the projective residuals (the
    droid_backends.proj_trans fusion), the prior term couples each frame's
    disparity map to its scale grid through a Schur solve.

    Returns (disps, dscales, dzcov).
    """
    P0, ht, wd = disps.shape
    HW = ht * wd
    hs, ws = dscales.shape[-2:]
    Dg = hs * ws

    # --- depth-only BA coefficients (proj_trans equivalent) ---
    coords, valid, (_, _, Jz) = projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True)
    r = (target - coords) * valid * edge_valid[:, None, None, None]
    w = 0.001 * (valid * weight) * edge_valid[:, None, None, None]
    Jz2 = Jz.reshape(1, ii.shape[0], HW, 2)
    w2 = w.reshape(1, ii.shape[0], HW, 2)
    r2 = r.reshape(1, ii.shape[0], HW, 2)
    Ck = jnp.sum(w2 * Jz2 * Jz2, axis=-1)
    wk = jnp.sum(w2 * r2 * Jz2, axis=-1)
    C = _scatter_vec(Ck, ii, P0)[0]   # (P0, HW)
    wv = _scatter_vec(wk, ii, P0)[0]

    # --- prior residuals ---
    m = (disps_prior > 0).astype(jnp.float32).reshape(P0, HW)
    vals, Jbi = _bilinear_upsample_with_jacobian(dscales, ht, wd)
    disps_bi = disps_prior * vals
    rd = (disps - disps_bi).reshape(P0, HW)
    # d(rd)/d(scale grid) = -prior * Jbi
    Jso = -(m * disps_prior.reshape(P0, HW))[:, :, None] * Jbi[None]

    aw = alpha
    Hs = jnp.einsum("mpa,mpb->mab", Jso * aw, Jso)  # (P0, Dg, Dg)
    Es = (Jso * aw).swapaxes(1, 2)                   # (P0, Dg, HW)
    vs = -jnp.einsum("mpa,mp->ma", Jso * aw, rd)

    C = C + m * aw + (1 - m) * eta.reshape(P0, HW) + 1e-7
    wv = wv - m * aw * rd

    # block-diagonal Schur (each frame independent in the prior term)
    Hd = jnp.zeros((1, P0, P0, Dg, Dg)).at[:, jnp.arange(P0),
                                           jnp.arange(P0)].set(Hs[None])
    Ed = jnp.zeros((1, P0, P0, Dg, HW)).at[:, jnp.arange(P0),
                                           jnp.arange(P0)].set(Es[None])
    dso, dz, dzcov = schur_solve(Hd, Ed, C[None], vs[None], wv[None])

    new_disps = disps + dz[0].reshape(P0, ht, wd)
    new_disps = jnp.where(new_disps > 10, 0.0, new_disps)
    new_disps = jnp.clip(new_disps, 0.001)
    new_dscales = dscales + dso[0].reshape(P0, hs, ws)
    return new_disps, new_dscales, dzcov


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
