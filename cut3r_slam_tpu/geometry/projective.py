"""Pinhole projective geometry with analytic Jacobians.

TPU-native counterpart of the reference's DROID-style projective ops
(/root/reference/hislam2/geom/projective_ops.py and geom/pinhole.py): inverse
projection, projection, and the frame-to-frame ``projective_transform`` used
to build dense-BA residuals. Everything is batched `jnp`; Jacobians are
returned as dense per-pixel blocks ready for `segment_sum` Hessian assembly
(ops/ba.py).

Conventions: disparity parameterization (d = 1/Z) exactly like DROID; poses
are SE3 7-vectors (world-to-camera, composed as ``g_ij = g_j * g_i^{-1}``).
Intrinsics are ``[fx, fy, cx, cy]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .lie import se3_inv, se3_mul, se3_matrix

__all__ = ["iproj", "proj", "actp", "projective_transform", "coords_grid"]

MIN_DEPTH = 0.2


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Pixel coordinate grid (ht, wd, 2) with (x, y) order."""
    y = jnp.arange(ht, dtype=dtype)
    x = jnp.arange(wd, dtype=dtype)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def iproj(disps: jax.Array, intrinsics: jax.Array, jacobian: bool = False):
    """Inverse projection: disparity map -> homogeneous points X = (x, y, 1, d).

    disps: (..., H, W); intrinsics: (..., 4).
    Returns pts (..., H, W, 4) [and dX/dd (..., H, W, 4) if jacobian].
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, disps.dtype)
    x = (grid[..., 0] - cx) / fx
    y = (grid[..., 1] - cy) / fy
    ones = jnp.ones_like(disps)
    pts = jnp.stack([x * ones, y * ones, ones, disps], axis=-1)
    if jacobian:
        Jz = jnp.stack([jnp.zeros_like(disps)] * 3 + [ones], axis=-1)
        return pts, Jz
    return pts


def proj(Xs: jax.Array, intrinsics: jax.Array, jacobian: bool = False,
         return_depth: bool = False):
    """Pinhole projection of homogeneous points (..., H, W, 4) -> pixel coords.

    Matches the reference's clamped-depth projection: z is clamped away from
    zero via the MIN_DEPTH guard on 1/z.
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    X, Y, Z, D = Xs[..., 0], Xs[..., 1], Xs[..., 2], Xs[..., 3]
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if jacobian:
        B = jnp.zeros_like(d)
        # d(coords)/d(X4): rows = output dims, cols = (X, Y, Z, D)
        jrow_x = jnp.stack([fx * d, B, -fx * X * d * d, B], axis=-1)
        jrow_y = jnp.stack([B, fy * d, -fy * Y * d * d, B], axis=-1)
        if return_depth:
            jrow_z = jnp.stack([B, B, -D * d * d, d], axis=-1)
            Jp = jnp.stack([jrow_x, jrow_y, jrow_z], axis=-2)
        else:
            Jp = jnp.stack([jrow_x, jrow_y], axis=-2)
        return coords, Jp
    return coords


def actp(g_ij: jax.Array, X0: jax.Array, jacobian: bool = False):
    """Apply relative SE3 (..., 7) to homogeneous points (..., H, W, 4).

    X1 = (R x + d t, d). If jacobian, also return dX1/dxi (..., H, W, 4, 6)
    in the [tau, phi] tangent layout.
    """
    M = se3_matrix(g_ij)  # (..., 4, 4)
    R = M[..., :3, :3][..., None, None, :, :]
    t = M[..., :3, 3][..., None, None, :]
    p = X0[..., :3]
    d = X0[..., 3:]
    x1 = jnp.einsum("...ij,...j->...i", R, p) + d * t
    X1 = jnp.concatenate([x1, d], axis=-1)

    if jacobian:
        X, Y, Z = x1[..., 0], x1[..., 1], x1[..., 2]
        O = jnp.zeros_like(X)
        dd = d[..., 0]
        # generators of SE(3) acting on (X, Y, Z, d): translation scaled by d
        Ja = jnp.stack([
            jnp.stack([dd, O, O, O, Z, -Y], axis=-1),
            jnp.stack([O, dd, O, -Z, O, X], axis=-1),
            jnp.stack([O, O, dd, Y, -X, O], axis=-1),
            jnp.stack([O, O, O, O, O, O], axis=-1),
        ], axis=-2)
        return X1, Ja
    return X1


def projective_transform(poses: jax.Array, disps: jax.Array,
                         intrinsics: jax.Array, ii: jax.Array, jj: jax.Array,
                         jacobian: bool = False, return_depth: bool = False):
    """Map pixels of frames ``ii`` into frames ``jj``.

    poses: (N, 7) world-to-camera SE3; disps: (N, H, W);
    intrinsics: (N, 4) or (4,); ii/jj: (E,) edge index arrays.

    Returns coords (E, H, W, 2[+1]) and a validity mask (E, H, W, 1);
    with ``jacobian`` also (Ji, Jj, Jz): pose Jacobians (E, H, W, 2, 6) for
    frame i and j, and disparity Jacobian (E, H, W, 2, 1).
    """
    intr = intrinsics if intrinsics.ndim == 2 else jnp.broadcast_to(
        intrinsics, (poses.shape[0], 4))
    gi, gj = poses[ii], poses[jj]
    g_ij = se3_mul(gj, se3_inv(gi))  # (E, 7)

    X0, Jz0 = iproj(disps[ii], intr[ii], jacobian=True)
    X1, Ja = actp(g_ij, X0, jacobian=True)
    coords, Jp = proj(X1, intr[jj], jacobian=True, return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH))[..., None]
    valid = valid.astype(disps.dtype)

    if not jacobian:
        return coords, valid

    # chain rule: d(coords)/d(xi_j) through the j-frame perturbation
    Jj = jnp.einsum("...ij,...jk->...ik", Jp, Ja)
    # i-frame perturbation: adjoint — equal and opposite through g_ij
    # DROID uses Ji = -Jj transformed by the adjoint of g_ij; with the
    # residual expressed in frame j, Ji = -Jj Ad(g_ij). For Gauss-Newton use
    # the standard relation below (matches geom/projective_ops.py semantics).
    M = se3_matrix(g_ij)
    R = M[..., :3, :3]
    t = M[..., :3, 3]

    def _hat(v):
        zeros = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ], axis=-2)

    adT = jnp.zeros(M.shape[:-2] + (6, 6), M.dtype)
    adT = adT.at[..., :3, :3].set(R)
    adT = adT.at[..., :3, 3:].set(_hat(t) @ R)
    adT = adT.at[..., 3:, 3:].set(R)
    Ji = -jnp.einsum("...hwij,...jk->...hwik", Jj, adT)

    # disparity jacobian: dX1/dd = (t, 1) since X1 = (Rp + d t, d)
    dX1_dd = jnp.concatenate([
        jnp.broadcast_to(t[..., None, None, :], X1[..., :3].shape),
        jnp.ones_like(X1[..., 3:]),
    ], axis=-1)
    Jz = jnp.einsum("...ij,...j->...i", Jp, dX1_dd)[..., None]
    return coords, valid, (Ji, Jj, Jz)
