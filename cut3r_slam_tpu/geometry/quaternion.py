"""Quaternion algebra in pure JAX.

Conventions
-----------
Two quaternion layouts coexist in the system (mirroring the reference stack,
see /root/reference/src/dust3r/utils/camera.py:423-480 for the wxyz model
convention and scipy's xyzw used by the SLAM layer at
/root/reference/hislam2/track_frontend.py:236-242):

* ``xyzw`` — scipy / lietorch layout. This is the **internal** convention of
  every function in this module unless the name says otherwise.
* ``wxyz`` — the CUT3R pose-head layout; use :func:`wxyz_to_xyzw` /
  :func:`xyzw_to_wxyz` at the model boundary.

All functions are shape-polymorphic over leading batch dims and are safe to
`jax.jit` / `vmap` / differentiate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_multiply",
    "quat_conjugate",
    "quat_normalize",
    "quat_rotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "standardize_quat",
    "wxyz_to_xyzw",
    "xyzw_to_wxyz",
]


def wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    # eps inside the sqrt: linalg.norm has a NaN gradient at exactly-zero
    # input, and this sits on differentiated paths (sim3_log residuals,
    # BA retractions) where dead-slot quaternions are all-zero.
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps * eps)
    return q / n


def standardize_quat(q: jax.Array) -> jax.Array:
    """Normalize and flip sign so the scalar (w, last) component is >= 0."""
    q = quat_normalize(q)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, xyzw layout."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (xyzw) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion xyzw with w >= 0.

    Branch-free Shepperd's method (differentiable away from the branch
    boundaries; the four candidates are blended by a one-hot argmax so the
    selected branch is always numerically stable).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four squared magnitudes (up to scale): w, x, y, z branches.
    qs = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    branch = jnp.argmax(qs, axis=-1)

    def _safe(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # branch 0 (w largest)
    s0 = _safe(1.0 + tr) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], axis=-1)
    # branch 1 (x largest)
    s1 = _safe(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], axis=-1)
    # branch 2 (y largest)
    s2 = _safe(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], axis=-1)
    # branch 3 (z largest)
    s3 = _safe(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], axis=-1)

    qcand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4 branches, 4)
    onehot = jax.nn.one_hot(branch, 4, dtype=m.dtype)[..., None]
    q = jnp.sum(qcand * onehot, axis=-2)
    return standardize_quat(q)
