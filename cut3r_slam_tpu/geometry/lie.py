"""SO(3) / SE(3) / Sim(3) Lie groups in pure JAX.

TPU-native replacement for the ``lietorch`` CUDA extension the reference
builds at /root/reference/setup.py:33-61 and uses live at
/root/reference/hislam2/track_backend.py:269, gs_backend_per_frame.py:722-731
and pgo_buffer.py. These are small batched ops: a fused kernel buys nothing
on TPU, so everything here is plain `jnp` that XLA fuses into surrounding
computations, and it is differentiable end-to-end (the reference relies on
lietorch's autograd through ``SE3.exp`` inside Adam loops — we rely on JAX AD).

Storage conventions (identical to lietorch, so SLAM-layer code translates 1:1):

* SO3: 4-vector quaternion ``[x, y, z, w]``.
* SE3: 7-vector ``[tx, ty, tz, qx, qy, qz, qw]``.
* Sim3: 8-vector ``[tx, ty, tz, qx, qy, qz, qw, s]`` (scale stored directly).

Tangent layouts (lietorch order): se3 = ``[tau(3), phi(3)]``,
sim3 = ``[tau(3), phi(3), sigma(1)]``.

All ops broadcast over leading batch dims. Small-angle branches use Taylor
expansions selected with the "safe where" pattern so gradients stay finite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import (
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
)

__all__ = [
    "so3_exp", "so3_log", "so3_inv", "so3_mul", "so3_act", "so3_matrix",
    "se3_exp", "se3_log", "se3_inv", "se3_mul", "se3_act", "se3_matrix",
    "se3_from_matrix", "se3_retr", "se3_identity",
    "sim3_exp", "sim3_log", "sim3_inv", "sim3_mul", "sim3_act",
    "sim3_matrix", "sim3_from_matrix", "sim3_retr", "sim3_identity",
]

_SMALL = 1e-8


def _safe_div(num, den, eps=1e-12):
    return num / jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) tangent (..., 3) -> unit quaternion xyzw (..., 4)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < _SMALL
    half = 0.5 * theta
    # sin(theta/2)/theta: series 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, _safe_div(jnp.sin(half), theta))
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion xyzw -> so(3) tangent (..., 3)."""
    q = quat_normalize(q)
    # force w >= 0 for the shortest rotation
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    v = q[..., :3]
    w = q[..., 3:4]
    vn_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn_sq, 1e-24))
    small = vn_sq < _SMALL
    # theta = 2 atan2(|v|, w);  phi = theta * v/|v|
    theta = 2.0 * jnp.arctan2(vn, w)
    # series: 2/w * (1 - |v|^2/(3 w^2))
    k = jnp.where(small, _safe_div(2.0, w) * (1.0 - vn_sq / (3.0 * jnp.maximum(w * w, 1e-12))),
                  _safe_div(theta, vn))
    return v * k


def so3_inv(q: jax.Array) -> jax.Array:
    return quat_conjugate(q)


def so3_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    return quat_multiply(q1, q2)


def so3_act(q: jax.Array, p: jax.Array) -> jax.Array:
    return quat_rotate(q, p)


def so3_matrix(q: jax.Array) -> jax.Array:
    return quat_to_matrix(quat_normalize(q))


def _so3_left_jacobian_terms(phi):
    """Coefficients (A, B) of V = I + A [phi]x + B [phi]x^2 (left Jacobian)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < _SMALL
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  _safe_div(1.0 - jnp.cos(theta), theta_sq))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  _safe_div(theta - jnp.sin(theta), theta_sq * theta))
    return a, b


def _apply_V(phi, tau, a, b):
    """V(phi) @ tau where V = I + a [phi]x + b [phi]x^2."""
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    return tau + a * c1 + b * c2


def _apply_V_inv(phi, rho):
    """V(phi)^{-1} @ rho."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < _SMALL
    half = 0.5 * theta
    # coefficient of [phi]x^2 in V^{-1} = I - 1/2 [phi]x + k [phi]x^2
    cot = _safe_div(jnp.cos(half), jnp.sin(half))
    k = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                  _safe_div(1.0 - 0.5 * theta * cot, theta_sq))
    c1 = jnp.cross(phi, rho)
    c2 = jnp.cross(phi, c1)
    return rho - 0.5 * c1 + k * c2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) tangent (..., 6) [tau, phi] -> SE3 7-vector."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    a, b = _so3_left_jacobian_terms(phi)
    t = _apply_V(phi, tau, a, b)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g: jax.Array) -> jax.Array:
    t, q = g[..., :3], g[..., 3:7]
    phi = so3_log(q)
    tau = _apply_V_inv(phi, t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(g: jax.Array) -> jax.Array:
    t, q = g[..., :3], g[..., 3:7]
    qinv = quat_conjugate(q)
    return jnp.concatenate([-quat_rotate(qinv, t), qinv], axis=-1)


def se3_mul(g1: jax.Array, g2: jax.Array) -> jax.Array:
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    return jnp.concatenate(
        [t1 + quat_rotate(q1, t2), quat_normalize(quat_multiply(q1, q2))], axis=-1
    )


def se3_act(g: jax.Array, p: jax.Array) -> jax.Array:
    return quat_rotate(g[..., 3:7], p) + g[..., :3]


def se3_matrix(g: jax.Array) -> jax.Array:
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(quat_normalize(q))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), t.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(m: jax.Array) -> jax.Array:
    q = matrix_to_quat(m[..., :3, :3])
    return jnp.concatenate([m[..., :3, 3], q], axis=-1)


def se3_retr(g: jax.Array, xi: jax.Array) -> jax.Array:
    """lietorch-style retraction: exp(xi) * g."""
    return se3_mul(se3_exp(xi), g)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (8,))


def _sim3_W(phi, sigma):
    """The W matrix action of Sim(3) exp applied to tau.

    Returns coefficients (c0, c1, c2) of W = c0 I + c1 [phi]x + c2 [phi]x^2.
    See Strasdat's thesis (Sim3 exp); handles the four small/large branches.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    # expm1 avoids the catastrophic exp(sigma)-1 cancellation that dominates
    # f32 error for |sigma| < ~1e-2 (regression: TestSim3NegativeSigmaSmallTheta).
    e = jnp.expm1(sigma)
    s = 1.0 + e
    # Branch thresholds are set by f32 cancellation, not mathematical
    # singularity: below them the closed forms lose >=3 digits, so we switch
    # to series whose truncation error sits under the f32 noise floor.
    small_th = theta_sq < 1e-4          # theta < 1e-2
    small_sg = jnp.abs(sigma) < 0.05

    # A = (e^sigma - 1)/sigma; expm1 keeps this stable down to sigma ~ 0.
    A = jnp.where(jnp.abs(sigma) < 1e-8,
                  1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  _safe_div(e, sigma))

    sig2_th2 = sigma * sigma + theta_sq
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    # Large-theta closed forms (Sophus Sim3::exp):
    #   W = A I + B [phi]x + C [phi]x^2 with
    #   B = (s sin * sigma + (1 - s cos) theta) / (theta (sigma^2 + theta^2))
    #   C = (A - ((s cos - 1) sigma + s sin theta) / (sigma^2 + theta^2)) / theta^2
    denom = jnp.maximum(sig2_th2, 1e-24)
    a_l = _safe_div(s * sin_t * sigma + (1.0 - s * cos_t) * theta, denom * theta)
    c_inner = _safe_div((s * cos_t - 1.0) * sigma + s * sin_t * theta, denom)
    c_l = _safe_div(A - c_inner, jnp.maximum(theta_sq, 1e-24))

    # theta -> 0 limits, general sigma:
    #   B -> (s sigma + 1 - s)/sigma^2,  C -> (s-1)/sigma^3 - (s - s sigma/2)/sigma^2
    # Both closed forms cancel catastrophically in f32 for small |sigma|;
    # sigma-series (cross-checked against expm of the 4x4 sim(3) matrix):
    #   B = 1/2 + sigma/3 + sigma^2/8 + sigma^3/30 + O(sigma^4)
    #   C = 1/6 + sigma/8 + sigma^2/20 + sigma^3/72 + O(sigma^4)
    sg2 = sigma * sigma
    b_series = 0.5 + sigma / 3.0 + sg2 / 8.0 + sg2 * sigma / 30.0
    c_series = 1.0 / 6.0 + sigma / 8.0 + sg2 / 20.0 + sg2 * sigma / 72.0
    b_closed = _safe_div(sigma * s - e, jnp.maximum(sg2, 1e-24))
    # Sign-preserving clamp: sigma^3 keeps sigma's sign; a bare maximum()
    # would snap negative sigma^3 to an epsilon and explode (s-1)/sigma^3.
    sig3 = jnp.where(sigma < 0, jnp.minimum(sg2 * sigma, -1e-24),
                     jnp.maximum(sg2 * sigma, 1e-24))
    c_closed = _safe_div(e, sig3) - _safe_div(s - s * sigma / 2.0,
                                              jnp.maximum(sg2, 1e-24))
    b_s = jnp.where(small_sg, b_series, b_closed)
    c_s = jnp.where(small_sg, c_series, c_closed)

    B = jnp.where(small_th, b_s, a_l)
    C = jnp.where(small_th, c_s, c_l)
    return A, B, C


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) tangent (..., 7) [tau, phi, sigma] -> Sim3 8-vector."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    A, B, C = _sim3_W(phi, sigma)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = A * tau + B * c1 + C * c2
    s = jnp.exp(sigma)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(g: jax.Array) -> jax.Array:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(jnp.maximum(s, 1e-24))
    A, B, C = _sim3_W(phi, sigma)
    # Solve (A I + B [phi]x + C [phi]x^2) tau = t.
    # Build the 3x3 W and solve; batch-safe.
    def _hat(v):
        zeros = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ], axis=-2)

    Phi = _hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=g.dtype), Phi.shape)
    W = A[..., None] * eye + B[..., None] * Phi + C[..., None] * (Phi @ Phi)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_inv(g: jax.Array) -> jax.Array:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qinv = quat_conjugate(q)
    sinv = 1.0 / jnp.maximum(s, 1e-24)
    return jnp.concatenate([-sinv * quat_rotate(qinv, t), qinv, sinv], axis=-1)


def sim3_mul(g1: jax.Array, g2: jax.Array) -> jax.Array:
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    return jnp.concatenate([
        t1 + s1 * quat_rotate(q1, t2),
        quat_normalize(quat_multiply(q1, q2)),
        s1 * s2,
    ], axis=-1)


def sim3_act(g: jax.Array, p: jax.Array) -> jax.Array:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * quat_rotate(q, p) + t


def sim3_matrix(g: jax.Array) -> jax.Array:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    R = quat_to_matrix(quat_normalize(q)) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), t.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_from_matrix(m: jax.Array) -> jax.Array:
    sR = m[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(sR))[..., None]
    R = sR / s[..., None]
    q = matrix_to_quat(R)
    return jnp.concatenate([m[..., :3, 3], q, s], axis=-1)


def sim3_retr(g: jax.Array, xi: jax.Array) -> jax.Array:
    return sim3_mul(sim3_exp(xi), g)
