"""Mean squared distance to the 3 nearest neighbors (simple_knn analog).

Replaces the ``simple_knn`` CUDA extension's ``distCUDA2`` used for
Gaussian scale initialization (gaussian_model.py:189-195): for each point,
the mean of squared distances to its 3 nearest neighbors. Implemented as
chunked pairwise distances + top-4 — MXU matmuls, no kernel needed.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["dist_to_3nn_sq"]


@partial(jax.jit, static_argnames=("chunk",))
def dist_to_3nn_sq(points: jax.Array, valid: jax.Array | None = None,
                   chunk: int = 2048) -> jax.Array:
    """points: (N, 3). Returns (N,) mean squared distance to 3 NN.

    ``valid``: optional (N,) bool — invalid points are excluded as
    neighbors and get output 0.
    """
    N = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)
    if valid is None:
        valid = jnp.ones(N, bool)

    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))
    val_p = jnp.pad(valid, (0, pad))

    def body(i, out):
        q = jax.lax.dynamic_slice_in_dim(pts_p, i * chunk, chunk)
        qsq = jax.lax.dynamic_slice_in_dim(sq_p, i * chunk, chunk)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ points.T)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        # exclude self (distance 0 on the diagonal of its own block)
        idx = jnp.arange(chunk) + i * chunk
        d2 = jnp.where(jnp.arange(N)[None, :] == idx[:, None], jnp.inf, d2)
        # top-4 smallest via negative top_k
        nn = -jax.lax.top_k(-d2, 3)[0]  # (chunk, 3)
        mean3 = jnp.where(jnp.isfinite(nn), jnp.maximum(nn, 0.0), 0.0).mean(-1)
        return jax.lax.dynamic_update_slice_in_dim(out, mean3, i * chunk, 0)

    out = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(n_chunks * chunk))
    return jnp.where(valid, out[:N], 0.0)
