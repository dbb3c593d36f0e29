"""Gaussian map: fixed-capacity arena with masked densify/split/clone/prune.

Counterpart of /root/reference/hislam2/gaussian/scene/gaussian_model.py.
The reference grows/shrinks torch tensors and performs optimizer-state
surgery on every densify/prune (:374-417, :639-716). On TPU reallocation
means recompilation, so the arena is **fixed capacity with an alive mask**:

* pruning clears the alive bit;
* clone/split write children into free slots found with a cumsum over the
  free mask (one jitted program, shapes never change);
* Adam moments live in arrays of the same capacity and are zeroed at
  reallocated slots — exactly the reference's "new gaussians start with
  zero optimizer state".

Parameterization matches the reference: log-scales, inverse-sigmoid
opacity, wxyz quaternions, SH degree 0 (f_dc only,
gs_backend_per_frame.py:46). Seeding from conf-masked pointmaps with
sqrt(mean-3NN-dist) scale init and 0.1 opacity (gaussian_model.py:146-216).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.knn import dist_to_3nn_sq

__all__ = ["GaussianArena", "seed_from_pointmap", "densify_and_prune",
           "RGB2SH", "SH2RGB", "last_alive_bound"]

SH_C0 = 0.28209479177387814


# Seeded colors are inset from [0, 1] by half a u8 quantization step so
# no Gaussian INITIALIZES exactly on the renderer's clip(SH2RGB, 0, ...)
# boundary: at an exact-0 pre-clip value the clip subgradient is
# ill-defined and XLA's fma-vs-mul+add association choice (which differs
# between compiled programs, e.g. the fused multi-view window render vs
# the per-view scan) flips it between 0 and 0.5 — phantom f_dc gradients
# that break cross-program parity. Black/white u8 pixels hit the
# boundary EXACTLY without this (0/255 -> pre-clip 0.0); the 1/510
# inset is invisible (< half the u8 step) and also keeps the seed off
# the zero-gradient clamp plateau.
_COLOR_INSET = 1.0 / 510.0


def RGB2SH(rgb):
    return (jnp.clip(rgb, _COLOR_INSET, 1.0 - _COLOR_INSET) - 0.5) / SH_C0


def SH2RGB(sh):
    return sh * SH_C0 + 0.5


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianArena:
    """All fields (capacity, ...); ``alive`` masks real Gaussians."""
    xyz: jax.Array          # (N, 3) world
    f_dc: jax.Array         # (N, 3) SH degree-0 coeffs
    opacity_logit: jax.Array  # (N,)
    log_scales: jax.Array   # (N, 3)
    quat: jax.Array         # (N, 4) wxyz
    alive: jax.Array        # (N,) bool
    kf_id: jax.Array        # (N,) submap id for LC rigid updates
    n_obs: jax.Array        # (N,) observation count
    # densification statistics (gaussian_model.py:779-783)
    grad_accum: jax.Array     # (N,) sum ||dL/dmean2d_xy||
    grad_accum_abs: jax.Array  # (N,) sum ||dL/dmean2d_z-ish|| (abs-grad)
    denom: jax.Array          # (N,)
    max_radii: jax.Array      # (N,)

    @staticmethod
    def empty(capacity: int) -> "GaussianArena":
        z = jnp.zeros
        return GaussianArena(
            xyz=z((capacity, 3)), f_dc=z((capacity, 3)),
            opacity_logit=jnp.full((capacity,), -10.0),
            log_scales=jnp.full((capacity, 3), -10.0),
            quat=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (capacity, 1)),
            alive=z((capacity,), bool), kf_id=z((capacity,), jnp.int32),
            n_obs=z((capacity,), jnp.int32),
            grad_accum=z((capacity,)), grad_accum_abs=z((capacity,)),
            denom=z((capacity,)), max_radii=z((capacity,)))

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def params(self) -> Dict[str, jax.Array]:
        """The optimizable pytree (reference param groups :374-417)."""
        return {"xyz": self.xyz, "f_dc": self.f_dc,
                "opacity_logit": self.opacity_logit,
                "log_scales": self.log_scales, "quat": self.quat}

    def with_params(self, p: Dict[str, jax.Array]) -> "GaussianArena":
        return dataclasses.replace(self, **p)

    @property
    def opacity(self):
        return jax.nn.sigmoid(self.opacity_logit)

    @property
    def scales(self):
        return jnp.exp(self.log_scales)

    # ---- live-prefix views ------------------------------------------
    # Seeding and densification always fill the LOWEST free slots
    # (seed_from_pointmap free_rank order), so the alive set stays a
    # prefix (with holes from pruning). Hot programs can therefore run
    # on arena[:bucket] for any bucket >= last_alive_bound() — per-render
    # preprocess/bin/pack cost then scales with the LIVE count (like the
    # CUDA rasterizer) instead of the arena capacity.

    def slice_prefix(self, n: int) -> "GaussianArena":
        """A view of the first ``n`` slots (every field is (N, ...))."""
        return jax.tree.map(lambda x: x[:n], self)

    def write_prefix(self, prefix: "GaussianArena") -> "GaussianArena":
        """Write a ``slice_prefix``-shaped arena back into the front."""
        return jax.tree.map(
            lambda full, p: full.at[: p.shape[0]].set(p), self, prefix)


@jax.jit
def last_alive_bound(alive: jax.Array) -> jax.Array:
    """1 + highest alive slot index (0 when empty)."""
    idx = jnp.arange(alive.shape[0], dtype=jnp.int32)
    return jnp.max(jnp.where(alive, idx, -1)) + 1


# ---------------------------------------------------------------------------
# seeding
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0, static_argnames=())
def seed_from_pointmap(arena: GaussianArena, points: jax.Array,
                       colors: jax.Array, conf_mask: jax.Array,
                       kf_id: jax.Array
                       ) -> Tuple[GaussianArena, jax.Array, jax.Array]:
    """Insert Gaussians for one keyframe's confident pixels.

    points: (M, 3) world; colors: (M, 3) in [0,1]; conf_mask: (M,) bool.
    Children fill free arena slots in order; overflow is dropped (returned
    count allows the host to monitor pressure).
    """
    free = ~arena.alive
    free_rank = jnp.cumsum(free) - 1          # rank of each free slot
    cand_rank = jnp.cumsum(conf_mask) - 1     # rank of each candidate
    n_free = free.sum()
    n_cand = conf_mask.sum()
    n_ins = jnp.minimum(n_free, n_cand)

    # scale init: sqrt(mean sq dist to 3 NN) over the candidate cloud
    d2 = dist_to_3nn_sq(points, conf_mask)
    scale = jnp.log(jnp.sqrt(jnp.clip(d2, 1e-7)))

    # scatter candidates (rank r) into the slot holding free-rank r
    # build mapping slot <- candidate index
    slot_is_used = free & (free_rank < n_ins)
    # For each candidate rank r, find its target slot: we scatter candidate
    # data into an (n_free-ordered) staging array then gather by free rank.
    cap = arena.capacity
    M = points.shape[0]
    stage_idx = jnp.where(conf_mask & (cand_rank < n_ins), cand_rank, cap)
    stage = jnp.zeros((cap + 1, 10))
    payload = jnp.concatenate([
        points, RGB2SH(colors), scale[:, None],
        jnp.zeros((M, 3)),  # padding to 10
    ], axis=-1)
    stage = stage.at[stage_idx].set(payload)
    gathered = stage[jnp.where(slot_is_used, free_rank, cap)]

    new_xyz = jnp.where(slot_is_used[:, None], gathered[:, 0:3], arena.xyz)
    new_fdc = jnp.where(slot_is_used[:, None], gathered[:, 3:6], arena.f_dc)
    new_ls = jnp.where(slot_is_used[:, None],
                       jnp.broadcast_to(gathered[:, 6:7], (cap, 3)),
                       arena.log_scales)
    new_op = jnp.where(slot_is_used, inverse_sigmoid(jnp.float32(0.1)),
                       arena.opacity_logit)
    new_q = jnp.where(slot_is_used[:, None],
                      jnp.asarray([1.0, 0, 0, 0]), arena.quat)
    arena = dataclasses.replace(
        arena, xyz=new_xyz, f_dc=new_fdc, log_scales=new_ls,
        opacity_logit=new_op, quat=new_q,
        alive=arena.alive | slot_is_used,
        kf_id=jnp.where(slot_is_used, kf_id, arena.kf_id),
        n_obs=jnp.where(slot_is_used, 0, arena.n_obs),
        grad_accum=jnp.where(slot_is_used, 0, arena.grad_accum),
        grad_accum_abs=jnp.where(slot_is_used, 0, arena.grad_accum_abs),
        denom=jnp.where(slot_is_used, 0, arena.denom),
        max_radii=jnp.where(slot_is_used, 0, arena.max_radii))
    return arena, n_ins, slot_is_used


# ---------------------------------------------------------------------------
# densify / prune
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0, static_argnames=("max_new",))
def densify_and_prune(arena: GaussianArena, rng_key: jax.Array,
                      max_grad: float = 0.0002, min_opacity: float = 0.005,
                      extent: float = 4.0, max_new: int = 8192
                      ) -> GaussianArena:
    """gaussian_model.py:748-777 semantics, shape-static.

    clone: small gaussians over grad threshold duplicate at same spot;
    split: large ones spawn a sampled child and shrink (/1.6);
    prune: low opacity, huge world size, or tiny world size.
    Both clone and split children go to free slots (capped at max_new).
    """
    g = arena.grad_accum / jnp.maximum(arena.denom, 1.0)
    g_abs = arena.grad_accum_abs / jnp.maximum(arena.denom, 1.0)
    ratio = jnp.mean((g >= max_grad) & arena.alive)
    # dynamic abs-grad quantile Q (gaussian_model.py:757)
    q = jnp.quantile(jnp.where(arena.alive, g_abs, 0.0), 1.0 - ratio)
    over = ((g >= max_grad) | (g_abs >= q)) & arena.alive & (arena.denom > 0)

    scales = arena.scales
    max_scale = scales.max(-1)
    percent_dense = 0.01
    small = max_scale <= percent_dense * extent
    clone = over & small
    split = over & ~small

    # prune (applied to parents after splitting, like the reference)
    prune = (arena.opacity < min_opacity) | (max_scale > 0.1 * extent) \
        | (max_scale < 5e-4)
    prune = prune & arena.alive

    # children: one per selected parent, capped
    sel = clone | split
    sel_rank = jnp.cumsum(sel) - 1
    cap = arena.capacity
    keep_child = sel & (sel_rank < max_new)

    # sample split children from the parent gaussian
    noise = jax.random.normal(rng_key, (cap, 3)) * scales
    from ..ops.gs_raster import quat_wxyz_to_matrix
    R = quat_wxyz_to_matrix(arena.quat)
    offset = jnp.einsum("pij,pj->pi", R, noise)
    child_xyz = jnp.where(split[:, None], arena.xyz + offset, arena.xyz)
    child_ls = jnp.where(split[:, None],
                         jnp.log(scales / 1.6), arena.log_scales)

    # allocate slots for children among the free ones (after prune frees)
    alive_after_prune = arena.alive & ~prune
    free = ~alive_after_prune
    free_rank = jnp.cumsum(free) - 1
    n_children = jnp.minimum(keep_child.sum(), free.sum())
    slot_used = free & (free_rank < n_children)

    payload = jnp.concatenate([
        child_xyz, arena.f_dc, arena.opacity_logit[:, None], child_ls,
        arena.quat, arena.kf_id.astype(jnp.float32)[:, None],
    ], axis=-1)  # (cap, 15)
    child_rank = jnp.where(keep_child & (sel_rank < n_children), sel_rank, cap)
    stage = jnp.zeros((cap + 1, payload.shape[-1]))
    stage = stage.at[child_rank].set(payload)
    gathered = stage[jnp.where(slot_used, free_rank, cap)]

    su = slot_used[:, None]
    new = dataclasses.replace(
        arena,
        xyz=jnp.where(su, gathered[:, 0:3], arena.xyz),
        f_dc=jnp.where(su, gathered[:, 3:6], arena.f_dc),
        opacity_logit=jnp.where(slot_used, gathered[:, 6], arena.opacity_logit),
        log_scales=jnp.where(su, gathered[:, 7:10], arena.log_scales),
        quat=jnp.where(su, gathered[:, 10:14], arena.quat),
        kf_id=jnp.where(slot_used, gathered[:, 14].astype(jnp.int32),
                        arena.kf_id),
        alive=alive_after_prune | slot_used,
        # split parents also shrink in place (reference splits into N=2)
        n_obs=jnp.where(slot_used, 0, arena.n_obs),
    )
    parent_ls = jnp.where(split[:, None] & new.alive[:, None],
                          jnp.log(scales / 1.6), new.log_scales)
    new = dataclasses.replace(
        new, log_scales=parent_ls,
        grad_accum=jnp.zeros_like(arena.grad_accum),
        grad_accum_abs=jnp.zeros_like(arena.grad_accum_abs),
        denom=jnp.zeros_like(arena.denom),
        max_radii=jnp.where(new.alive, arena.max_radii, 0.0))
    return new
