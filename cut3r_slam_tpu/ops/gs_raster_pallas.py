"""Pallas TPU kernels for the 3DGS tile blending — forward AND backward.

The XLA formulation in ops/gs_raster.py materializes the per-tile gathered
Gaussian attributes in HBM and streams them through a lax.scan. These
kernels fuse the whole per-tile front-to-back blend into VMEM-resident
programs; each grid step blends a BATCH of TB tiles.

The key reformulation: the per-(entry, pixel) Gaussian exponent and ray
depth are polynomials in the pixel coordinates —

  power = q0 + q1 x + q2 y + q3 x^2 + q4 y^2 + q5 xy      (EWA conic)
  t     = t0 + t1 x + t2 y                                 (ray plane)

evaluated ELEMENTWISE on the VPU from a packed 16-channel per-entry
matrix A against tile-LOCAL pixel coordinates built in-kernel from an
iota (local coords keep the f32 cancellation error ~1e-4 and need no
basis-plane DMA). log(opacity) and the entry validity mask fold into q0.

A's row layout puts the MXU-accumulated block FIRST so its slice is
sublane-aligned: rows 0..2 rgb, 3..5 normal, 6 weight-one, 7 q0 (rides
along in the 8-row channel contraction — its aT-weighted sum lands in a
discarded output row, and 7 rows would pad to 8 sublanes anyway), 8..12
q1..q5, 13..15 t0..t2. Channel accumulation is one (8 x C) @ (C x PX)
MXU contraction per chunk — HALF the v2 kernel's 16-row contraction,
whose rows 0..8 were polynomial coefficients that never needed
accumulating.

Transmittance is a LINEAR-SPACE prefix product via ONE Hillis-Steele
doubling scan of sublane `pltpu.roll`s. The v2 kernel ran two more scans
that are mathematically redundant: the early-termination violation flag
is MONOTONE along the entry axis (transmittance never increases), so the
CUDA per-pixel break (forward.cu:590 — the entry that drops T below
T_MIN is NOT blended) is a plain comparison `T_in * inc0 >= T_MIN`, and
the leftover transmittance is inc0 at the last kept entry = a masked
sublane MIN (inc0 is nonincreasing), not a second prefix product.
(An earlier log-space sum variant matched XLA's cumprod only to ~1e-5,
flipping the median-depth selector near ties; the linear-space product
agrees to a few ulps.) Chunk loops are bounded by the batch's max entry
count (scalar-prefetched) and exit early when every pixel's
transmittance is exhausted.

Performance-critical layout choice: A is packed (n_tiles, 16, K) so the
LANE dimension is the entry axis K (512) — a (n_tiles, K, 16) layout
puts 16 channels in the lanes, padding every load 16 -> 128.

The backward mirrors the CUDA backward (/root/reference/thirdparty/
diff-gaussian-rasterization/cuda_rasterizer/backward.cu:145-632) but
runs as ONE REVERSE pass over the chunks (the CUDA kernel and the v2
Pallas backward both walk forward twice — once for per-pixel totals,
once for the suffix terms). The forward saves each chunk's inbound
transmittance T_in as a residual (nC x PX per tile batch — tiny next to
A), so the backward recomputes chunks back-to-front and accumulates the
suffix  S_i = sum_{j>i} aT_j b_j  directly:
  dL/da_i = T_i*b_i - (S_i + g_T*T_final)/(1-a_i).
Each chunk emits ONE packed (TB, 16, C) gradient dA via a single merged
contraction over [pixels | power-basis | depth-basis] (3*PX lanes).
XLA autodiff chains dA through the (differentiable) packing back to
means/conics/opacity/colors/planes. Gradients match JAX AD of
ops/gs_raster.py to float tolerance (tests/test_gs_raster_pallas.py).

``rasterize_pallas`` is the differentiable drop-in for ops/gs_raster.
rasterize (minus the coord/mcoord maps, unused by the mapping losses);
``rasterize_pallas_forward`` remains the forward-only entry. Both accept
``bins=`` (see gs_raster.compute_bins) so the mapping optimizer reuses
one binning across a segment, and sort tile batches by occupancy so the
per-batch chunk bound tracks the actual entry counts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gs_raster import (RasterizeConfig, TILE, ALPHA_MIN, T_MIN,
                        NORMALIZE_EPS, median_gate, _preprocess,
                        _bin_gaussians, _untile)

__all__ = ["rasterize_pallas_forward", "rasterize_pallas",
           "rasterize_pallas_multi"]

PX = TILE * TILE  # 256 pixels per tile
NCH = 16          # packed entry channels
R_CH = 8          # rows 0..7 = MXU-accumulated channel block (see above)

# Matmul precision for the channel accumulations. Mosaic lowers only
# DEFAULT (one bf16 MXU pass — wrecks the blend numerics, compiled-vs-
# interpret maxdiff ~0.6 measured on a v5 chip) and HIGHEST (exact f32);
# HIGH raises NotImplementedError. HIGHEST is affordable here because
# the transmittance chain no longer uses matmuls (roll-scan): only the
# small channel-accumulation contractions remain on the MXU.
_PREC = jax.lax.Precision.HIGHEST


def _prefix_inclusive(x):
    """Inclusive prefix sum along the ENTRY axis (axis 1 of (TB, C, PX))
    via a Hillis-Steele doubling scan of sublane rolls — pure VPU."""
    C = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < C:
        x = x + jnp.where(iota >= d, pltpu.roll(x, d, axis=1), 0.0)
        d *= 2
    return x


def _prefix_prod_inclusive(x):
    """Inclusive prefix PRODUCT along the entry axis — the multiplicative
    Hillis-Steele twin of _prefix_inclusive. Keeping the transmittance
    chain in linear space (like XLA's cumprod, differing only in
    association order) instead of exp(sum of logs) keeps the two
    backends within a few ulps of each other near the median-depth
    threshold, and drops the log/exp transcendentals from the kernel."""
    C = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < C:
        x = x * jnp.where(iota >= d, pltpu.roll(x, d, axis=1), 1.0)
        d *= 2
    return x


def _pixel_xy():
    """Tile-local pixel coordinates as (1, 1, PX) f32 lane vectors."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, PX), 2)
    return ((p % TILE).astype(jnp.float32),
            (p // TILE).astype(jnp.float32))


def _chunk_blend(A, T_in):
    """Forward-chunk recompute for a TB-tile batch.

    A: (TB, 16, C) packed entry chunk (indexed out of the 4D
    (TB, n_chunks, 16, C) block on a MAJOR dim — Mosaic cannot
    dynamic-slice the lane dimension); T_in: (TB, 1, PX).
    Returns (TB, C, PX) maps. ONE prefix scan (the v2 kernel ran three;
    see module docstring for why the other two reduce to a comparison
    and a masked min).
    """
    x, y = _pixel_xy()
    q = [A[:, 7 + k, :][:, :, None] for k in range(6)]    # (TB, C, 1)
    power = (q[0] + q[1] * x + q[2] * y
             + q[3] * (x * x) + q[4] * (y * y) + q[5] * (x * y))
    t_all = (A[:, 13, :][:, :, None] + A[:, 14, :][:, :, None] * x
             + A[:, 15, :][:, :, None] * y)
    alpha_raw = jnp.exp(power)       # includes log-opacity and mask in q0
    alpha_c = jnp.minimum(0.99, alpha_raw)
    # INTENTIONAL divergence from the XLA path's `power <= 0` reject
    # (gs_raster.py; CUDA forward.cu:560): log-opacity is folded into q0
    # so the opacity-free exponent is unrecoverable here. The guard only
    # fires for numerically indefinite conics; those yield alpha_raw > 1
    # which the 0.99 clamp bounds, and the bwd `gate` zeroes their grads.
    ok = alpha_c >= ALPHA_MIN
    alpha0 = jnp.where(ok, alpha_c, 0.0)
    one_m0 = 1.0 - alpha0                    # >= 0.01 (0.99 alpha clamp)
    inc0 = _prefix_prod_inclusive(one_m0)
    # early termination: T_in * inc0 is NONINCREASING along the entry
    # axis, so the first violating entry and everything after it drop
    # out via a plain comparison (matches CUDA forward.cu:590 — the
    # violating entry itself is NOT blended).
    keepb = (T_in * inc0) >= jnp.float32(T_MIN)
    keep = keepb.astype(jnp.float32)
    alpha = alpha0 * keep
    Tb = T_in * inc0 / one_m0                # strict prefix product
    aT = alpha * Tb
    # leftover transmittance = product of KEPT one_m0 = inc0 at the last
    # kept entry = masked sublane min (inc0 nonincreasing; 1.0 if none).
    T_out = T_in * jnp.min(jnp.where(keepb, inc0, 1.0), axis=1,
                           keepdims=True)
    return dict(A=A, alpha_raw=alpha_raw, alpha=alpha, Tb=Tb, aT=aT,
                t_all=t_all, T_out=T_out,
                gate=jnp.where(ok & (alpha_raw < 0.99), keep, 0.0))


def _batch_chunks(cnt_ref, tb, chunk, k_entries):
    """Chunk-loop bound for grid step i: cover the batch's max count."""
    i = pl.program_id(0)
    m = cnt_ref[i * tb]
    for j in range(1, tb):  # SMEM allows scalar reads only
        m = jnp.maximum(m, cnt_ref[i * tb + j])
    return jnp.minimum(pl.cdiv(m, chunk), k_entries // chunk)


def _blend_fwd_kernel(cnt_ref, a_ref,
                      o_out, dsum_out, mdep_out, tleft_out, tchk_out,
                      *, tb: int, chunk: int, k_entries: int):
    """One grid step = TB tiles. Outputs: O (TB, 8, PX) accumulated
    channels (rows 0..2 color, 3..5 normal, 6 alpha-weight, 7 discarded),
    expected ray-depth sum, median ray depth, leftover transmittance.
    ``tchk_out`` (None in the forward-only variant): per-chunk inbound
    transmittance residuals for the one-pass reverse backward — rows of
    chunks never reached stay at the zero init, which the backward uses
    both to skip them and to null their gradients."""
    if tchk_out is not None:
        tchk_out[:] = jnp.zeros(tchk_out.shape, tchk_out.dtype)
    n_chunks = _batch_chunks(cnt_ref, tb, chunk, k_entries)

    def chunk_body(state):
        ci, (T, osum, dsum, mdep) = state
        if tchk_out is not None:
            tchk_out[:, ci] = T
        v = _chunk_blend(a_ref[:, ci], T)
        aT, t_all = v["aT"], v["t_all"]
        osum = osum + jnp.einsum("bkc,bcp->bkp", v["A"][:, :R_CH], aT,
                                 preferred_element_type=jnp.float32,
                                 precision=_PREC)
        dsum = dsum + jnp.sum(aT * t_all, axis=1, keepdims=True)

        # median: LAST entry with Tb above the quantized threshold that
        # contributes — masked max of iota (bm is NOT prefix-contiguous;
        # see gs_raster.py note; the fixed-point compare makes ties
        # agree with the XLA backend, see gs_raster.median_gate)
        bm = median_gate(v["Tb"]) & (aT > 0.0)
        iota = jax.lax.broadcasted_iota(jnp.int32, bm.shape, 1)
        idx = jnp.max(jnp.where(bm, iota, -1), axis=1, keepdims=True)
        has = idx >= 0
        take = jnp.sum(jnp.where(iota == idx, t_all, 0.0), axis=1,
                       keepdims=True)
        mdep = jnp.where(has, take, mdep)
        return ci + 1, (v["T_out"], osum, dsum, mdep)

    def not_done(state):
        ci, carry = state
        return (ci < n_chunks) & (jnp.max(carry[0]) >= T_MIN)

    init = (jnp.ones((tb, 1, PX), jnp.float32),
            jnp.zeros((tb, R_CH, PX), jnp.float32),
            jnp.zeros((tb, 1, PX), jnp.float32),
            jnp.zeros((tb, 1, PX), jnp.float32))
    _, (T, osum, dsum, mdep) = jax.lax.while_loop(
        not_done, chunk_body, (jnp.int32(0), init))

    o_out[:] = osum
    dsum_out[:] = dsum
    mdep_out[:] = mdep
    tleft_out[:] = T


def _blend_bwd_kernel(cnt_ref, a_ref, tchk_ref, tlft_ref, bp_ref, bt_ref,
                      go_ref, gd_ref, gmd_ref, gT_ref, da_out,
                      *, tb: int, chunk: int, k_entries: int):
    """Backward: ONE reverse pass over the chunks. The forward's saved
    per-chunk inbound transmittance replaces the totals pass — suffix
    sums accumulate back-to-front directly."""
    da_out[:] = jnp.zeros(da_out.shape, da_out.dtype)
    n_chunks = _batch_chunks(cnt_ref, tb, chunk, k_entries)
    gO = go_ref[:]          # (TB, 8, PX)
    gd = gd_ref[:]          # (TB, 1, PX) expected-depth-sum cotangent
    gmd = gmd_ref[:]        # (TB, 1, PX) median-depth cotangent
    gTT = gT_ref[:] * tlft_ref[:]   # final-T cotangent x primal final T

    # executed chunks form a prefix; their saved T_in is >= T_MIN > 0,
    # never-reached chunks keep the zero init
    def count_act(ci, n):
        return n + (jnp.max(tchk_ref[:, ci]) > 0.0).astype(jnp.int32)

    n_act = jax.lax.fori_loop(0, n_chunks, count_act, jnp.int32(0))

    # merged-contraction RHS over [pixels | power basis | depth basis]
    # lanes; channel rows 8..15 of the pixel block are zero (their
    # cotangents live in the bases instead)
    Yb = jnp.concatenate([
        jnp.concatenate(
            [gO, jnp.zeros((tb, NCH - R_CH, PX), jnp.float32)], axis=1),
        jnp.broadcast_to(bp_ref[:][None], (tb, NCH, PX)),
        jnp.broadcast_to(bt_ref[:][None], (tb, NCH, PX))], axis=2)

    def body(i, carry):
        S_carry, med_found = carry
        ci = n_act - 1 - i
        v = _chunk_blend(a_ref[:, ci], tchk_ref[:, ci])
        # per-(entry, pixel) cotangent of aT: all O channels + depth
        b = (jnp.einsum("bkc,bkp->bcp", v["A"][:, :R_CH], gO,
                        preferred_element_type=jnp.float32,
                        precision=_PREC)
             + gd * v["t_all"])
        ab = v["aT"] * b
        ab_inc = _prefix_inclusive(ab)
        tot = ab_inc[:, -1:, :]
        S = (tot - ab_inc) + S_carry             # strict suffix sum
        dalpha = v["Tb"] * b - (S + gTT) / (1.0 - v["alpha"])
        # median contributor = globally LAST entry with bm; in reverse
        # order that is the masked-max hit of the FIRST chunk with any
        bm = median_gate(v["Tb"]) & (v["aT"] > 0.0)
        iota = jax.lax.broadcasted_iota(jnp.int32, bm.shape, 1)
        local_idx = jnp.max(jnp.where(bm, iota, -1), axis=1,
                            keepdims=True)
        fire = (local_idx >= 0) & (med_found < 0.5)
        is_med = fire & (iota == local_idx)
        dt_all = gd * v["aT"] + gmd * jnp.where(is_med, 1.0, 0.0)
        dpower = dalpha * v["gate"] * v["alpha_raw"]  # d exp = exp

        # ONE merged contraction emits the whole packed dA chunk:
        # dA[k, c] = sum_p aT gO_k + dpower bp_k + dt bt_k
        X = jnp.concatenate([v["aT"], dpower, dt_all], axis=2)
        dA = jnp.einsum("bcx,bkx->bkc", X, Yb,
                        preferred_element_type=jnp.float32,
                        precision=_PREC)
        da_out[:, ci] = dA
        return (S_carry + tot, med_found + fire.astype(jnp.float32))

    jax.lax.fori_loop(
        0, n_act, body,
        (jnp.zeros((tb, 1, PX), jnp.float32),
         jnp.zeros((tb, 1, PX), jnp.float32)))


# ---------------------------------------------------------------------------
# packing + basis construction (XLA, differentiable)
# ---------------------------------------------------------------------------

def _tile_origins(cfg: RasterizeConfig):
    ty = jnp.arange(cfg.tiles_y)
    txs = jnp.arange(cfg.tiles_x)
    tgy, tgx = jnp.meshgrid(ty, txs, indexing="ij")
    return (tgx.reshape(-1) * TILE).astype(jnp.float32), \
        (tgy.reshape(-1) * TILE).astype(jnp.float32)


def _basis_planes():
    """(16, PX) power/depth basis rows over tile-local pixel coords,
    used only by the backward's merged dA contraction. Row layout
    follows A: 7..12 power basis [1, x, y, x^2, y^2, xy] for q0..q5,
    13..15 depth basis [1, x, y] for t0..t2."""
    oy, ox = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32),
                          jnp.arange(TILE, dtype=jnp.float32),
                          indexing="ij")
    x = ox.reshape(-1)
    y = oy.reshape(-1)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    bp = jnp.stack([zero] * 7 + [one, x, y, x * x, y * y, x * y]
                   + [zero] * 3, 0)
    bt = jnp.stack([zero] * 13 + [one, x, y], 0)
    return bp, bt


@jax.custom_vjp
def _gather_entries(raw, entry_gauss, inv_map):
    """raw (P, 16) per-Gaussian rows -> (n_tiles, K, 16) per-entry rows.

    Forward: a plain row gather. Backward: each Gaussian GATHERS the
    gradients of its own <= max_dup entry slots via the inverse binning
    map (gs_raster._bin_gaussians(return_inverse=True)) and sums them.
    MEASURED SLOWER than XLA's scatter-add on the v5 chip (19 ms vs
    7.6 ms at 2M entries — (P, max_dup) random 64 B row reads are
    latency-bound, while XLA's scatter lowers to a sorted combine), so
    the default path does NOT use it; kept for callers that provide an
    inverse map and for future hardware where the trade flips.
    inv_map rows use the SAME tile-row permutation as entry_gauss.
    """
    return raw[entry_gauss]


def _gather_entries_fwd(raw, entry_gauss, inv_map):
    return raw[entry_gauss], (entry_gauss, inv_map)


def _gather_entries_bwd(res, dG):
    entry_gauss, inv_map = res
    nt, K, C = dG.shape
    dG_pad = jnp.concatenate(
        [dG.reshape(nt * K, C), jnp.zeros((1, C), dG.dtype)], axis=0)
    idx = jnp.where(inv_map >= 0, inv_map, nt * K)  # -1 -> zero row
    dRaw = dG_pad[idx].sum(1)  # (P, max_dup, 16) -> (P, 16)
    return dRaw, None, None


_gather_entries.defvjp(_gather_entries_fwd, _gather_entries_bwd)


# Segment-reduction strategy for the PLANNED pack backward (see
# gs_raster.compute_bin_plan). All three are mathematically identical;
# they differ only in how XLA lowers the entry -> Gaussian reduction:
#   "segsum" — gather by the cached permutation, then a scatter-add with
#              indices_are_sorted=True over contiguous segment ids (XLA
#              skips the per-call index sort the plain scatter pays);
#   "cumsum" — gather by the permutation, one prefix sum over the entry
#              axis, then per-Gaussian boundary differences (no scatter
#              at all; trades a log-pass cumsum for it);
#   "take"   — per-Gaussian (n_gauss, max_dup) positional gather + sum.
_PLAN_BWD_MODE = "segsum"


@jax.custom_vjp
def _gather_entries_planned(raw, entry_gauss_s, perm, bounds):
    """raw (P, 16) -> (T, K, 16) per-entry rows, like _gather_entries,
    but with the gradient reduction PRE-SORTED at bin time: ``perm``
    groups the flat entry positions by Gaussian id and ``bounds`` marks
    each Gaussian's segment (gs_raster.compute_bin_plan). The backward
    needs no per-step index sort — the XLA scatter-add it replaces
    measured 7.6 ms/step at the round-4 bench load."""
    return raw[entry_gauss_s]


def _gather_entries_planned_fwd(raw, entry_gauss_s, perm, bounds):
    return raw[entry_gauss_s], (perm, bounds, raw.shape[0])


def _gather_entries_planned_bwd(res, dG):
    perm, bounds, P = res
    T, K, C = dG.shape
    ds = dG.reshape(T * K, C)[perm]          # grouped by gaussian id
    if _PLAN_BWD_MODE == "cumsum":
        cpad = jnp.concatenate(
            [jnp.zeros((1, C), ds.dtype), jnp.cumsum(ds, axis=0)], axis=0)
        dRaw = cpad[bounds[1:]] - cpad[bounds[:-1]]
    elif _PLAN_BWD_MODE == "take":
        D = 16  # max entries per gaussian = max_dup tile duplicates
        pos = bounds[:-1, None] + jnp.arange(D, dtype=jnp.int32)[None, :]
        ok = pos < bounds[1:, None]
        ds_pad = jnp.concatenate([ds, jnp.zeros((1, C), ds.dtype)], axis=0)
        pos = jnp.where(ok, pos, T * K)
        dRaw = ds_pad[pos].sum(1)
    else:  # "segsum"
        # segment id of sorted entry i: the p with bounds[p] <= i <
        # bounds[p+1]; entries past bounds[-1] are masked-off (sentinel
        # segment) -> id P, dropped by the scatter's OOB semantics, and
        # zeroed explicitly for safety
        idx = jnp.arange(T * K, dtype=jnp.int32)
        seg = jnp.searchsorted(bounds, idx, side="right") - 1
        ds = jnp.where((idx >= bounds[-1])[:, None], 0.0, ds)
        dRaw = jax.ops.segment_sum(ds, seg, num_segments=bounds.shape[0] - 1,
                                   indices_are_sorted=True)
    return dRaw, None, None, None


_gather_entries_planned.defvjp(_gather_entries_planned_fwd,
                               _gather_entries_planned_bwd)


@jax.custom_vjp
def _gather_mv(raw, eg):
    """Batched per-view row gather raw (V, P, C)[(V, T, K)] -> (V, T, K, C)
    with a SEQUENTIAL per-view scatter-add backward.

    jax.vmap of the gather lowers its backward to ONE batched scatter-add,
    which XLA lowers catastrophically on TPU: 319 ms at the V=10 bench
    load vs 7.4 ms for a single view's scatter (scripts/
    profile_mv_parts.py, 2026-08-21). A lax.map'd backward runs V
    independent single-view scatters — the lowering the chip actually
    handles — at ~V * single-view cost."""
    return jax.vmap(lambda r, e: r[e])(raw, eg)


def _gather_mv_fwd(raw, eg):
    return _gather_mv(raw, eg), (eg, raw.shape)


def _gather_mv_bwd(res, dG):
    eg, shape = res
    dRaw = jax.lax.map(
        lambda xs: jnp.zeros(shape[1:], dG.dtype).at[
            xs[0].reshape(-1)].add(xs[1].reshape(-1, dG.shape[-1])),
        (eg, dG))
    return dRaw, None


_gather_mv.defvjp(_gather_mv_fwd, _gather_mv_bwd)


def _build_raw(pre, colors):
    """(P, 16) per-Gaussian packed attribute rows — built ONCE per render
    so the per-entry pack needs a single row gather (and its backward a
    single row scatter) instead of ~9 narrow ones."""
    return jnp.stack([
        pre["mean2d"][:, 0], pre["mean2d"][:, 1],
        pre["conic"][:, 0], pre["conic"][:, 1], pre["conic"][:, 2],
        jnp.log(jnp.maximum(pre["opacity"], 1e-30)),
        pre["t_center"],
        pre["ray_plane"][:, 0], pre["ray_plane"][:, 1],
        colors[:, 0], colors[:, 1], colors[:, 2],
        pre["normal"][:, 0], pre["normal"][:, 1], pre["normal"][:, 2],
        jnp.zeros_like(pre["t_center"]),
    ], axis=-1)


def _pack_entries(pre, colors, entry_gauss, entry_mask,
                  cfg: RasterizeConfig, tile_order=None, inv_map=None):
    """(n_tiles, 16, K) packed per-entry channels, tile-local coords.

    Differentiable: XLA autodiff routes the kernel's dA back through
    these expressions (and the single row gather) to the per-Gaussian
    attributes. ``tile_order``: when the entry rows arrive occupancy-
    permuted, the per-row tile origins must follow the same permutation.
    ``inv_map``: inverse binning map (already permutation-adjusted) —
    routes the gather's backward through _gather_entries instead of a
    scatter-add (measured slower on v5; see _gather_entries).
    """
    ox, oy = _tile_origins(cfg)
    if tile_order is not None:
        ox = ox[tile_order]
        oy = oy[tile_order]
    raw = _build_raw(pre, colors)
    if inv_map is not None:
        G = _gather_entries(raw, entry_gauss, inv_map)   # (n_tiles, K, 16)
    else:
        G = raw[entry_gauss]                             # (n_tiles, K, 16)
    return _assemble_A(G, ox, oy, entry_mask)


def _assemble_A(G, ox, oy, entry_mask):
    """Packed-A assembly from gathered per-entry rows G (T, K, 16) and
    per-row tile origins ox/oy (T,) — shared by the single-view and
    fused multi-view packers."""
    mx = G[..., 0] - ox[:, None]
    my = G[..., 1] - oy[:, None]
    c0, c1, c2 = G[..., 2], G[..., 3], G[..., 4]
    logopa = G[..., 5]
    tc = G[..., 6]
    rp0, rp1 = G[..., 7], G[..., 8]
    mask = entry_mask.astype(jnp.float32)

    q0 = (-0.5 * (c0 * mx * mx + c2 * my * my) - c1 * mx * my
          + logopa + jnp.where(mask > 0, 0.0, -1e30))
    q1 = c0 * mx + c1 * my
    q2 = c2 * my + c1 * mx
    # t = tc + rp.(mean - pix): constant term keeps +rp.mean, the pixel
    # coefficients flip sign
    t0 = tc + rp0 * mx + rp1 * my
    A = jnp.stack([G[..., 9], G[..., 10], G[..., 11],     # 0..2 rgb
                   G[..., 12], G[..., 13], G[..., 14],    # 3..5 normal
                   jnp.ones_like(q0),                     # 6 weight-one
                   q0, q1, q2, -0.5 * c0, -0.5 * c2, -c1,  # 7..12 power
                   t0, -rp0, -rp1], axis=1)               # 13..15 depth
    return A


def _pick_tb_chunk(n_tiles, chunk):
    """Largest tile batch of (8, 4, 2, 1) dividing n_tiles; shrink the
    chunk so the (TB x chunk x PX) working set stays within VMEM. The
    entry axis K is padded up to a chunk multiple by the caller (see
    _pad_entries), so chunk needs no K-divisibility adjustment."""
    for tb in (8, 4, 2, 1):
        if n_tiles % tb == 0:
            break
    while tb * chunk > 512 and chunk > 32:
        chunk //= 2
    return tb, max(chunk, 8)


def _pad_entries(A, chunk):
    """Pad the entry axis of (n_tiles, 16, K) A to a multiple of `chunk`
    with dead entries (q0 = -1e30 -> alpha 0). Differentiable: the
    concatenate's cotangent slices the pad columns off dA automatically."""
    K = A.shape[2]
    K_pad = -(-K // chunk) * chunk
    if K_pad == K:
        return A
    pad = jnp.zeros((A.shape[0], NCH, K_pad - K), A.dtype)
    pad = pad.at[:, 7, :].set(-1e30)      # q0 row
    return jnp.concatenate([A, pad], axis=2)


def _to_chunked(A, chunk):
    """(n_tiles, 16, K) -> (n_tiles, K//chunk, 16, chunk): the kernel
    indexes chunks on a MAJOR dim (lane-dim dynamic slices don't lower)."""
    n_tiles, _, K = A.shape
    return A.reshape(n_tiles, NCH, K // chunk, chunk).swapaxes(1, 2)


def _tchk_spec(tb, nC):
    return pl.BlockSpec((tb, nC, 1, PX), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _blend_call(meta, counts, A, with_residuals=False):
    """Forward blend. ``with_residuals``: also emit the per-chunk inbound
    transmittance (n_tiles, nC, 1, PX) for the one-pass reverse backward
    — returns (outs, tchk) instead of outs."""
    chunk0, interpret = meta
    n_tiles, K = A.shape[0], A.shape[2]
    tb, chunk = _pick_tb_chunk(n_tiles, chunk0)
    A4 = _to_chunked(A, chunk)
    nC = K // chunk

    def espec():
        return pl.BlockSpec((tb, nC, NCH, chunk),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def pspec(c):
        return pl.BlockSpec((tb, c, PX), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [pspec(R_CH), pspec(1), pspec(1), pspec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, R_CH, PX), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, PX), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, PX), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, PX), jnp.float32),
    ]
    if with_residuals:
        out_specs.append(_tchk_spec(tb, nC))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles, nC, 1, PX), jnp.float32))

        def kernel(cnt, a, o, d, md, t, tchk):
            _blend_fwd_kernel(cnt, a, o, d, md, t, tchk,
                              tb=tb, chunk=chunk, k_entries=K)
    else:
        def kernel(cnt, a, o, d, md, t):
            _blend_fwd_kernel(cnt, a, o, d, md, t, None,
                              tb=tb, chunk=chunk, k_entries=K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tb,),
        in_specs=[espec()],
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(counts, A4)
    if with_residuals:
        return outs[:4], outs[4]
    return outs


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend_entries(meta, counts, A):
    """Differentiable packed blend. meta = (chunk, interpret)."""
    return _blend_call(meta, counts, A)


def _blend_entries_fwd(meta, counts, A):
    outs, tchk = _blend_call(meta, counts, A, with_residuals=True)
    return outs, (counts, A, tchk, outs[3])


def _blend_entries_bwd(meta, res, cots):
    chunk0, interpret = meta
    counts, A, tchk, tleft = res
    gO, gd, gmd, gT = cots
    n_tiles, K = A.shape[0], A.shape[2]
    tb, chunk = _pick_tb_chunk(n_tiles, chunk0)
    bp, bt = _basis_planes()
    A4 = _to_chunked(A, chunk)
    nC = K // chunk

    def espec():
        return pl.BlockSpec((tb, nC, NCH, chunk),
                            lambda i, *_: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def pspec(c):
        return pl.BlockSpec((tb, c, PX), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    bspec = pl.BlockSpec((NCH, PX), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)

    def kernel(cnt, a, tchkr, tlft, bpr, btr, go, gdr, gmdr, gTr, da):
        _blend_bwd_kernel(cnt, a, tchkr, tlft, bpr, btr, go, gdr, gmdr,
                          gTr, da, tb=tb, chunk=chunk, k_entries=K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tb,),
        in_specs=[espec(), _tchk_spec(tb, nC), pspec(1), bspec, bspec,
                  pspec(R_CH), pspec(1), pspec(1), pspec(1)],
        out_specs=espec(),
    )
    dA4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, nC, NCH, chunk),
                                       jnp.float32),
        interpret=interpret,
    )(counts, A4, tchk, tleft, bp, bt, gO, gd, gmd, gT)
    dA = dA4.swapaxes(1, 2).reshape(n_tiles, NCH, K)
    return None, dA


_blend_entries.defvjp(_blend_entries_fwd, _blend_entries_bwd)


# ---------------------------------------------------------------------------
# full rasterize entries
# ---------------------------------------------------------------------------

def _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities, colors,
                           K4, cfg: RasterizeConfig, bg, means2d_probe,
                           interpret: bool, bins=None,
                           need_inverse: bool = False):
    if bg is None:
        bg = jnp.zeros(3, means_cam.dtype)
    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    if means2d_probe is not None:
        pre["mean2d"] = pre["mean2d"] + means2d_probe
    inv_map = None
    plan = None
    if bins is None:
        if need_inverse:
            entry_gauss, entry_mask, inv_map = _bin_gaussians(
                pre, cfg, return_inverse=True)
        else:
            entry_gauss, entry_mask = _bin_gaussians(pre, cfg)
    else:
        entry_gauss, entry_mask = bins[0], bins[1]
        if len(bins) >= 6:
            plan = bins[2:6]  # (order, inv_order, perm, bounds)
        elif need_inverse and len(bins) > 2:
            inv_map = bins[2]
        entry_mask = entry_mask & pre["valid"][entry_gauss]
    counts = jnp.sum(entry_mask.astype(jnp.int32), axis=1)  # (n_tiles,)

    # occupancy sort: batch tiles by descending entry count so each
    # TB-batch's chunk bound (= its max count) tracks its actual work;
    # without it one busy tile makes its whole batch blend 512 entries.
    # With a cached plan the order was fixed at bin time (the fresh
    # validity only perturbs counts marginally — batch balance, not
    # results) so the gradient-reduction permutation stays valid.
    if plan is not None:
        order, inv_order = plan[0], plan[1]
    else:
        order = jnp.argsort(-counts)
        inv_order = jnp.argsort(order)
    entry_gauss = entry_gauss[order]
    entry_mask = entry_mask[order]
    counts = counts[order]
    if inv_map is not None:
        # re-point the inverse map at the permuted tile rows
        Kp = cfg.max_per_tile
        t_of = jnp.maximum(inv_map // Kp, 0)
        inv_map = jnp.where(inv_map >= 0,
                            inv_order[t_of] * Kp + inv_map % Kp, -1)

    if plan is not None:
        ox, oy = _tile_origins(cfg)
        raw = _build_raw(pre, colors)
        G = _gather_entries_planned(raw, entry_gauss, plan[2], plan[3])
        A = _assemble_A(G, ox[order], oy[order], entry_mask)
    else:
        A = _pack_entries(pre, colors, entry_gauss, entry_mask, cfg,
                          tile_order=order, inv_map=inv_map)
    _, chunk = _pick_tb_chunk(cfg.n_tiles, cfg.chunk)
    A = _pad_entries(A, chunk)
    O, dsum3, mdep3, T3 = _blend_entries((cfg.chunk, interpret), counts, A)
    # undo the occupancy permutation
    O = O[inv_order]
    dsum3 = dsum3[inv_order]
    mdep3 = mdep3[inv_order]
    T3 = T3[inv_order]
    maps = _image_maps(O.swapaxes(1, 2), dsum3.swapaxes(1, 2),
                       mdep3.swapaxes(1, 2), T3.swapaxes(1, 2),
                       bg, K4, cfg)
    maps["radii"] = pre["radius"]
    maps["visibility"] = pre["valid"] & (pre["radius"] > 0)
    return maps


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas(means_cam, quats_wxyz, scales, opacities, colors, K4,
                     cfg: RasterizeConfig, bg=None, means2d_probe=None,
                     interpret: bool = False, bins=None):
    """Differentiable Pallas render — drop-in for ops/gs_raster.rasterize
    on the outputs the mapping losses consume (no coord/mcoord maps).
    Gradients flow to all Gaussian attributes, the probe, and (through
    means_cam / quats) the camera pose deltas.
    """
    # need_inverse=False: the inverse-map gather backward measured SLOWER
    # than XLA's scatter-add on the v5 chip (see _gather_entries).
    return _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities,
                                  colors, K4, cfg, bg, means2d_probe,
                                  interpret, bins=bins, need_inverse=False)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas_forward(means_cam, quats_wxyz, scales, opacities,
                             colors, K4, cfg: RasterizeConfig,
                             bg=None, interpret: bool = False, bins=None):
    """Forward-only render using the Pallas tile kernel (rendering, eval,
    data_update, viz)."""
    return _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities,
                                  colors, K4, cfg, bg, None, interpret,
                                  bins=bins)


# ---------------------------------------------------------------------------
# fused multi-view render: ONE blend kernel call for V views
# ---------------------------------------------------------------------------

def _image_maps(Opx, dsum, mdep, T, bg, K4, cfg: RasterizeConfig):
    """Per-view image-space output assembly from untiled accumulators —
    the tail of _rasterize_pallas_impl, shared with the fused path.
    Opx (n_tiles, PX, 8), dsum/mdep/T (n_tiles, PX, 1)."""
    fx, fy = K4[0], K4[1]
    csum = Opx[..., 0:3]
    nsum = Opx[..., 3:6]
    wsum = Opx[..., 6:7]
    color_img = _untile(csum, cfg) + _untile(T, cfg) * bg
    w = _untile(wsum, cfg)[..., 0]
    anyc = w > 0
    w_safe = jnp.where(anyc, jnp.maximum(w, 1e-12), 1.0)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height, dtype=jnp.float32),
                          jnp.arange(cfg.width, dtype=jnp.float32),
                          indexing="ij")
    pnx = (xx - cfg.width / 2.0) / fx
    pny = (yy - cfg.height / 2.0) / fy
    ln = jnp.sqrt(pnx * pnx + pny * pny + 1.0)
    depth = jnp.where(anyc, _untile(dsum, cfg)[..., 0] / ln / w_safe, 0.0)
    mdepth = _untile(mdep, cfg)[..., 0] / ln
    nsum_img = _untile(nsum, cfg)
    nlen = jnp.sqrt(jnp.sum(nsum_img ** 2, -1, keepdims=True)
                    + NORMALIZE_EPS ** 2)
    normal = jnp.where(anyc[..., None], nsum_img / nlen, 0.0)
    return {"color": color_img, "alpha": w, "depth": depth,
            "mdepth": mdepth, "normal": normal}


def _rasterize_pallas_multi_impl(means_cam, quats_wxyz, scales, opacities,
                                 colors, K4, cfg: RasterizeConfig, bg,
                                 interpret: bool, bins=None,
                                 means2d_probe=None):
    """Fused V-view render: ONE Pallas blend (and ONE backward) over the
    concatenated V * n_tiles tile rows.

    means_cam (V, P, 3) / quats_wxyz (V, P, 4) are per-view CAMERA-frame
    Gaussians; scales/opacities/colors are the shared world attributes.
    The sequential alternative — a lax.scan of single-view renders — pays
    V× the fixed per-stage cost (kernel ramp-up, small-op dispatch,
    per-view scatter in the backward); here the occupancy sort, the blend
    grid, and the pack-gradient scatter all amortize across the views
    (the windowed mapping optimizer's per-iteration render count is the
    dominant live cost, gs_backend_per_frame.py:451-594). Outputs carry a
    leading V axis; per-view results equal rasterize_pallas to float
    tolerance (tests/test_gs_raster_pallas.py::test_multi_view_fused_parity).
    """
    if bg is None:
        bg = jnp.zeros(3, means_cam.dtype)
    V = means_cam.shape[0]
    P = means_cam.shape[1]
    nt = cfg.n_tiles

    pre = jax.vmap(lambda m, q: _preprocess(m, q, scales, opacities, K4,
                                            cfg))(means_cam, quats_wxyz)
    if means2d_probe is not None:  # (V, P, 2) viewspace grad probes
        pre["mean2d"] = pre["mean2d"] + means2d_probe
    K = cfg.max_per_tile
    plan = None
    if bins is None:
        entry_gauss, entry_mask = jax.vmap(
            lambda p: _bin_gaussians(p, cfg))(pre)
    else:
        entry_gauss, entry_mask = bins[0], bins[1]
        if len(bins) >= 6:
            plan = bins[2:6]  # per-view stacked (order, inv, perm, bounds)
        entry_mask = entry_mask & jax.vmap(
            lambda val, eg: val[eg])(pre["valid"], entry_gauss)

    voff = (jnp.arange(V, dtype=jnp.int32) * P)[:, None, None]
    ox1, oy1 = _tile_origins(cfg)
    raw = jax.vmap(lambda p: _build_raw(p, colors))(pre)      # (V, P, 16)

    if plan is not None:
        # cached per-view plans: rows sorted per view (the joint
        # cross-view sort below needs fresh counts, which would
        # invalidate the cached gradient-reduction permutation); the
        # masked entries of each view sit between its last Gaussian
        # segment and the next view's block and carry zero gradients
        order_v, inv_order_v, perm_v, bounds_v = plan
        eg_s = jnp.take_along_axis(entry_gauss, order_v[:, :, None], 1)
        em_s = jnp.take_along_axis(entry_mask, order_v[:, :, None], 1)
        eg_flat = (eg_s + voff).reshape(V * nt, K)
        mask_flat = em_s.reshape(V * nt, K)
        counts_flat = jnp.sum(mask_flat.astype(jnp.int32), axis=1)
        ox = jax.vmap(lambda o: ox1[o])(order_v).reshape(-1)
        oy = jax.vmap(lambda o: oy1[o])(order_v).reshape(-1)
        ntK = nt * K
        perm_flat = (perm_v
                     + (jnp.arange(V, dtype=jnp.int32) * ntK)[:, None]
                     ).reshape(-1)
        bounds_flat = jnp.concatenate([
            (bounds_v[:, :P]
             + (jnp.arange(V, dtype=jnp.int32) * ntK)[:, None]
             ).reshape(-1),
            (V - 1) * ntK + bounds_v[-1, P:],
        ])
        G = _gather_entries_planned(raw.reshape(V * P, NCH), eg_flat,
                                    perm_flat, bounds_flat)
        A = _assemble_A(G, ox, oy, mask_flat)
    else:
        counts = jnp.sum(entry_mask.astype(jnp.int32), axis=2)  # (V, nt)
        # occupancy sort PER VIEW, then flatten: the gather stays a
        # batched (V, P, 16)[(V, nt, K)] row gather whose BACKWARD is a
        # batched per-view scatter-add — one flat (V*P)-row scatter over
        # all views' 3.9M entries measured 349 ms at the V=10 bench load
        # vs ~117 ms for V independent single-view scatters
        # (scripts/profile_window_breakdown.py, 2026-08-20); the batch
        # balance loss vs a cross-view sort is marginal (each TB batch
        # still groups same-occupancy tiles of one view).
        order_v = jnp.argsort(-counts, axis=1)                 # (V, nt)
        inv_order_v = jnp.argsort(order_v, axis=1)
        eg_s = jnp.take_along_axis(entry_gauss, order_v[:, :, None], 1)
        em_s = jnp.take_along_axis(entry_mask, order_v[:, :, None], 1)
        G = _gather_mv(raw, eg_s)                        # (V, nt, K, 16)
        mask_flat = em_s.reshape(V * nt, K)
        counts_flat = jnp.take_along_axis(counts, order_v, 1).reshape(-1)
        ox = jax.vmap(lambda o: ox1[o])(order_v).reshape(-1)
        oy = jax.vmap(lambda o: oy1[o])(order_v).reshape(-1)
        A = _assemble_A(G.reshape(V * nt, K, NCH), ox, oy, mask_flat)

    _, chunk = _pick_tb_chunk(V * nt, cfg.chunk)
    A = _pad_entries(A, chunk)
    O, dsum3, mdep3, T3 = _blend_entries((cfg.chunk, interpret),
                                         counts_flat, A)
    # both paths sort per view now: undo with the per-view inverse
    unperm = (inv_order_v
              + (jnp.arange(V, dtype=jnp.int32) * nt)[:, None]
              ).reshape(-1)
    O = O[unperm].reshape(V, nt, R_CH, PX)
    dsum3 = dsum3[unperm].reshape(V, nt, 1, PX)
    mdep3 = mdep3[unperm].reshape(V, nt, 1, PX)
    T3 = T3[unperm].reshape(V, nt, 1, PX)

    maps = jax.vmap(lambda o, d, md, t: _image_maps(
        o.swapaxes(1, 2), d.swapaxes(1, 2), md.swapaxes(1, 2),
        t.swapaxes(1, 2), bg, K4, cfg))(O, dsum3, mdep3, T3)
    maps["radii"] = pre["radius"]                             # (V, P)
    maps["visibility"] = pre["valid"] & (pre["radius"] > 0)   # (V, P)
    return maps


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas_multi(means_cam, quats_wxyz, scales, opacities,
                           colors, K4, cfg: RasterizeConfig, bg=None,
                           interpret: bool = False, bins=None,
                           means2d_probe=None):
    """Differentiable fused multi-view render (see impl docstring).
    ``bins``: optional stacked (V, n_tiles, K) binning from a lax.map of
    compute_bins (slam/mapping.py _bin_window) — reused across an
    optimization segment like the single-view path. ``means2d_probe``:
    optional (V, P, 2) zeros whose cotangent is each view's viewspace
    positional gradient (densification stats, like the single-view
    probe)."""
    return _rasterize_pallas_multi_impl(means_cam, quats_wxyz, scales,
                                        opacities, colors, K4, cfg, bg,
                                        interpret, bins=bins,
                                        means2d_probe=means2d_probe)
