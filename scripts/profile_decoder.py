"""Profile the CUT3R submap-tracking hot programs on the current device.

Times, at the live full scale (ViT-L encoder, 512x384, V=6 submap):
  encoder   encode_image batch-1 (the per-frame motion-filter cost)
  decoder   the jitted V=6 decode-from-stored-tokens submap program
            (slam/frontend.py _infer: fused dual-stream decoder +
            self-pointmap DPT + pose head)
and reports per-call ms plus MFU derived from XLA's own cost analysis
(compiled.cost_analysis()['flops']) against the chip's peak. Peak
defaults to TPU v5e bf16 (197 TFLOP/s); override with PEAK_TFLOPS env.

Counterpart evidence for the reference's per-submap decode cost
(/root/reference/src/dust3r/model.py:660-698 semantics, measured there
as part of the 16-FPS RTX-4090 end-to-end run, README.md:114).

Usage: python scripts/profile_decoder.py  (run on the TPU; results are
committed to IMPLEMENTATION_STATUS.md's performance table)
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig  # noqa: E402
from cut3r_slam_tpu.models.patch_embed import patch_positions  # noqa: E402

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", 197.0))  # v5e bf16


def timed(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    # host readback = reliable sync under the axon tunnel
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def compile_once(jitted, *args):
    """Lower+compile FIRST and return (callable-executable, flops).

    ADVICE r3: calling .lower().compile() after timed() doubled the
    multi-minute compile work on a cold cache; compiling once up front
    and timing the returned executable shares the work. flops is None
    (not 0) when cost_analysis lacks the key, so a missing model is
    distinguishable from an idle chip in the committed table."""
    c = jitted.lower(*args).compile()
    flops = None
    try:
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and "flops" in ca:
            flops = float(ca["flops"])
    except Exception:
        pass
    return c, flops


def main():
    H, W, V = 384, 512, 6
    cfg = CUT3RConfig()
    model = CUT3R(cfg)
    print(f"backend={jax.default_backend()} arch=ViT-L/{cfg.dec_depth}dec "
          f"{W}x{H} V={V}", flush=True)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 1, H, W, 3), jnp.float32))
    if os.environ.get("PARAM_DTYPE", "") in ("bf16", "bfloat16"):
        # store weights in bf16: batch-1 transformer inference is HBM
        # weight-streaming bound, so halving the weight bytes targets the
        # dominant traffic; compute stays in compute_dtype (bf16) with
        # f32 layernorms, same as the f32-stored path after its casts
        from cut3r_slam_tpu.models.convert import cast_params_bf16
        params = cast_params_bf16(params)
        print("params cast to bf16 storage", flush=True)
    p16 = cfg.patch_size
    n_tok = (H // p16) * (W // p16)

    # --- encoder (per-frame motion-filter cost) ---
    img = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, H, W, 3)), jnp.float32)
    enc = jax.jit(lambda p, x: model.apply(p, x,
                                           method=CUT3R.encode_image))
    enc_c, f_enc = compile_once(enc, params, img)
    t_enc = timed(enc_c, params, img)

    # --- V=6 submap decode from stored tokens (frontend._infer body) ---
    feat = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (V, 1, n_tok, cfg.enc_embed_dim)), jnp.float32)

    @jax.jit
    def dec(p, f):
        pos = patch_positions(V, H // p16, W // p16)
        out, _ = model.apply(p, f, pos[:, None], H, W, None, jnp.int32(0),
                             method=CUT3R.decode_views,
                             head_outputs=("self", "pose"))
        return out["pts3d_in_self_view"], out["camera_pose"]

    dec_c, f_dec = compile_once(dec, params, feat)
    t_dec = timed(dec_c, params, feat)

    def mfu(flops, ms):
        if flops is None or not ms:
            return None  # 'flops unavailable' != idle chip
        return flops / (ms * 1e-3) / (PEAK_TFLOPS * 1e12)

    rows = [
        ("encoder_b1", t_enc, f_enc, mfu(f_enc, t_enc)),
        ("decode_submap_v6", t_dec, f_dec, mfu(f_dec, t_dec)),
    ]
    print(f"{'program':<20}{'ms':>10}{'GFLOP':>12}{'MFU':>8}")
    for name, ms, fl, u in rows:
        gf = "n/a" if fl is None else f"{fl / 1e9:.1f}"
        uu = "n/a" if u is None else f"{u:.1%}"
        print(f"{name:<20}{ms:>10.2f}{gf:>12}{uu:>8}")
    print(json.dumps({
        "backend": jax.default_backend(),
        "peak_tflops": PEAK_TFLOPS,
        "encoder_b1_ms": round(t_enc, 2),
        "encoder_b1_mfu": (None if mfu(f_enc, t_enc) is None
                           else round(mfu(f_enc, t_enc), 4)),
        "decode_submap_v6_ms": round(t_dec, 2),
        "decode_submap_v6_mfu": (None if mfu(f_dec, t_dec) is None
                                 else round(mfu(f_dec, t_dec), 4)),
    }), flush=True)


if __name__ == "__main__":
    main()
