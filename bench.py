"""Benchmark: CUT3R tracking-step throughput on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference runs Replica room0 (2000 frames) in ~2 min on an
RTX 4090 (≈16 FPS end-to-end, README.md:114). The tracking frontend
processes frames in 5-keyframe submaps through CUT3R; this bench measures
the per-frame cost of that hot path (encoder + recurrent decoder + DPT
heads at the live 512×384 resolution) and reports effective FPS.
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BASELINE_FPS = 16.0  # reference end-to-end FPS on RTX 4090 (README.md:114)


def main():
    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg = CUT3RConfig()  # full cut3r_512_dpt_4_64 architecture
        V, B, H, W = 5, 1, 384, 512
    else:  # CPU smoke mode
        cfg = CUT3RConfig.tiny()
        V, B, H, W = 5, 1, 32, 48

    model = CUT3R(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(V, B, H, W, 3)),
        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)

    @jax.jit
    def submap_step(params, imgs):
        # the live tracking path: self-pointmap + pose heads only
        out = model.apply(params, imgs, head_outputs=("self", "pose"))
        return out["pts3d_in_self_view"], out["camera_pose"], out["conf_self"]

    # warmup / compile (note: on the axon tunnel block_until_ready does
    # NOT actually block — a host readback is the only reliable sync)
    out = submap_step(params, imgs)
    _ = np.asarray(out[1])

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = submap_step(params, imgs)
    _ = np.asarray(out[1])  # data-dependent sync on the whole chain
    dt = (time.perf_counter() - t0) / iters

    # one submap step covers V keyframes; with kf skip=5 (motion filter
    # checks every 5th frame) each KF covers ~5 raw frames on Replica
    frames_per_step = V * 5
    fps = frames_per_step / dt
    print(json.dumps({
        "metric": "cut3r_tracking_fps_512x384" if on_tpu else "cut3r_tracking_fps_tiny_cpu",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
