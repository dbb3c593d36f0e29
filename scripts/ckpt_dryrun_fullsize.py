"""Full-size checkpoint-converter dry run (VERDICT r3 #5).

No real ``cut3r_512_dpt_4_64.pth`` exists in this environment, so this
script proves the converter + parameter layout AT SCALE before one ever
shows up: it instantiates the reference torch ``ARCroco3DStereo`` at the
real checkpoint architecture (ViT-L/24 encoder 1024-d, 12x768 decoder,
768 state tokens, local_mem 256, DPT heads + RGB + pose — hi2.py:21,
/root/reference/src/dust3r/model.py:306,386-418) with RANDOM weights,
converts the full state_dict through models/convert.py, loads it into
our flax CUT3R, runs ONE 512x384 V=6 submap decode + a batch-1 encode on
the default device, and asserts finite outputs. Records parameter/count
coverage and device peak memory.

Usage:  python scripts/ckpt_dryrun_fullsize.py
Output: a JSON line (committed to IMPLEMENTATION_STATUS.md) + rc 0/1.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REF = "/root/reference/src"
sys.path.insert(0, REF)
sys.path.insert(0, REF + "/croco")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def count_leaves(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def main():
    H, W, V = 384, 512, 6
    t0 = time.time()
    import torch
    torch.manual_seed(0)
    from dust3r.model import ARCroco3DStereo, ARCroco3DStereoConfig
    inf = float("inf")
    tcfg = ARCroco3DStereoConfig(
        state_size=768, state_pe="2d", pos_embed="RoPE100",
        rgb_head=True, pose_head=True, patch_embed_cls="PatchEmbedDust3R",
        img_size=(H, W), head_type="dpt", output_mode="pts3d+pose",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        pose_mode=("exp", -inf, inf),
        enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
        dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        local_mem_size=256, state_dec_num_heads=16,
        landscape_only=False,
    )
    with torch.no_grad():
        net = ARCroco3DStereo(tcfg).eval()
    sd = net.state_dict()
    n_torch = sum(int(v.numel()) for v in sd.values())
    print(f"[{time.time()-t0:.0f}s] torch model built: "
          f"{len(sd)} tensors, {n_torch/1e6:.1f}M params", flush=True)

    from cut3r_slam_tpu.models.convert import convert_state_dict
    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
    from cut3r_slam_tpu.models.patch_embed import patch_positions

    converted = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    del net, sd
    n_conv = count_leaves(converted)
    print(f"[{time.time()-t0:.0f}s] converted: {n_conv/1e6:.1f}M params",
          flush=True)

    cfg = CUT3RConfig()  # full cut3r_512_dpt_4_64 arch
    model = CUT3R(cfg)
    # shape-check against a real init at the same scale
    ref_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 1, H, W, 3), jnp.float32)))
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
    flat_cv = dict(jax.tree_util.tree_flatten_with_path(
        {"params": converted.get("params", converted)})[0])
    missing, mismatched = [], []
    for path, leaf in flat_ref:
        got = flat_cv.get(path)
        if got is None:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(got.shape) != tuple(leaf.shape):
            mismatched.append((jax.tree_util.keystr(path),
                               tuple(got.shape), tuple(leaf.shape)))
    extra = [jax.tree_util.keystr(p) for p in flat_cv
             if p not in dict(flat_ref)]
    print(f"[{time.time()-t0:.0f}s] layout check: missing={len(missing)} "
          f"mismatched={len(mismatched)} extra={len(extra)}", flush=True)
    for m in (missing + [str(x) for x in mismatched] + extra)[:20]:
        print("   ", m, flush=True)

    params = jax.tree.map(jnp.asarray,
                          {"params": converted.get("params", converted)})

    # one batch-1 encode + one V=6 submap decode at full scale
    img = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, H, W, 3)), jnp.float32)
    feat, _ = jax.jit(lambda p, x: model.apply(
        p, x, method=CUT3R.encode_image))(params, img)
    p16 = cfg.patch_size

    @jax.jit
    def dec(p, f):
        pos = patch_positions(V, H // p16, W // p16)
        out, _ = model.apply(p, f, pos[:, None], H, W, None, jnp.int32(0),
                             method=CUT3R.decode_views,
                             head_outputs=("self", "pose"))
        return out["pts3d_in_self_view"], out["camera_pose"]

    f0 = feat[0]  # (n_tok, enc_dim)
    featV = jnp.broadcast_to(f0[None, None],
                             (V, 1) + f0.shape)
    pts, pose = jax.block_until_ready(dec(params, featV))
    ok = bool(jnp.isfinite(pts).all()) and bool(jnp.isfinite(pose).all())
    print(f"[{time.time()-t0:.0f}s] decode ok={ok} pts={pts.shape} "
          f"pose={pose.shape}", flush=True)

    mem = {}
    try:
        st = jax.devices()[0].memory_stats()
        if st:
            mem = {"peak_bytes_in_use": int(st.get("peak_bytes_in_use", 0)),
                   "bytes_in_use": int(st.get("bytes_in_use", 0))}
    except Exception:
        pass

    out = {"ok": ok and not missing and not mismatched,
           "finite": ok,
           "torch_params_M": round(n_torch / 1e6, 1),
           "converted_params_M": round(n_conv / 1e6, 1),
           "missing": len(missing), "mismatched": len(mismatched),
           "extra": len(extra),
           "backend": jax.default_backend(),
           "memory": mem,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
