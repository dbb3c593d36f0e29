"""Frontend/keyframe/motion-filter integration on the tiny model (CPU).

Synthesizes a short image sequence, runs the motion filter + frontend and
checks keyframe selection, submap writeback shapes, and pose validity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
from cut3r_slam_tpu.slam import (KeyframeStore, MotionFilter, TrackFrontend,
                                 FactorGraph, SUBMAP_SIZE)

H, W = 32, 48
TOKENS = (H // 16) * (W // 16)


@pytest.fixture(scope="module")
def setup():
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    imgs = jnp.zeros((1, 1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    return model, params, cfg


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    # drifting random pattern so consecutive frames share content
    base = rng.uniform(0, 255, size=(H, W + n, 3)).astype(np.uint8)
    return [np.ascontiguousarray(base[:, i:i + W]) for i in range(n)]


def test_keyframe_store_basics(setup):
    model, params, cfg = setup
    kf = KeyframeStore(capacity=16, img_hw=(H, W), feat_tokens=TOKENS,
                       feat_dim=cfg.enc_embed_dim)
    f = np.zeros((H, W, 3), np.uint8)
    feat = jnp.ones((TOKENS, cfg.enc_embed_dim))
    i = kf.append(0, f, feat, pose=np.array([1, 2, 3, 0, 0, 0, 1], np.float32))
    assert i == 0 and kf.count == 1
    np.testing.assert_allclose(np.asarray(kf.featI[0]), 1.0)
    kf.normalize_scale(2.0)
    np.testing.assert_allclose(kf.pose[0, :3], [2, 4, 6])


def test_motion_filter_forced_keyframes(setup):
    model, params, cfg = setup
    kf = KeyframeStore(capacity=16, img_hw=(H, W), feat_tokens=TOKENS,
                       feat_dim=cfg.enc_embed_dim)
    mf = MotionFilter(model, params, kf, thresh=0.9, skip=2)
    frames = _frames(4)
    assert mf(0, frames[0], intrinsic=np.array([20, 20, W / 2, H / 2], np.float32))
    # frame 1: not a skip frame, not forced -> no keyframe
    assert not mf(1, frames[1])
    # last/second-last forced
    assert mf(2, frames[2], second_last=True)
    assert mf(3, frames[3], last=True)
    assert kf.count == 3


def test_frontend_init_and_submap(setup):
    model, params, cfg = setup
    kf = KeyframeStore(capacity=32, img_hw=(H, W), feat_tokens=TOKENS,
                       feat_dim=cfg.enc_embed_dim)
    fe = TrackFrontend(model, params, kf, FactorGraph())
    K = np.array([20.0, 20.0, W / 2, H / 2], np.float32)
    frames = _frames(2 * SUBMAP_SIZE + 4)
    for t, f in enumerate(frames):
        kf.append(t, f, feat=jnp.zeros((TOKENS, cfg.enc_embed_dim)),
                  intrinsic=K)

    # warmup init: counter-1 == warmup after 7 keyframes -> but we appended
    # them all, so drive run() manually at the init boundary
    fe.is_initialized = False
    kf.count = SUBMAP_SIZE + 2  # pretend 7 KFs
    rb, rng_, sub = fe.run(0)
    assert fe.is_initialized and rng_ == range(0, SUBMAP_SIZE + 1) and sub == 0
    # poses written for tracked KFs, unit quaternions
    q = kf.pose[:SUBMAP_SIZE + 1, 3:7]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1, atol=1e-4)
    # submap pointmaps written at half res
    assert float(jnp.abs(kf.submap_pts[0]).max()) > 0

    # steady-state: 5 more KFs -> second submap (re-tracks overlap KF t0=5)
    kf.count = 2 * SUBMAP_SIZE + 2
    rb, rng2, sub2 = fe.run(1)
    assert rng2 == range(SUBMAP_SIZE, 2 * SUBMAP_SIZE + 1)
    assert sub2 == SUBMAP_SIZE // SUBMAP_SIZE == 1
    depths = kf.depth[:2 * SUBMAP_SIZE + 1]
    assert np.all(np.isfinite(depths))


def test_factor_graph_dedup():
    g = FactorGraph()
    g.add_factors([0, 0, 1], [1, 1, 0])
    assert len(g.ii) == 2
    g.add_factors([0], [1])
    assert len(g.ii) == 2
    g.add_neighborhood_factors(0, 4, r=1)
    assert set(zip(g.ii.tolist(), g.jj.tolist())) >= {(2, 3), (3, 2), (1, 2)}


def test_detect_loop_gap():
    g = FactorGraph()
    g.add_factors([20, 20], [1, 19])
    cand = g.detect_loop(20, temporal_window=8)
    assert cand is not None and list(cand) == [1]


def test_infer_from_stored_tokens_matches_full_forward(setup):
    """The frontend decodes from kf.featI (motion-filter encoder output);
    results must equal the full image forward — the encoder tokens are
    the same, the recurrence starts fresh either way."""
    model, params, cfg = setup
    kf = KeyframeStore(capacity=8, img_hw=(H, W), feat_tokens=TOKENS,
                       feat_dim=cfg.enc_embed_dim)
    fe = TrackFrontend(model, params, kf, FactorGraph())
    mf = MotionFilter(model, params, kf, kf_every=1)
    frames = _frames(SUBMAP_SIZE + 1)
    for t, f in enumerate(frames):
        mf(t, f)  # encodes + stores featI
    assert kf.count == SUBMAP_SIZE + 1

    pts_feat, conf_feat, c2w_feat = fe._infer(params, kf.featI[:fe.V])

    from cut3r_slam_tpu.models.cut3r import normalize_images
    x = normalize_images(jnp.asarray(np.stack(frames)))[:, None]
    out = model.apply(params, x, head_outputs=("self", "pose"))
    np.testing.assert_allclose(np.asarray(pts_feat),
                               np.asarray(out["pts3d_in_self_view"][:, 0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(conf_feat),
                               np.asarray(out["conf_self"][:, 0]),
                               atol=1e-4, rtol=1e-4)
