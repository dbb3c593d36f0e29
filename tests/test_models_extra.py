"""Tests for Spann3R, PriorNet, multiview datasets, TBPTT step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

RNG = np.random.default_rng(5)


def test_spann3r_step_and_memory():
    from cut3r_slam_tpu.models.spann3r import Spann3R, Spann3RConfig
    cfg = Spann3RConfig.tiny()
    model = Spann3R(cfg)
    V, B, H, W = 3, 1, 32, 32
    imgs = jnp.asarray(RNG.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    preds, mem = jax.jit(model.apply)(params, imgs)
    assert len(preds) == V
    for p in preds:
        assert p["pts3d"].shape == (B, H, W, 3)
        assert np.all(np.asarray(p["conf"]) > 1.0)
        assert np.all(np.isfinite(np.asarray(p["pts3d"])))
    # memory populated: working ring holds the last frames
    assert bool(mem.work_valid.any())
    # third frame displaced the first into long memory (ring size 2)
    assert bool(mem.long_valid.any())


def test_priornet_shapes():
    from cut3r_slam_tpu.models.priors import PriorNet, normalize_imagenet
    img = normalize_imagenet(jnp.asarray(
        RNG.integers(0, 255, (1, 32, 32, 3)), jnp.uint8))
    for task, ch in (("depth", None), ("normal", 3)):
        net = PriorNet(task=task, embed_dim=32, depth=4, num_heads=2)
        params = net.init(jax.random.PRNGKey(0), img)
        out = net.apply(params, img)
        if task == "depth":
            assert out.shape == (1, 32, 32)
            assert np.all(np.asarray(out) > 0)
        else:
            assert out.shape == (1, 32, 32, 3)
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-4)


class _FakeSource:
    def __init__(self, n=40, hw=(24, 32)):
        self.n = n
        self.hw = hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        H, W = self.hw
        r = np.random.default_rng(i)  # deterministic per index
        return {"image": r.integers(0, 255, (H, W, 3)).astype(np.uint8),
                "depth": np.full((H, W), 2.0, np.float32),
                "pose": np.array([i * 0.1, 0, 0, 0, 0, 0, 1], np.float32),
                "K4": np.array([20.0, 20.0, W / 2, H / 2], np.float32)}


def test_multiview_dataset_and_combinators():
    from cut3r_slam_tpu.datasets.multiview import MultiViewDataset, make_batch_iter
    ds = MultiViewDataset(_FakeSource(), num_views=3, span=10,
                          resolution=(16, 16))
    views = ds[0]
    assert len(views) == 3 and views[0]["img"].shape == (16, 16, 3)
    # combinators
    big = ds @ 3 + ds
    assert len(big) == 4 * len(ds)
    assert len(big[len(ds) * 3 + 1]) == 3
    # deterministic given index
    a = ds[5]
    b = ds[5]
    np.testing.assert_array_equal(a[0]["img"], b[0]["img"])

    it = make_batch_iter(ds, batch_size=2)
    batch = next(it)
    assert batch["imgs"].shape == (3, 2, 16, 16, 3)
    assert batch["pts3d"].shape == (3, 2, 16, 16, 3)
    assert batch["camera_pose"].shape == (3, 2, 4, 4)


def test_tbptt_step_runs():
    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
    from cut3r_slam_tpu.train import make_tbptt_train_step
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    V, B, H, W = 4, 1, 32, 48
    rng = np.random.default_rng(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32),
        "pts3d": jnp.asarray(rng.normal(size=(V, B, H, W, 3)), jnp.float32),
        "camera_pose": jnp.broadcast_to(jnp.eye(4), (V, B, 4, 4)),
        "valid_mask": jnp.ones((V, B, H, W), bool),
    }
    import optax
    tx = optax.adam(1e-3)  # constant lr (make_optimizer warms up from 0)
    params = model.init(jax.random.PRNGKey(0), batch["imgs"])
    step = jax.jit(make_tbptt_train_step(model, tx, chunk=2, grad_chunks=1))
    opt_state = tx.init(params)
    params2, opt_state, aux = step(params, opt_state, batch)
    assert np.isfinite(float(aux["total"]))
    # params changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, params2)
    assert max(jax.tree.leaves(d)) > 0


class TestPriorWiring:
    def test_motion_filter_stores_priors(self):
        """Config-gated mono-prior hook: kfFilter computes + stores
        PriorNet depth/normal per keyframe (motion_filter.py:58-66
        call-site in the reference)."""
        import numpy as np
        import jax.numpy as jnp
        from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
        from cut3r_slam_tpu.slam.system import SLAMSystem

        cfg_m = CUT3RConfig.tiny()
        model = CUT3R(cfg_m)
        H, W = 32, 48
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 1, H, W, 3)))
        cfg = {"Tracking": {"motion_filter": {
            "kf_every": 1, "use_prior": True,
            "prior_dim": 32, "prior_depth_blocks": 2}}}
        slam = SLAMSystem(model, params, cfg, buffer=8, img_hw=(H, W),
                          enable_mapping=False, enable_loop=False,
                          output_dir="/tmp/prior_test")
        img = np.full((H, W, 3), 128, np.uint8)
        K4 = np.asarray([40.0, 40.0, W / 2, H / 2], np.float32)
        slam.run(0, img, K4)
        kf = slam.keyframes
        assert kf.prior_depth is not None and kf.count == 1
        assert kf.prior_depth[0].shape == (H, W)
        assert float(kf.prior_depth[0].min()) >= 0.0  # softplus depth
        n = kf.prior_normal[0]
        nlen = np.linalg.norm(n, axis=-1)
        np.testing.assert_allclose(nlen, 1.0, atol=1e-3)  # unit normals
