"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.parallel import make_mesh, shard_batch, fsdp_shard_params
from cut3r_slam_tpu.parallel.inference import make_sharded_forward
from cut3r_slam_tpu.models import CUT3R, CUT3RConfig

pytestmark = [pytest.mark.slow,  # integration tier (VERDICT r4 #9)
              pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")]


def test_mesh_shapes():
    mesh = make_mesh(8, axes=("dp", "fsdp"), shape=(4, 2))
    assert mesh.shape == {"dp": 4, "fsdp": 2}


def test_fsdp_shard_params_divisible():
    mesh = make_mesh(8, axes=("dp", "fsdp"), shape=(4, 2))
    params = {"big": jnp.zeros((256, 512)), "small": jnp.zeros((4,))}
    sharded = fsdp_shard_params(mesh, params, axis="fsdp")
    # big param sharded over its largest divisible dim
    assert not sharded["big"].sharding.is_fully_replicated
    assert sharded["small"].sharding.is_fully_replicated


def test_sharded_forward_matches_single():
    mesh = make_mesh(8, axes=("dp",), shape=(8,))
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    V, B, H, W = 2, 8, 32, 48
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs[:, :1])

    fn, place_params, place_batch = make_sharded_forward(model, mesh)
    with mesh:
        out = fn(place_params(params), place_batch(imgs))
    ref = model.apply(params, imgs)
    np.testing.assert_allclose(np.asarray(out["pts3d_in_other_view"]),
                               np.asarray(ref["pts3d_in_other_view"]),
                               rtol=2e-3, atol=2e-4)


class TestTensorParallel:
    def test_tp_param_specs_layout(self):
        """Megatron layout: qkv/fc1 column-split, proj/fc2 row-split,
        norms/embeddings replicated."""
        from jax.sharding import PartitionSpec as P
        from cut3r_slam_tpu.parallel.inference import tp_param_specs
        import flax
        params = {"params": {
            "enc_blocks_0": {
                "attn": {"qkv": {"kernel": np.zeros((8, 24)),
                                 "bias": np.zeros(24)},
                         "proj": {"kernel": np.zeros((8, 8)),
                                  "bias": np.zeros(8)}},
                "mlp": {"fc1": {"kernel": np.zeros((8, 32)),
                                "bias": np.zeros(32)},
                        "fc2": {"kernel": np.zeros((32, 8)),
                                "bias": np.zeros(8)}},
                "norm1": {"scale": np.ones(8), "bias": np.zeros(8)},
            }}}
        specs = flax.traverse_util.flatten_dict(
            tp_param_specs(params), sep="/")
        assert specs["params/enc_blocks_0/attn/qkv/kernel"] == P(None, "tp")
        assert specs["params/enc_blocks_0/attn/qkv/bias"] == P("tp")
        assert specs["params/enc_blocks_0/attn/proj/kernel"] == P("tp", None)
        assert specs["params/enc_blocks_0/attn/proj/bias"] == P()
        assert specs["params/enc_blocks_0/mlp/fc1/kernel"] == P(None, "tp")
        assert specs["params/enc_blocks_0/mlp/fc2/kernel"] == P("tp", None)
        assert specs["params/enc_blocks_0/norm1/scale"] == P()

    def test_tp_forward_matches_replicated(self):
        """dp x tp sharded forward == single-device forward (8 virtual
        CPU devices, tiny model)."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
        from cut3r_slam_tpu.parallel.mesh import make_mesh
        from cut3r_slam_tpu.parallel.inference import make_tp_sharded_forward
        model = CUT3R(CUT3RConfig.tiny())
        imgs = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, 4, 32, 48, 3)),
                           jnp.float32)
        params = model.init(jax.random.PRNGKey(0), imgs)
        ref = model.apply(params, imgs)
        mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
        with mesh:
            fn, place_p, place_b = make_tp_sharded_forward(model, mesh)
            out = fn(place_p(params), place_b(imgs))
        for k in ("pts3d_in_other_view", "camera_pose", "conf"):
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       atol=2e-4, rtol=2e-4, err_msg=k)
