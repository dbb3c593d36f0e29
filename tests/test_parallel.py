"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.parallel import make_mesh, shard_batch, fsdp_shard_params
from cut3r_slam_tpu.parallel.inference import make_sharded_forward
from cut3r_slam_tpu.models import CUT3R, CUT3RConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


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
