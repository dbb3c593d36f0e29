"""Fused dual-stream decoder (CUT3RConfig.fused_decoder) equivalence.

The fused path stacks the state∥image DecoderBlock weights into batch-2
einsums (model.py:660-698 are data-independent within a layer); numerics
must match the plain per-block path bit-for-bit up to f32 reassociation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier (VERDICT r4 #9: compile-heavy)

from cut3r_slam_tpu.models.cut3r import CUT3R, CUT3RConfig


def _models():
    cfg_plain = dataclasses.replace(CUT3RConfig.tiny(), fused_decoder=False)
    cfg_fused = dataclasses.replace(CUT3RConfig.tiny(), fused_decoder=True)
    return CUT3R(cfg_plain), CUT3R(cfg_fused)


@pytest.fixture(scope="module")
def setup():
    plain, fused = _models()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (3, 2, 32, 48, 3), minval=-1, maxval=1)
    params = plain.init(jax.random.PRNGKey(1), imgs)
    return plain, fused, params, imgs


def test_forward_matches_plain(setup):
    plain, fused, params, imgs = setup
    out_p = plain.apply(params, imgs)
    out_f = fused.apply(params, imgs)
    assert set(out_p) == set(out_f)
    for k in out_p:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_f[k]),
                                   atol=5e-4, rtol=5e-4, err_msg=k)


def test_state_carry_matches_plain(setup):
    plain, fused, params, imgs = setup
    out_p = plain.apply(params, imgs, ret_state=True)
    out_f = fused.apply(params, imgs, ret_state=True)
    for a, b in zip(out_p["state"], out_f["state"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_inference_step_matches_plain(setup):
    plain, fused, params, imgs = setup
    st_p = plain.apply(params, imgs, ret_state=True)["state"]
    ray = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 48, 6)) * 0.1
    out_p = plain.apply(params, ray, st_p[0], st_p[1],
                        method=plain.inference_step)
    out_f = fused.apply(params, ray, st_p[0], st_p[1],
                        method=fused.inference_step)
    for k in out_p:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_f[k]),
                                   atol=5e-4, rtol=5e-4, err_msg=k)
