"""Full-scan BFVI kernel: jnp reference vs model z_filter, and the
Pallas kernel (interpret mode) vs the reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM
from multimodal_dmm_tpu.models import nn as tnn
from multimodal_dmm_tpu.ops.pallas.bfvi_scan import (bfvi_scan_ref,
                                                     bfvi_scan_pallas)

T, M, B, D, H, K = 9, 3, 16, 128, 64, 4
MIN_STD = 1e-3


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    gtf = tnn.gtf_init(key, D, H)
    rng = np.random.RandomState(1)
    obs_mean = jnp.array(rng.randn(T, M, B, D).astype(np.float32))
    obs_std = jnp.array((rng.rand(T, M, B, D) + 0.2).astype(np.float32))
    obs_mask = jnp.array(rng.rand(T, M, B) > 0.4)
    glb_mean = jnp.zeros((B, D))
    glb_std = jnp.ones((B, D))
    eps = jnp.array(rng.randn(T, K, B, D).astype(np.float32))
    return gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps


def test_ref_matches_model_z_filter(setup):
    """bfvi_scan_ref must reproduce MultiDMM.z_filter (fwd direction,
    sampling path) given the same noise."""
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps = setup

    model = MultiDMM([f"m{i}" for i in range(M)], [1] * M,
                     z_dim=D, h_dim=H, use_pallas=False)
    params, state = model.init(jax.random.PRNGKey(3))
    params["trans"]["fwd"] = gtf
    params["z0_mean"] = jnp.zeros((1, D))
    params["z0_log_std"] = jnp.log(jnp.ones((1, D)) - MIN_STD)

    # Drive z_filter with a fixed key and reconstruct the same eps
    # stream: z_filter draws eps_t = normal(key_t, (K, B, D)).
    rng = jax.random.PRNGKey(11)
    keys = jax.random.split(rng, T)
    eps_stream = jnp.stack([
        jax.random.normal(k, (K, B, D)) for k in keys])

    infer, prior, samples = model.z_filter(
        params, jnp.moveaxis(obs_mean, 1, 0),
        jnp.moveaxis(obs_std, 1, 0),
        jnp.moveaxis(obs_mask.astype(jnp.float32), 1, 0),
        rng, direction="fwd", sample=True, n_particles=K)

    outs = bfvi_scan_ref(obs_mean, obs_std, obs_mask,
                         glb_mean, glb_std, gtf, eps_stream, MIN_STD)
    p_mean, p_std, i_mean, i_std, smp, z_traj = outs
    np.testing.assert_allclose(np.asarray(p_mean), np.asarray(prior[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_mean), np.asarray(infer[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_std), np.asarray(infer[1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(smp), np.asarray(samples),
                               rtol=1e-4, atol=1e-5)


def test_pallas_fwd_matches_ref(setup):
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps = setup
    ref = bfvi_scan_ref(obs_mean, obs_std, obs_mask, glb_mean, glb_std,
                        gtf, eps, MIN_STD)
    got = bfvi_scan_pallas(obs_mean, obs_std, obs_mask, glb_mean,
                           glb_std, gtf, eps, MIN_STD, interpret=True)
    names = ["prior_mean", "prior_std", "infer_mean", "infer_std",
             "samples", "z_traj"]
    for name, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_pallas_fwd_map_mode(setup):
    """eps = 0 → samples == infer_mean exactly (MAP path)."""
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, _ = setup
    eps0 = jnp.zeros((T, 1, B, D))
    outs = bfvi_scan_pallas(obs_mean, obs_std, obs_mask, glb_mean,
                            glb_std, gtf, eps0, MIN_STD,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(outs[4]),
                               np.asarray(outs[2]), atol=1e-6)


def test_pallas_fwd_with_inverse_and_padding(setup):
    """Smoothing-style inverse expert + non-multiple batch."""
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps = setup
    b2 = 13
    om = obs_mean[:, :, :b2]
    os_ = obs_std[:, :, :b2].at[:, -1].multiply(-1.0)
    mk = obs_mask[:, :, :b2].at[:, -1].set(True)
    ref = bfvi_scan_ref(om, os_, mk, glb_mean[:b2], glb_std[:b2], gtf,
                        eps[:, :, :b2], MIN_STD)
    got = bfvi_scan_pallas(om, os_, mk, glb_mean[:b2], glb_std[:b2],
                           gtf, eps[:, :, :b2], MIN_STD,
                           interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)
