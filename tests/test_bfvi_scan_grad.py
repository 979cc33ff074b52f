"""Hand-derived Pallas backward of the fused BFVI scan vs autodiff of
the jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models import nn as tnn
from multimodal_dmm_tpu.ops.pallas.bfvi_scan import (bfvi_scan,
                                                     bfvi_scan_ref)

T, M, B, D, H, K = 7, 2, 16, 128, 32, 3
MIN_STD = 1e-3


@pytest.fixture(scope="module")
def setup():
    gtf = tnn.gtf_init(jax.random.PRNGKey(0), D, H)
    rng = np.random.RandomState(1)
    obs_mean = jnp.array(rng.randn(T, M, B, D).astype(np.float32))
    obs_std = jnp.array((rng.rand(T, M, B, D) + 0.2).astype(np.float32))
    obs_mask = jnp.array((rng.rand(T, M, B) > 0.4).astype(np.float32))
    glb_mean = jnp.array(rng.randn(B, D).astype(np.float32) * 0.1)
    glb_std = jnp.array((rng.rand(B, D) * 0.5 + 0.7).astype(np.float32))
    eps = jnp.array(rng.randn(T, K, B, D).astype(np.float32) * 0.5)
    # Fixed random cotangent weights so every output contributes
    w = [jnp.array(rng.randn(T, B, D).astype(np.float32))
         for _ in range(5)]
    return gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps, w


def _loss_through(fn, gtf, obs_mean, obs_std, obs_mask, glb_mean,
                  glb_std, eps, w):
    outs = fn(obs_mean, obs_std, obs_mask, glb_mean, glb_std, gtf, eps)
    return sum(jnp.sum(o * wi) for o, wi in zip(outs[:5], w))


def test_pallas_vjp_matches_autodiff(setup):
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, eps, w = setup

    def f_ref(om, os_, gm, gs, g):
        return _loss_through(
            lambda *a: bfvi_scan_ref(*a, MIN_STD),
            g, om, os_, obs_mask, gm, gs, eps, w)

    def f_pl(om, os_, gm, gs, g):
        return _loss_through(
            lambda *a: bfvi_scan(*a, MIN_STD, None, True),
            g, om, os_, obs_mask, gm, gs, eps, w)

    grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(
        obs_mean, obs_std, glb_mean, glb_std, gtf)
    grads_pl = jax.grad(f_pl, argnums=(0, 1, 2, 3, 4))(
        obs_mean, obs_std, glb_mean, glb_std, gtf)

    names = ["d_obs_mean", "d_obs_std", "d_glb_mean", "d_glb_std"]
    for name, r, g in zip(names, grads_ref[:4], grads_pl[:4]):
        scale = np.abs(np.asarray(r)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(r) / scale,
            rtol=2e-3, atol=2e-4, err_msg=name)
    # GTF weight grads
    ref_leaves = jax.tree_util.tree_leaves_with_path(grads_ref[4])
    pl_tree = grads_pl[4]
    for path, r in ref_leaves:
        g = pl_tree
        for k in path:
            g = g[k.key]
        scale = np.abs(np.asarray(r)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(r) / scale,
            rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pallas_vjp_map_mode(setup):
    """MAP path (eps=0, K=1) gradients also match."""
    gtf, obs_mean, obs_std, obs_mask, glb_mean, glb_std, _, w = setup
    eps0 = jnp.zeros((T, 1, B, D))

    def f_ref(om, g):
        return _loss_through(
            lambda *a: bfvi_scan_ref(*a, MIN_STD),
            g, om, obs_std, obs_mask, glb_mean, glb_std, eps0, w)

    def f_pl(om, g):
        return _loss_through(
            lambda *a: bfvi_scan(*a, MIN_STD, None, True),
            g, om, obs_std, obs_mask, glb_mean, glb_std, eps0, w)

    gr = jax.grad(f_ref, argnums=(0, 1))(obs_mean, gtf)
    gp = jax.grad(f_pl, argnums=(0, 1))(obs_mean, gtf)
    scale = np.abs(np.asarray(gr[0])).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[0]) / scale,
                               np.asarray(gr[0]) / scale,
                               rtol=2e-3, atol=2e-4)
