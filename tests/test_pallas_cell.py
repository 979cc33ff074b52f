"""Pallas fused PoE+sample cell vs the XLA composite (interpret mode on
the CPU test mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.ops.pallas.poe_cell import (poe_sample_cell,
                                                    _xla_composite)


def make_inputs(m=3, b=40, d=128, k=5, seed=0):
    rng = np.random.RandomState(seed)
    prior_mean = jnp.array(rng.randn(b, d).astype(np.float32))
    prior_std = jnp.array((rng.rand(b, d) + 0.2).astype(np.float32))
    obs_mean = jnp.array(rng.randn(m, b, d).astype(np.float32))
    obs_std = jnp.array((rng.rand(m, b, d) + 0.2).astype(np.float32))
    mask = jnp.array(rng.rand(m, b) > 0.4)
    eps = jnp.array(rng.randn(k, b, d).astype(np.float32))
    return prior_mean, prior_std, obs_mean, obs_std, mask, eps


def test_pallas_matches_xla_composite():
    args = make_inputs()
    ref = _xla_composite(*args)
    got = poe_sample_cell(*args, use_pallas=True, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_with_inverse_experts():
    """Smoothing-pass configuration: one expert has negative std."""
    pm, ps, om, os_, mask, eps = make_inputs(m=4, b=16, d=128, k=3,
                                             seed=1)
    os_ = os_.at[-1].set(-os_[-1])  # inverse global prior expert
    mask = mask.at[-1].set(True)
    ref = _xla_composite(pm, ps, om, os_, mask, eps)
    got = poe_sample_cell(pm, ps, om, os_, mask, eps, use_pallas=True,
                          interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_batch_padding():
    """Non-tile-multiple batch sizes are padded and sliced back."""
    args = make_inputs(b=13, d=128, k=2, seed=2)
    ref = _xla_composite(*args)
    got = poe_sample_cell(*args, use_pallas=True, interpret=True)
    for r, g in zip(ref, got):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_fallback_on_small_dims():
    """z_dim=5 (spirals) → XLA composite, no pallas attempt."""
    args = make_inputs(b=10, d=5, k=2, seed=3)
    ref = _xla_composite(*args)
    got = poe_sample_cell(*args, use_pallas=True, interpret=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6)
