"""Unit tests for product/mean of experts against closed-form values and
the PyTorch reference math (re-derived locally, not imported)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.ops import product_of_experts, mean_of_experts

EPS = 1e-8


def ref_poe(mean, std, mask=None, eps=EPS):
    """Direct numpy transcription of the PoE equations
    (/root/reference/models/dgts.py:39-51) for golden comparison."""
    mean = np.asarray(mean, np.float64)
    std = np.asarray(std, np.float64)
    var = std ** 2 + eps
    T = 1.0 / var * np.sign(std)
    if mask is None:
        mask = ~np.isnan(var).any(-1)
    maskf = np.asarray(mask, np.float64)[..., None]
    T = T * maskf
    mean = mean * maskf
    with np.errstate(divide="ignore", invalid="ignore"):
        pm = (mean * T).sum(0) / T.sum(0)
        pm = np.nan_to_num(pm, nan=0.0, posinf=np.inf, neginf=-np.inf)
        ps = (1.0 / T.sum(0)) ** 0.5
    return pm, ps


def test_two_expert_closed_form():
    # PoE of N(0,1) and N(2,1) = N(1, 1/sqrt(2))
    mean = jnp.array([[[0.0]], [[2.0]]])
    std = jnp.array([[[1.0]], [[1.0]]])
    pm, ps = product_of_experts(mean, std)
    assert np.allclose(pm, 1.0, atol=1e-5)
    assert np.allclose(ps, 1.0 / np.sqrt(2.0), atol=1e-4)


def test_matches_reference_random():
    rng = np.random.RandomState(0)
    mean = rng.randn(4, 7, 3).astype(np.float32)
    std = rng.rand(4, 7, 3).astype(np.float32) + 0.1
    mask = (rng.rand(4, 7) > 0.3)
    # Ensure at least one expert active everywhere
    mask[0] = True
    pm, ps = product_of_experts(jnp.array(mean), jnp.array(std),
                                jnp.array(mask))
    rm, rs = ref_poe(mean, std, mask)
    np.testing.assert_allclose(np.asarray(pm), rm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), rs, rtol=1e-4, atol=1e-5)


def test_inverse_expert_cancels():
    """An inverse expert (negative std) divides out an identical expert."""
    rng = np.random.RandomState(1)
    m0 = rng.randn(5, 2).astype(np.float32)
    s0 = (rng.rand(5, 2) + 0.5).astype(np.float32)
    m1 = rng.randn(5, 2).astype(np.float32)
    s1 = (rng.rand(5, 2) + 0.5).astype(np.float32)
    # product(m0, m1, inverse-m1) ≈ m0 alone
    mean = jnp.stack([m0, m1, m1])
    std = jnp.stack([s0, s1, -s1])
    pm, ps = product_of_experts(mean, std)
    pm0, ps0 = product_of_experts(m0[None], s0[None])
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ps0),
                               rtol=1e-3, atol=1e-4)


def test_all_masked_gives_zero_mean_wide_std():
    """No information ⇒ mean 0 and the floor-width posterior (the
    reference returns std=inf / NaN here; we return a finite wide std
    so downstream samples can't poison BatchNorm batch statistics)."""
    mean = jnp.ones((2, 3, 4))
    std = jnp.ones((2, 3, 4))
    mask = jnp.zeros((2, 3), bool)
    pm, ps = product_of_experts(mean, std, mask)
    assert np.all(np.asarray(pm) == 0.0)
    np.testing.assert_allclose(np.asarray(ps), 1e3, rtol=1e-5)


def test_near_cancelled_precision_is_floored():
    """Inverse experts that (numerically) cancel the total precision
    must yield a finite wide posterior, not NaN (the smoothing-pass
    epsilon-cancellation that NaNs the reference)."""
    import jax

    s = 0.1
    mean = jnp.array([[[1.0]], [[2.0]]])
    std = jnp.array([[[s]], [[-s]]])  # prec exactly cancels
    pm, ps = product_of_experts(mean, std)
    assert np.isfinite(np.asarray(pm)).all()
    np.testing.assert_allclose(np.asarray(ps), 1e3, rtol=1e-5)

    def f(m):
        pm, ps = product_of_experts(m, std)
        return jnp.sum(pm) + jnp.sum(ps)

    g = jax.grad(f)(mean)
    assert np.isfinite(np.asarray(g)).all()


def test_nan_mask_default():
    """Experts with NaN std are excluded when no mask is given
    (dgts.py:44-45)."""
    mean = jnp.array([[[1.0, 1.0]], [[3.0, 3.0]]])
    std = jnp.array([[[1.0, 1.0]], [[jnp.nan, 1.0]]])
    pm, _ = product_of_experts(mean, std)
    np.testing.assert_allclose(np.asarray(pm), [[1.0, 1.0]], atol=1e-5)


def test_time_axis_broadcast():
    """(M, T, B, D) inputs with (M, T, B) masks work identically."""
    rng = np.random.RandomState(2)
    mean = rng.randn(3, 6, 4, 5).astype(np.float32)
    std = (rng.rand(3, 6, 4, 5) + 0.2).astype(np.float32)
    mask = rng.rand(3, 6, 4) > 0.4
    mask[0] = True
    pm, ps = product_of_experts(jnp.array(mean), jnp.array(std),
                                jnp.array(mask))
    rm, rs = ref_poe(mean, std, mask)
    np.testing.assert_allclose(np.asarray(pm), rm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), rs, rtol=1e-4, atol=1e-5)


def test_mean_of_experts_single_particle_identity():
    rng = np.random.RandomState(3)
    mean = rng.randn(1, 4, 2).astype(np.float32)
    std = (rng.rand(1, 4, 2) + 0.3).astype(np.float32)
    sm, ss = mean_of_experts(jnp.array(mean), jnp.array(std))
    np.testing.assert_allclose(np.asarray(sm), mean[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss), std[0], rtol=1e-4)


def test_mean_of_experts_matches_reference():
    """Mixture moments incl. the reference's divide-by-all-M behavior
    (dgts.py:74-83)."""
    rng = np.random.RandomState(4)
    mean = rng.randn(5, 3, 2).astype(np.float64)
    std = (rng.rand(5, 3, 2) + 0.3).astype(np.float64)
    mask = rng.rand(5, 3) > 0.4
    maskf = mask.astype(np.float64)[..., None]
    m = mean * maskf
    v = std ** 2 * maskf
    ref_mean = m.mean(0)
    ref_var = v.mean(0) + (m ** 2).mean(0) - ref_mean ** 2
    ref_std = np.sqrt(ref_var)
    sm, ss = mean_of_experts(jnp.array(mean, dtype=jnp.float32),
                             jnp.array(std, dtype=jnp.float32),
                             jnp.array(mask))
    np.testing.assert_allclose(np.asarray(sm), ref_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss), ref_std, rtol=1e-4, atol=1e-5)


def test_poe_grad_safe_when_masked():
    """Gradients through fully-masked timesteps must not be NaN."""
    import jax

    def f(mean):
        std = jnp.ones_like(mean)
        mask = jnp.zeros(mean.shape[:-1], bool)
        pm, _ = product_of_experts(mean, std, mask)
        return jnp.sum(pm)

    g = jax.grad(f)(jnp.ones((2, 3, 4)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pair_specialization_matches_stacked():
    """product_of_experts_pair == product_of_experts(stack) bit-exactly,
    including inverse (negative-std) experts, NaN'd experts, broadcast
    expert-1 (the _trans_prior global prior), and the precision floor."""
    from multimodal_dmm_tpu.ops import product_of_experts_pair

    rng = np.random.RandomState(7)
    K, VB, D = 4, 6, 5
    m2 = rng.randn(K, VB, D).astype(np.float32)
    s2 = (rng.rand(K, VB, D) + 0.1).astype(np.float32)
    s2[1, 2] *= -1.0                 # inverse expert rows
    m2[2, 3] = np.nan                # NaN'd expert → excluded
    s2[2, 3] = np.nan

    # broadcast global-prior expert (1, 1, D), like _trans_prior
    m1 = rng.randn(1, 1, D).astype(np.float32)
    s1 = (rng.rand(1, 1, D) + 0.5).astype(np.float32)

    m1b = np.broadcast_to(m1, m2.shape)
    s1b = np.broadcast_to(s1, s2.shape)
    want_m, want_s = product_of_experts(
        jnp.stack([jnp.asarray(m1b), jnp.asarray(m2)]),
        jnp.stack([jnp.asarray(s1b), jnp.asarray(s2)]))
    got_m, got_s = product_of_experts_pair(
        jnp.asarray(m1), jnp.asarray(s1),
        jnp.asarray(m2), jnp.asarray(s2))
    np.testing.assert_array_equal(np.asarray(want_m), np.asarray(got_m))
    np.testing.assert_array_equal(np.asarray(want_s), np.asarray(got_s))

    # Near-cancelling pair to hit the precision floor branch.
    mf = np.zeros((1, 1, D), np.float32) + 0.3
    sf = np.ones((1, 1, D), np.float32)
    want = product_of_experts(
        jnp.stack([jnp.asarray(mf), jnp.asarray(-mf)]),
        jnp.stack([jnp.asarray(sf), jnp.asarray(-sf)]))
    got = product_of_experts_pair(jnp.asarray(mf), jnp.asarray(sf),
                                  jnp.asarray(-mf), jnp.asarray(-sf))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
