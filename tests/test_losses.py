"""Golden tests of masked losses against torch reference semantics.

The torch expressions below are re-derived from
/root/reference/models/losses.py (not imported), executed with the local
CPU torch to produce golden values.
"""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_dmm_tpu.ops import (kld_gauss, nll_bernoulli,
                                    nll_bernoulli_logits,
                                    nll_categorical, nll_gauss)


def _torch_mask(x_t, mask_t):
    shape = list(mask_t.shape) + [1] * (x_t.dim() - mask_t.dim())
    return (~torch.isnan(x_t)) * mask_t.view(*shape)


def test_kld_gauss_matches_torch():
    rng = np.random.RandomState(0)
    T, B, D = 7, 4, 3
    m1, m2 = rng.randn(T, B, D), rng.randn(T, B, D)
    s1, s2 = rng.rand(T, B, D) + 0.2, rng.rand(T, B, D) + 0.2
    mask = rng.rand(T, B, 1) > 0.3

    t = [torch.tensor(a, dtype=torch.float32) for a in (m1, s1, m2, s2)]
    kld_el = (2 * torch.log(t[3]) - 2 * torch.log(t[1])
              + (t[1].pow(2) + (t[0] - t[2]).pow(2)) / t[3].pow(2) - 1)
    golden = 0.5 * kld_el.masked_select(
        torch.tensor(mask).expand(T, B, D)).sum().item()

    got = kld_gauss(jnp.array(m1, jnp.float32), jnp.array(s1, jnp.float32),
                    jnp.array(m2, jnp.float32), jnp.array(s2, jnp.float32),
                    jnp.array(mask))
    assert np.allclose(float(got), golden, rtol=1e-4)


def test_nll_gauss_matches_torch_with_nans():
    rng = np.random.RandomState(1)
    T, B, D = 6, 3, 2
    mean = rng.randn(T, B, D).astype(np.float32)
    std = (rng.rand(T, B, D) + 0.2).astype(np.float32)
    x = rng.randn(T, B, D).astype(np.float32)
    x[rng.rand(T, B, D) > 0.7] = np.nan
    mask = rng.rand(T, B, 1) > 0.2

    x_t = torch.tensor(x)
    m_t = _torch_mask(x_t, torch.tensor(mask))
    x_f = x_t.clone()
    x_f[torch.isnan(x_f)] = 0.0
    nll_el = (0.5 * ((x_f - torch.tensor(mean)) / torch.tensor(std)).pow(2)
              + torch.tensor(std).log() + 0.5 * math.log(2 * math.pi))
    golden = nll_el.masked_select(m_t).sum().item()

    got = nll_gauss(jnp.array(mean), jnp.array(std), jnp.array(x),
                    jnp.array(mask))
    assert np.allclose(float(got), golden, rtol=1e-4)


def test_nll_bernoulli_matches_torch_with_nans():
    rng = np.random.RandomState(2)
    T, B, D = 5, 4, 6
    theta = rng.rand(T, B, D).astype(np.float32) * 0.98 + 0.01
    x = (rng.rand(T, B, D) > 0.5).astype(np.float32)
    x[rng.rand(T, B, D) > 0.8] = np.nan
    mask = rng.rand(T, B, 1) > 0.2

    x_t = torch.tensor(x)
    m_t = _torch_mask(x_t, torch.tensor(mask))
    golden = F.binary_cross_entropy(
        torch.tensor(theta).masked_select(m_t),
        x_t.masked_select(m_t), reduction="sum").item()

    got = nll_bernoulli(jnp.array(theta), jnp.array(x), jnp.array(mask))
    assert np.allclose(float(got), golden, rtol=1e-4)


def test_nll_bernoulli_logits_matches_torch_with_logits():
    """Fused logit-space BCE vs torch binary_cross_entropy_with_logits
    (the numerically-true value, which the fused form reproduces in the
    non-clamped range)."""
    rng = np.random.RandomState(4)
    T, B, D = 5, 4, 6
    logits = (rng.randn(T, B, D) * 4).astype(np.float32)
    x = (rng.rand(T, B, D) > 0.5).astype(np.float32)
    x[rng.rand(T, B, D) > 0.8] = np.nan
    mask = rng.rand(T, B, 1) > 0.2

    x_t = torch.tensor(x)
    m_t = _torch_mask(x_t, torch.tensor(mask))
    golden = F.binary_cross_entropy_with_logits(
        torch.tensor(logits).masked_select(m_t),
        x_t.masked_select(m_t), reduction="sum").item()

    got = nll_bernoulli_logits(jnp.array(logits), jnp.array(x),
                               jnp.array(mask))
    assert np.allclose(float(got), golden, rtol=1e-5)


def test_nll_bernoulli_logits_agrees_with_probs_path():
    """nll_bernoulli_logits(l) == nll_bernoulli(sigmoid(l)) away from
    the f32 prob-saturation band."""
    rng = np.random.RandomState(5)
    logits = (rng.randn(8, 3, 7) * 3).astype(np.float32)
    x = (rng.rand(8, 3, 7) > 0.5).astype(np.float32)
    mask = rng.rand(8, 3, 1) > 0.3
    via_probs = nll_bernoulli(jnp.asarray(1 / (1 + np.exp(-logits))),
                              jnp.array(x), jnp.array(mask))
    via_logits = nll_bernoulli_logits(jnp.array(logits), jnp.array(x),
                                      jnp.array(mask))
    assert np.allclose(float(via_logits), float(via_probs), rtol=1e-5)


def test_nll_bernoulli_logits_clamps_at_100():
    """The reference's −100 log clamp binds at |l| ≥ 100: a maximally
    wrong saturated logit contributes exactly 100 per element."""
    logits = jnp.full((1, 1, 1), -250.0)
    x = jnp.ones((1, 1, 1))
    got = float(nll_bernoulli_logits(logits, x))
    assert np.allclose(got, 100.0)
    # Moderately saturated logits keep their true NLL (no early clamp).
    got2 = float(nll_bernoulli_logits(jnp.full((1, 1, 1), -50.0), x))
    assert np.allclose(got2, 50.0, rtol=1e-5)


def test_nll_categorical_matches_torch_quirk():
    """The reference applies F.nll_loss to *probabilities* — match it."""
    rng = np.random.RandomState(3)
    T, B, K = 6, 3, 5
    logits = rng.randn(T, B, K).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    x = rng.randint(0, K, (T, B, 1)).astype(np.float32)
    x[rng.rand(T, B, 1) > 0.8] = np.nan
    mask = rng.rand(T, B, 1) > 0.2

    probs_t, x_t = torch.tensor(probs), torch.tensor(x)
    m_t = _torch_mask(x_t, torch.tensor(mask))
    probs_sel = torch.stack(
        [probs_t[:, :, k:k + 1].masked_select(m_t) for k in range(K)], dim=-1)
    golden = F.nll_loss(probs_sel, x_t.masked_select(m_t).long(),
                        reduction="sum").item()

    got = nll_categorical(jnp.array(probs), jnp.array(x), jnp.array(mask))
    assert np.allclose(float(got), golden, rtol=1e-4)


def test_losses_are_sums_not_means():
    """Doubling the batch doubles the loss (summed convention)."""
    x = jnp.zeros((4, 2, 3))
    mean = jnp.ones((4, 2, 3))
    std = jnp.ones((4, 2, 3))
    l1 = nll_gauss(mean, std, x)
    x2 = jnp.zeros((4, 4, 3))
    mean2 = jnp.ones((4, 4, 3))
    std2 = jnp.ones((4, 4, 3))
    l2 = nll_gauss(mean2, std2, x2)
    assert np.allclose(float(l2), 2 * float(l1), rtol=1e-5)


def test_losses_immune_to_poison_at_masked_positions():
    """inf/NaN at masked positions must not contaminate values OR the
    positions' exclusion (reference masked_select semantics)."""
    T, B, D = 4, 2, 3
    mask = np.ones((T, B, 1), np.float32)
    mask[2:] = 0.0  # timesteps 2,3 masked
    m1 = np.zeros((T, B, D), np.float32)
    s1 = np.ones((T, B, D), np.float32)
    m2 = np.zeros((T, B, D), np.float32)
    s2 = np.ones((T, B, D), np.float32)
    clean = float(kld_gauss(jnp.array(m1), jnp.array(s1),
                            jnp.array(m2), jnp.array(s2),
                            jnp.array(mask)))
    m1[2:] = np.inf
    s2[3] = np.nan
    poisoned = float(kld_gauss(jnp.array(m1), jnp.array(s1),
                               jnp.array(m2), jnp.array(s2),
                               jnp.array(mask)))
    assert np.isfinite(poisoned) and abs(poisoned - clean) < 1e-6

    x = np.zeros((T, B, D), np.float32)
    mean = np.zeros((T, B, D), np.float32)
    std = np.ones((T, B, D), np.float32)
    mean[2] = np.inf
    std[3] = 0.0
    got = float(nll_gauss(jnp.array(mean), jnp.array(std),
                          jnp.array(x), jnp.array(mask)))
    assert np.isfinite(got)

    theta = np.full((T, B, D), 0.5, np.float32)
    theta[2:] = np.nan
    got_b = float(nll_bernoulli(jnp.array(theta), jnp.array(x),
                                jnp.array(mask)))
    assert np.isfinite(got_b)

    probs = np.full((T, B, 5), 0.2, np.float32)
    probs[2:] = np.inf
    labels = np.zeros((T, B, 1), np.float32)
    got_c = float(nll_categorical(jnp.array(probs), jnp.array(labels),
                                  jnp.array(mask)))
    assert np.isfinite(got_c)


def test_bce_logits_masked_sum_matches_inline_composition():
    """Value AND gradient of the custom-VJP fused BCE equal the plain
    jnp composition it replaced (models/dmm.py fused objective), on the
    stacked-variant shapes: lg (T,A,B,D), xs/cm (T,1,B,D)."""
    import jax
    from multimodal_dmm_tpu.ops.losses import bce_logits_masked_sum

    rng = np.random.RandomState(3)
    T, A, B, D = 5, 2, 3, 7
    lg = rng.randn(T, A, B, D).astype(np.float32) * 4
    lg[0, 0, 0, 0] = 150.0   # clamp binds (softplus ≥ 100)
    lg[0, 0, 0, 1] = -150.0
    x = rng.rand(T, B, D).astype(np.float32)
    x[rng.rand(T, B, D) < 0.2] = np.nan
    lmask = (rng.rand(T, 1, B, 1) > 0.2).astype(np.float32)

    obs = ~np.isnan(x)
    xs = jnp.asarray(np.where(obs, x, 0.0)[:, None])
    cm = jnp.asarray(obs.astype(np.float32)[:, None] * lmask)

    def inline(lg):
        log_t = jnp.maximum(-jax.nn.softplus(-lg), -100.0)
        log_1mt = jnp.maximum(-jax.nn.softplus(lg), -100.0)
        nll = -(xs * log_t + (1.0 - xs) * log_1mt)
        return jnp.sum(jnp.where(cm > 0, nll, 0.0) * cm)

    lg_j = jnp.asarray(lg)
    v_new, g_new = jax.value_and_grad(
        lambda l: bce_logits_masked_sum(l, xs, cm))(lg_j)
    v_old, g_old = jax.value_and_grad(inline)(lg_j)
    assert abs(float(v_new) - float(v_old)) <= 1e-4 * abs(float(v_old))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-5, atol=1e-6)


def test_bce_logits_masked_sum_poison_safe_gradients():
    """Non-finite activations at masked positions must not leak NaN into
    the value or the gradient (IEEE 0·NaN traps)."""
    import jax
    from multimodal_dmm_tpu.ops.losses import bce_logits_masked_sum

    T, A, B, D = 3, 2, 2, 4
    lg = np.zeros((T, A, B, D), np.float32)
    lg[1] = np.nan
    lg[2] = np.inf
    xs = jnp.asarray(np.full((T, 1, B, D), 0.7, np.float32))
    cm = np.ones((T, 1, B, D), np.float32)
    cm[1] = 0.0
    cm[2] = 0.0
    cm = jnp.asarray(cm)

    v, g = jax.value_and_grad(
        lambda l: bce_logits_masked_sum(l, xs, cm))(jnp.asarray(lg))
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert np.all(np.asarray(g)[1:] == 0.0)
