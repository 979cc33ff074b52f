"""Masked, summed (not averaged) losses.

Mirrors /root/reference/models/losses.py exactly:

- every NLL combines the sequence-length mask with a per-element NaN mask so
  missing targets never contribute (losses.py:34-38,57-60,78-82);
- losses are **sums** over unmasked elements — normalization by the number
  of observed timesteps happens in the trainer
  (/root/reference/trainer.py:241-242);
- ``nll_bernoulli`` reproduces torch's BCE log-clamp at -100
  (torch.nn.functional.binary_cross_entropy semantics, losses.py:41);
- ``nll_categorical`` reproduces the reference quirk of applying
  ``F.nll_loss`` to *probabilities* (the CategoricalMLP head ends in a
  Softmax, /root/reference/models/common.py:16-18, and losses.py:65 passes
  those probs straight to ``F.nll_loss``) — i.e. the loss is ``-p[target]``,
  not ``-log p[target]``. Kept for training-curve parity.

Masks may be bool or float; shapes broadcast from (T, B) or (T, B, 1) up to
the element shape (T, B, D, ...).
"""

import math

import jax
import jax.numpy as jnp


def _broadcast_mask(mask, x):
    """Right-pad mask shape with singleton dims to x's rank (losses.py:37)."""
    if mask is None:
        return None
    extra = x.ndim - mask.ndim
    if extra > 0:
        mask = mask.reshape(mask.shape + (1,) * extra)
    return mask


def _combined_mask(x, mask):
    """Length mask × element-wise not-NaN mask, as float."""
    obs = ~jnp.isnan(x)
    if mask is None:
        return obs.astype(x.dtype)
    mask = _broadcast_mask(mask, x)
    return obs.astype(x.dtype) * mask.astype(x.dtype)


def kld_gauss(mean_1, std_1, mean_2, std_2, mask=None):
    """KL(N(mean_1, std_1) ‖ N(mean_2, std_2)), masked sum (losses.py:14-21).

    Masked positions are excluded the way the reference's
    ``masked_select`` excludes them: by substituting neutral parameter
    values BEFORE the math, so inf/NaN latents at padded timesteps can
    never contaminate the sum or its gradients (a plain mask-multiply
    would turn 0·inf into NaN)."""
    if mask is not None:
        shape = jnp.broadcast_shapes(mean_1.shape, std_1.shape,
                                     mean_2.shape, std_2.shape)
        m = _broadcast_mask(mask, jnp.zeros(shape)) > 0
        mean_1 = jnp.where(m, mean_1, 0.0)
        mean_2 = jnp.where(m, mean_2, 0.0)
        std_1 = jnp.where(m, std_1, 1.0)
        std_2 = jnp.where(m, std_2, 1.0)
    # Clamp stds so squares can't overflow f32 into inf/inf = NaN when a
    # diverging run produces huge-but-finite latents (the reference
    # returns inf/NaN here; we return a finite huge loss so NaN
    # detection still fires downstream without poisoning XLA fusions).
    std_1 = jnp.clip(std_1, 1e-6, 1e6)
    std_2 = jnp.clip(std_2, 1e-6, 1e6)
    diff = jnp.clip(mean_1 - mean_2, -1e15, 1e15)
    kld_element = (2 * jnp.log(std_2) - 2 * jnp.log(std_1)
                   + (std_1 * std_1 + diff * diff)
                   / (std_2 * std_2) - 1)
    return 0.5 * jnp.sum(kld_element)


def nll_bernoulli(theta, x, mask=None):
    """Bernoulli NLL with torch-BCE log clamping at -100 (losses.py:23-42)."""
    m = _combined_mask(x, mask)
    xs = jnp.where(jnp.isnan(x), 0.0, x)
    theta = jnp.where(m > 0, theta, 0.5)  # NaN/inf-proof exclusion
    log_t = jnp.maximum(jnp.log(theta), -100.0)
    log_1mt = jnp.maximum(jnp.log1p(-theta), -100.0)
    nll = -(xs * log_t + (1.0 - xs) * log_1mt)
    return jnp.sum(nll * m)


def nll_bernoulli_logits(logits, x, mask=None):
    """Bernoulli NLL from pre-sigmoid logits (fused log-sigmoid form).

    Same masked-sum semantics as ``nll_bernoulli`` with the reference's
    −100 log clamps (losses.py:23-42), but computed straight from logits:
    log σ(l) = −softplus(−l), log(1−σ(l)) = −softplus(l). No probability
    tensor is ever materialized, which removes an HBM round-trip on
    image-sized reconstructions, and the backward is the closed-form
    σ(l)−x instead of a chain through log(sigmoid(·)).

    Deviation from ``nll_bernoulli(sigmoid(l), x)``: in the saturation
    band where f32 probs round to exactly 0/1 (|l| ≳ 17) the probs-space
    path degrades to the clamp constant −100 with zero gradient; this
    form returns the true NLL (and a live gradient) until the clamp
    genuinely binds at |l| ≥ 100. Strictly more accurate; parity
    elsewhere is exact to f32 rounding (tests/test_losses.py).
    """
    m = _combined_mask(x, mask)
    xs = jnp.where(jnp.isnan(x), 0.0, x)
    log_t = jnp.maximum(-jax.nn.softplus(-logits), -100.0)
    log_1mt = jnp.maximum(-jax.nn.softplus(logits), -100.0)
    nll = -(xs * log_t + (1.0 - xs) * log_1mt)
    nll = jnp.where(m > 0, nll, 0.0)  # NaN/inf-proof exclusion
    return jnp.sum(nll * m)


@jax.custom_vjp
def bce_logits_masked_sum(lg, xs, cm):
    """Masked-sum Bernoulli NLL from logits with a hand-written VJP.

    Value and gradient match ``nll_bernoulli_logits`` (same −100 clamp
    semantics; the clamp binds exactly at |logit| ≥ 100 in f32, since
    softplus(±100) rounds to the linear branch). The custom VJP exists
    purely for memory traffic: JAX AD of the softplus chain saves
    image-sized intermediates for the backward pass, while here the
    residuals are the *inputs themselves* and the backward is the
    closed-form ``σ(l) − x`` (with clamp gating), recomputed in one
    fused elementwise pass. On (T·V·B)-stacked video reconstructions
    this removes several 30–60 MB HBM round-trips per step.

    lg : (T, A, B, ...) pre-sigmoid activations
    xs : (T, 1, B, ...) NaN-cleaned targets in [0, 1] (broadcasts over A)
    cm : (T, 1, B, ...) combined float mask (0/1), broadcasts over A
    """
    nll = -(xs * jnp.maximum(-jax.nn.softplus(-lg), -100.0)
            + (1.0 - xs) * jnp.maximum(-jax.nn.softplus(lg), -100.0))
    nll = jnp.where(cm > 0, nll, 0.0)
    return jnp.sum(nll * cm)


def _bce_logits_fwd(lg, xs, cm):
    return bce_logits_masked_sum(lg, xs, cm), (lg, xs, cm)


def _bce_logits_bwd(res, ct):
    lg, xs, cm = res
    sig = jax.nn.sigmoid(lg)
    # d nll / d lg, with the −100 clamp zeroing each term's gradient
    # exactly where the forward clamp binds (softplus(l) ≥ 100 ⇔ l ≥ 100
    # in f32 — softplus is exactly linear there).
    dnll = ((1.0 - xs) * sig * (lg < 100.0)
            - xs * (1.0 - sig) * (lg > -100.0))
    # Gate through the mask with `where`, not a bare multiply: masked
    # positions may hold non-finite activations and IEEE 0·NaN = NaN.
    dnll = jnp.where(cm > 0, dnll, 0.0)
    dlg = (ct * cm * dnll).astype(lg.dtype)
    # Targets and masks are data, not parameters: their cotangents are
    # never consumed (jax.grad runs w.r.t. params only) and XLA DCEs
    # these zeros.
    return dlg, jnp.zeros_like(xs), jnp.zeros_like(cm)


bce_logits_masked_sum.defvjp(_bce_logits_fwd, _bce_logits_bwd)


def nll_categorical(probs, x, mask=None):
    """Categorical 'NLL' (reference quirk: ``-p[target]``, see module doc).

    probs : (T, B, K) class probabilities
    x : (T, B, 1) or (T, B) integer labels stored as float (NaN = missing)
    """
    if x.ndim == probs.ndim - 1:
        x = x[..., None]
    m = _combined_mask(x, mask)
    labels = jnp.where(jnp.isnan(x), 0.0, x).astype(jnp.int32)
    p_target = jnp.take_along_axis(probs, labels, axis=-1)
    p_target = jnp.where(m > 0, p_target, 0.0)
    return jnp.sum(-p_target * m)


def nll_gauss(mean, std, x, mask=None):
    """Gaussian NLL, masked sum (losses.py:68-89)."""
    m = _combined_mask(x, mask)
    xs = jnp.where(jnp.isnan(x), 0.0, x)
    mean = jnp.where(m > 0, mean, 0.0)  # NaN/inf-proof exclusion
    std = jnp.where(m > 0, std, 1.0)
    mean = jnp.clip(mean, -1e15, 1e15)  # overflow guard (see kld_gauss)
    std = jnp.clip(std, 1e-6, 1e6)
    nll = (0.5 * ((xs - mean) / std) ** 2 + jnp.log(std)
           + 0.5 * math.log(2 * math.pi))
    return jnp.sum(nll * m)
