"""Masked Gaussian expert fusion in precision space.

Implements the two expert-combination rules every model in the framework is
built on (reference: /root/reference/models/dgts.py:15-83):

- ``product_of_experts``: product of independent Gaussians with a mask-based
  exclusion rule and the *signed-std* trick: an expert supplied with a
  negative standard deviation contributes negative precision, i.e. it is an
  **inverse expert** that divides its density out of the product. BFVI uses
  this to cancel the global prior during the smoothing pass
  (/root/reference/models/dmm.py:476-478).

- ``mean_of_experts``: moment-matched Gaussian mixture (used to average
  over sampling particles, /root/reference/models/dmm.py:248-258).

All functions are shape-polymorphic over leading axes: expert axis is axis 0,
the trailing axis is the latent dimension, anything between broadcasts.
"""

import jax.numpy as jnp

# Total-precision floor (see product_of_experts): precisions below this
# are treated as "no information" → wide posterior (std = 1e3).
PREC_FLOOR = 1e-6


def product_of_experts(mean, std, mask=None, eps=1e-8):
    """Fuse Gaussian experts along axis 0 in precision space.

    Parameters
    ----------
    mean, std : (M, ..., D) arrays
        Parameters of the M experts. A negative ``std`` encodes an inverse
        expert (its precision enters with a minus sign).
    mask : (M, ...) bool/float array or None
        Which experts participate (per batch element). If None, experts with
        any NaN in their std along the last axis are excluded — mirroring
        /root/reference/models/dgts.py:44-45.
    eps : float
        Variance floor added before inverting, for numerical stability.

    Returns
    -------
    (product_mean, product_std) with shape (..., D).

    Notes
    -----
    Where the total precision is zero (all experts masked out and none
    supplied), the product mean is defined to be 0 and the product std +inf,
    matching the reference's NaN→0 fixup (/root/reference/models/dgts.py:49)
    while remaining safe under `jax.grad`.
    """
    var = std * std + eps
    # Signed precision: negative std ⇒ inverse expert.
    prec = jnp.sign(std) / var
    if mask is None:
        mask = ~jnp.isnan(var).any(axis=-1)
    maskf = mask.astype(mean.dtype)[..., None]
    # Zero out masked experts *through* NaN (IEEE NaN*0 = NaN, so a plain
    # multiply would leak NaNs from excluded experts into the sum).
    prec = jnp.where(maskf > 0, prec, 0.0)
    mean = jnp.where(maskf > 0, mean, 0.0)
    num = jnp.sum(mean * prec, axis=0)
    denom = jnp.sum(prec, axis=0)
    # Precision floor: with inverse experts in the smoothing pass, f32
    # cancellation can push the total precision to ~0 or slightly
    # negative (the reference then produces NaN std via sqrt of a
    # negative, models/dgts.py:50, and the run diverges). Semantically
    # "no information" ⇒ a very WIDE posterior, so clamp the total
    # precision at PREC_FLOOR: mean falls back to 0 and std to
    # PREC_FLOOR**-0.5 there. Identical to the reference formula
    # whenever the total precision is meaningfully positive.
    low = denom < PREC_FLOOR
    safe = jnp.where(low, jnp.ones_like(denom), denom)
    product_mean = jnp.where(low, jnp.zeros_like(num), num / safe)
    product_std = jnp.where(low, PREC_FLOOR ** -0.5, safe ** -0.5)
    return product_mean, product_std


def product_of_experts_pair(mean_1, std_1, mean_2, std_2, eps=1e-8):
    """Two-expert ``product_of_experts`` without the expert-axis stack.

    Bit-identical to ``product_of_experts(stack([m1, m2]),
    stack([s1, s2]))`` with ``mask=None`` (a 2-element axis-0 sum is the
    same single f32 add), but the experts are never materialized on a
    stacked axis — in the particle transition (models/dmm.py
    ``_trans_prior``) expert 1 is a broadcast global prior, and stacking
    it K·V·B-fold before the elementwise PoE math was pure HBM traffic
    inside the hottest unrolled scan.
    """
    var_1 = std_1 * std_1 + eps
    var_2 = std_2 * std_2 + eps
    prec_1 = jnp.sign(std_1) / var_1
    prec_2 = jnp.sign(std_2) / var_2
    ok_1 = ~jnp.isnan(var_1).any(axis=-1, keepdims=True)
    ok_2 = ~jnp.isnan(var_2).any(axis=-1, keepdims=True)
    prec_1 = jnp.where(ok_1, prec_1, 0.0)
    prec_2 = jnp.where(ok_2, prec_2, 0.0)
    num = (jnp.where(ok_1, mean_1, 0.0) * prec_1
           + jnp.where(ok_2, mean_2, 0.0) * prec_2)
    denom = prec_1 + prec_2
    low = denom < PREC_FLOOR
    safe = jnp.where(low, jnp.ones_like(denom), denom)
    product_mean = jnp.where(low, jnp.zeros_like(num), num / safe)
    product_std = jnp.where(low, PREC_FLOOR ** -0.5, safe ** -0.5)
    return product_mean, product_std


def mean_of_experts(mean, std, mask=None):
    """Moment-matched mixture of Gaussian experts along axis 0.

    Matches /root/reference/models/dgts.py:53-83: the mixture weight is
    uniform over *all* M experts (masked experts contribute zeros to the
    moments but still count in the 1/M normalization — reference behavior).
    """
    if mask is None:
        mask = ~jnp.isnan(std).any(axis=-1)
    maskf = mask.astype(mean.dtype)[..., None]
    mean = jnp.where(maskf > 0, mean, 0.0)
    var = jnp.where(maskf > 0, std * std, 0.0)
    sum_mean = jnp.mean(mean, axis=0)
    sum_var = (jnp.mean(var, axis=0)
               + jnp.mean(mean * mean, axis=0) - sum_mean * sum_mean)
    # Clamp tiny negative values from cancellation before the sqrt.
    sum_std = jnp.sqrt(jnp.maximum(sum_var, 0.0))
    return sum_mean, sum_std
