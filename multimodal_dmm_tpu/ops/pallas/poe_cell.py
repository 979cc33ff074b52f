"""Pallas TPU kernel: fused PoE + reparameterized particle sampling.

This is the per-timestep body of the BFVI filtering scan
(models/dmm.py z_filter cell) minus the GTF matmuls: given the
conditional prior, the per-expert observation parameters and masks, and
pre-drawn standard-normal noise, it computes in one VMEM-resident pass

    precision-space product of experts  →  (infer_mean, infer_std)
    z_k = infer_mean + eps_k · infer_std  (K particles)
    sample = mean_k z_k

Fusing these keeps the (M, B, D) expert tensors and the (K, B, D)
particle tensor from round-tripping HBM between ops. The kernel is used
on gradient-free paths (evaluation / generation); training uses the XLA
composite, which `jax.grad` differentiates.

Shapes: prior_mean/std (B, D); obs_mean/std (M, B, D); mask (M, B);
eps (K, B, D). The wrapper pads B to a tile multiple and falls back to
the XLA composite when shapes don't fit TPU tiling (D % 128 != 0).
"""

import functools

import jax
import jax.numpy as jnp

from ..poe import product_of_experts

_EPS = 1e-8


def _kernel(prior_mean_ref, prior_std_ref, obs_mean_ref, obs_std_ref,
            mask_ref, eps_ref, infer_mean_ref, infer_std_ref, z_ref,
            sample_ref, *, n_experts):
    pm = prior_mean_ref[:]
    ps = prior_std_ref[:]
    var_p = ps * ps + _EPS
    prec_p = 1.0 / var_p  # prior std is always positive
    num = pm * prec_p
    denom = prec_p
    for m in range(n_experts):  # static unrolled expert loop
        om = obs_mean_ref[m]
        os_ = obs_std_ref[m]
        mk = mask_ref[m]  # (TB, 1), broadcasts over the lane dim
        var = os_ * os_ + _EPS
        prec = jnp.where(mk > 0, jnp.sign(os_) / var, 0.0)
        num = num + jnp.where(mk > 0, om * prec, 0.0)
        denom = denom + prec
    low = denom < 1e-6  # ops/poe.py PREC_FLOOR semantics
    safe = jnp.where(low, 1.0, denom)
    infer_mean = jnp.where(low, 0.0, num / safe)
    infer_std = jnp.where(low, 1e3, jax.lax.rsqrt(safe))
    infer_mean_ref[:] = infer_mean
    infer_std_ref[:] = infer_std
    z = infer_mean[None] + eps_ref[:] * infer_std[None]
    z_ref[:] = z
    sample_ref[:] = jnp.mean(z, axis=0)


def _xla_composite(prior_mean, prior_std, obs_mean, obs_std, mask, eps):
    """Reference XLA path (always used under autodiff)."""
    all_mean = jnp.concatenate([prior_mean[None], obs_mean], axis=0)
    all_std = jnp.concatenate([prior_std[None], obs_std], axis=0)
    all_mask = jnp.concatenate(
        [jnp.ones((1,) + mask.shape[1:], mask.dtype), mask], axis=0)
    infer_mean, infer_std = product_of_experts(all_mean, all_std,
                                               all_mask)
    z = infer_mean[None] + eps * infer_std[None]
    return infer_mean, infer_std, z, jnp.mean(z, axis=0)


def poe_sample_cell(prior_mean, prior_std, obs_mean, obs_std, mask, eps,
                    use_pallas=True, interpret=False):
    """Fused PoE + sampling. Returns (infer_mean, infer_std, z, sample).

    Falls back to the XLA composite when `use_pallas` is False or the
    shapes don't map onto TPU tiles.
    """
    n_exp, b_dim, d = obs_mean.shape
    k = eps.shape[0]
    if not use_pallas or d % 128 != 0 or b_dim < 8:
        return _xla_composite(prior_mean, prior_std, obs_mean, obs_std,
                              mask, eps)

    from jax.experimental import pallas as pl

    # Tile the batch so (K, TB, D) noise/particle blocks fit in VMEM;
    # TPU tiling needs the sublane (second-to-last) block dim to be a
    # multiple of 8.
    budget = 8 * 1024 * 1024
    tb = max(8, min(b_dim, budget // max(1, 2 * k * d * 4)))
    tb = min(tb, 512)
    tb = max(8, (tb // 8) * 8)
    pad = (-b_dim) % tb
    if pad:
        prior_mean = jnp.pad(prior_mean, ((0, pad), (0, 0)))
        prior_std = jnp.pad(prior_std, ((0, pad), (0, 0)),
                            constant_values=1.0)
        obs_mean = jnp.pad(obs_mean, ((0, 0), (0, pad), (0, 0)))
        obs_std = jnp.pad(obs_std, ((0, 0), (0, pad), (0, 0)),
                          constant_values=1.0)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        eps = jnp.pad(eps, ((0, 0), (0, pad), (0, 0)))
    bp = b_dim + pad
    grid = (bp // tb,)
    # (M, B, 1) so the mask's lane dim is a full (singleton) dimension —
    # TPU tiling requires the last block dim be 128-divisible or full.
    mask = mask.astype(jnp.float32)[..., None]

    out_shapes = (
        jax.ShapeDtypeStruct((bp, d), prior_mean.dtype),
        jax.ShapeDtypeStruct((bp, d), prior_mean.dtype),
        jax.ShapeDtypeStruct((k, bp, d), prior_mean.dtype),
        jax.ShapeDtypeStruct((bp, d), prior_mean.dtype),
    )
    kernel = functools.partial(_kernel, n_experts=n_exp)
    infer_mean, infer_std, z, sample = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
            pl.BlockSpec((n_exp, tb, d), lambda i: (0, i, 0)),
            pl.BlockSpec((n_exp, tb, d), lambda i: (0, i, 0)),
            pl.BlockSpec((n_exp, tb, 1), lambda i: (0, i, 0)),
            pl.BlockSpec((k, tb, d), lambda i: (0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
            pl.BlockSpec((k, tb, d), lambda i: (0, i, 0)),
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(prior_mean, prior_std, obs_mean, obs_std, mask, eps)
    if pad:
        infer_mean = infer_mean[:b_dim]
        infer_std = infer_std[:b_dim]
        z = z[:, :b_dim]
        sample = sample[:b_dim]
    return infer_mean, infer_std, z, sample
