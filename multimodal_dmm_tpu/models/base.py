"""Shared base for deep generative time-series models.

JAX equivalent of /root/reference/models/dgts.py: the multimodal training
step (joint ELBO + per-modality unimodal ELBOs), the weighted KLD +
reconstruction loss with per-distribution NLL dispatch, and the codec
registry that gives every modality an encoder/decoder with a uniform
functional interface.

Models are *config objects*: they hold static structure (modalities, dims,
dists, codec specs) and expose pure functions
``init(key) -> (params, state)`` and
``forward(params, state, inputs, rng, **mode) -> ((infer, prior, recon),
new_state)``. Everything traces under jit; randomness is explicit via
`jax.random` keys.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses
from ..ops.poe import product_of_experts, mean_of_experts
from . import nn as tnn


class Codec:
    """Uniform encoder/decoder interface.

    init(key) -> (params, state); apply(params, state, x, train) ->
    (output, new_state) where output is a tuple of distribution params
    (or a (mean, std) pair for Gaussian heads, or raw features).
    """

    def __init__(self, init, apply):
        self.init = init
        self.apply = apply


def mlp_gaussian_codec(in_dim, out_dim, h_dim, min_std=1e-3):
    """Default Gaussian MLP codec (common.py:25-41)."""
    def init(key):
        return tnn.gaussian_mlp_init(key, in_dim, out_dim, h_dim), {}

    def apply(params, state, x, train):
        return tnn.gaussian_mlp_apply(params, x, min_std), state
    return Codec(init, apply)


def mlp_categorical_codec(in_dim, out_dim, h_dim):
    """Default categorical MLP decoder head (common.py:9-23)."""
    def init(key):
        return tnn.categorical_mlp_init(key, in_dim, out_dim, h_dim), {}

    def apply(params, state, x, train):
        return tnn.categorical_mlp_apply(params, x), state
    return Codec(init, apply)


def embed_gaussian_codec(num_embeddings, z_dim, h_dim, min_std=1e-3):
    """Embedding → ReLU → GaussianMLP encoder for categorical inputs
    (dmm.py:78-82)."""
    def init(key):
        k1, k2 = jax.random.split(key)
        return {"embed": tnn.embedding_init(k1, num_embeddings, h_dim),
                "head": tnn.gaussian_mlp_init(k2, h_dim, z_dim,
                                              h_dim)}, {}

    def apply(params, state, x, train):
        # x: (N, 1) float-encoded labels already zero-filled + int-cast
        idx = x.reshape(x.shape[0]).astype(jnp.int32)
        h = jax.nn.relu(tnn.embedding_apply(params["embed"], idx))
        return tnn.gaussian_mlp_apply(params["head"], h, min_std), state
    return Codec(init, apply)


class MultiDGTS:
    """Base class: PoE/MoE math + multimodal training objective.

    Subclasses define modalities/dims/dists and `forward`.
    """

    # -- expert fusion (delegates to ops) -----------------------------------

    @staticmethod
    def product_of_experts(mean, std, mask=None, eps=1e-8):
        return product_of_experts(mean, std, mask, eps)

    @staticmethod
    def mean_of_experts(mean, std, mask=None):
        return mean_of_experts(mean, std, mask)

    # -- objective (dgts.py:85-175) -----------------------------------------

    def step(self, params, state, inputs, mask, kld_mult, rec_mults, rng,
             targets=None, uni_loss=True, train=True, **kwargs):
        """Multimodal training objective: joint ELBO (if >1 modality
        provided) plus per-modality unimodal ELBOs (dgts.py:85-130).

        Returns (loss, new_state).
        """
        inputs = {m: inputs[m] for m in inputs if m in self.modalities}
        if targets is None:
            targets = inputs
        loss = 0.0
        if len(self.modalities) > 1:
            rng, sub = jax.random.split(rng)
            (infer, prior, recon), state = self.forward(
                params, state, inputs, rng=sub, train=train, **kwargs)
            loss += self.loss(targets, infer, prior, recon, mask,
                              kld_mult, rec_mults)
        if not uni_loss:
            return loss, state
        for m in self.modalities:
            # The reference iterates all modalities (dgts.py:126) but is
            # only ever called with full input dicts; skip absent ones
            # so modality-subset training is well-defined.
            if m not in inputs:
                continue
            rng, sub = jax.random.split(rng)
            (infer, prior, recon), state = self.forward(
                params, state, {m: inputs[m]}, rng=sub, train=train,
                **kwargs)
            loss += self.loss({m: targets[m]}, infer, prior, recon, mask,
                              kld_mult, rec_mults)
        return loss, state

    def loss(self, inputs, infer, prior, recon, mask=None,
             kld_mult=1.0, rec_mults=None, avg=False):
        """kld_mult·KLD + Σ rec_mults[m]·NLL_m (dgts.py:132-145)."""
        total = kld_mult * self.kld_loss(infer, prior, mask)
        total += self.rec_loss(inputs, recon, mask, rec_mults)
        if avg:
            n_data = jnp.sum(mask) if mask is not None else (
                np.prod(inputs[self.modalities[-1]].shape[:2]))
            total = total / n_data
        return total

    def kld_loss(self, infer, prior, mask=None):
        infer_mean, infer_std = infer
        prior_mean, prior_std = prior
        return losses.kld_gauss(infer_mean, infer_std,
                                prior_mean, prior_std, mask)

    def rec_loss(self, inputs, recon, mask=None, rec_mults=None):
        """Per-distribution NLL dispatch (dgts.py:154-175)."""
        rec_mults = rec_mults or {}
        loss = 0.0
        for m in self.modalities:
            if m not in inputs:
                continue
            mult = rec_mults.get(m, 1.0)
            if mult == 0:
                continue
            if self.dists[m] == "Bernoulli":
                loss += mult * losses.nll_bernoulli(recon[m][0],
                                                    inputs[m], mask)
            elif self.dists[m] == "Categorical":
                loss += mult * losses.nll_categorical(recon[m][0],
                                                      inputs[m], mask)
            elif self.dists[m] == "Normal":
                rec_mean, rec_std = recon[m]
                loss += mult * losses.nll_gauss(rec_mean, rec_std,
                                                inputs[m], mask)
        return loss

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def sample_gauss(rng, mean, std, shape=None):
        """Reparameterized Gaussian sample (dgts.py:177-180)."""
        if shape is None:
            shape = mean.shape
        eps = jax.random.normal(rng, shape, mean.dtype)
        return eps * std + mean

    def _dim_of(self, m):
        d = self.dims[m]
        return int(np.prod(d)) if isinstance(d, (tuple, list)) else int(d)

    def _nan_fill_missing(self, inputs, t_max, b_dim, native_mods=()):
        """Return a dict covering all modalities; absent ones become NaN
        arrays (→ observation masks of zero, excluded from PoE), keeping
        shapes static across modality-subset forwards. Modalities in
        ``native_mods`` fill in the encoder-native trailing-dim layout
        (enc.raw_perm of the edge dims)."""
        full = {}
        for m in self.modalities:
            if m in inputs:
                full[m] = inputs[m]
            else:
                if self.dists[m] == "Categorical":
                    # Label modalities are (T, B, 1) index arrays
                    # (dks.py:193-194); dims[m] is the class count.
                    shape = (t_max, b_dim, 1)
                else:
                    d = self.dims[m]
                    dims = (tuple(d) if isinstance(d, (tuple, list))
                            else (int(d),))
                    if m in native_mods:
                        perm = getattr(self.enc[m], "raw_perm", None)
                        if perm is not None:
                            dims = tuple(dims[p] for p in perm)
                    shape = (t_max, b_dim) + dims
                full[m] = jnp.full(shape, jnp.nan, dtype=jnp.float32)
        return full

    def native_input_perms(self):
        """Trailing-dim permutations for modalities whose training-step
        inputs/targets may be stored in the codec-native layout (the
        device loader applies them once at upload; the fused step then
        runs with zero edge transposes). Base models don't support it."""
        return {}
