"""Multimodal Deep Kalman Smoother (DKS) as scan programs.

TPU-native re-design of /root/reference/models/dks.py: Krishnan-style
structured inference with one GRU inference network per modality (run
forward or backward in time), two missing-data policies (``rnn_skip``
freezes the hidden state on unobserved steps; otherwise zero-masked
updates), a combiner MLP q(z_t | z_{t-1}, h_t [, x_t]), and a single
forward GTF transition prior. The four reference baselines map to
(rnn_dir, rnn_skip) ∈ {bwd,fwd} × {mask,skip}.

Both time loops (the per-modality GRU pass, dks.py:219-231, and the
sequential sampling pass, dks.py:246-280) are `jax.lax.scan`s.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import nn as tnn
from .base import (MultiDGTS, Codec, mlp_gaussian_codec,
                   mlp_categorical_codec)


def _mlp_feature_codec(in_dim, h_dim):
    """Default Linear+ReLU feature encoder (dks.py:93-95)."""
    def init(key):
        return tnn.linear_init(key, in_dim, h_dim), {}

    def apply(params, state, x, train):
        return jax.nn.relu(tnn.linear_apply(params, x)), state
    codec = Codec(init, apply)
    codec.feat_dim = h_dim
    return codec


def _embed_feature_codec(num_embeddings, h_dim):
    """Embedding→ReLU→Linear→ReLU feature encoder for categorical inputs
    (dks.py:87-91)."""
    def init(key):
        k1, k2 = jax.random.split(key)
        return {"embed": tnn.embedding_init(k1, num_embeddings, h_dim),
                "lin": tnn.linear_init(k2, h_dim, h_dim)}, {}

    def apply(params, state, x, train):
        idx = x.reshape(x.shape[0]).astype(jnp.int32)
        h = jax.nn.relu(tnn.embedding_apply(params["embed"], idx))
        return jax.nn.relu(tnn.linear_apply(params["lin"], h)), state
    codec = Codec(init, apply)
    codec.feat_dim = h_dim
    return codec


class MultiDKS(MultiDGTS):
    """Multimodal deep Kalman smoother."""

    def __init__(self, modalities, dims, dists=None,
                 encoders=None, decoders=None, h_dim=32, z_dim=32,
                 z0_mean=0.0, z0_std=1.0, min_std=1e-3, feat_to_z=True,
                 rnn_dir='bwd', rnn_skip=True, rnn_layers=1,
                 rnn_bias=True):
        self.modalities = list(modalities)
        self.n_mods = len(self.modalities)
        self.dims = dict(zip(self.modalities, dims))
        self.h_dim = h_dim
        self.z_dim = z_dim
        if dists is None:
            dists = ['Normal'] * self.n_mods
        self.dists = dict(zip(self.modalities, dists))
        self.min_std = min_std
        self.feat_to_z = feat_to_z
        self.rnn_dir = rnn_dir
        self.rnn_skip = rnn_skip
        self.rnn_layers = rnn_layers
        self.rnn_bias = rnn_bias
        # Fixed (non-learned) global prior (dks.py:153-155).
        self.z0_mean = float(z0_mean)
        self.z0_std = float(z0_std)

        self.enc = {}
        self.dec = {}
        for m in self.modalities:
            if self.dists[m] == 'Categorical':
                self.enc[m] = _embed_feature_codec(self._dim_of(m), h_dim)
                self.dec[m] = mlp_categorical_codec(
                    z_dim, self._dim_of(m), h_dim)
            else:
                self.enc[m] = _mlp_feature_codec(self._dim_of(m), h_dim)
                self.dec[m] = mlp_gaussian_codec(
                    z_dim, self._dim_of(m), h_dim)
        if encoders is not None:
            if isinstance(encoders, list):
                encoders = dict(zip(self.modalities, encoders))
            self.enc.update(encoders)
        if decoders is not None:
            if isinstance(decoders, list):
                decoders = dict(zip(self.modalities, decoders))
            self.dec.update(decoders)
        # Feature dims from codecs (dks.py:101-106).
        self.feat_dims = {m: getattr(self.enc[m], 'feat_dim', h_dim)
                          for m in self.modalities}

    def init(self, key):
        keys = jax.random.split(key, 3 * self.n_mods + 2)
        params = {"enc": {}, "dec": {}, "rnn": {}, "h0": {}}
        state = {"enc": {}, "dec": {}}
        for i, m in enumerate(self.modalities):
            params["enc"][m], state["enc"][m] = self.enc[m].init(keys[i])
            params["dec"][m], state["dec"][m] = \
                self.dec[m].init(keys[self.n_mods + i])
            params["rnn"][m] = tnn.gru_init(
                keys[2 * self.n_mods + i], self.feat_dims[m], self.h_dim,
                self.rnn_layers, self.rnn_bias)
            params["h0"][m] = jnp.zeros((self.rnn_layers, 1, self.h_dim))
        params["fwd"] = tnn.gtf_init(keys[-2], self.z_dim, self.h_dim,
                                     self.min_std)
        if self.feat_to_z:
            comb_dim = (self.z_dim + self.n_mods * self.h_dim +
                        sum(self.feat_dims[m] for m in self.modalities))
        else:
            comb_dim = self.z_dim + self.n_mods * self.h_dim
        params["combiner"] = tnn.gaussian_mlp_init(
            keys[-1], comb_dim, self.z_dim, self.h_dim)
        return params, state

    # ------------------------------------------------------------------

    def _encode_feats(self, params, state, inputs, train):
        """Zero-mask missing values and encode features (dks.py:189-209).

        Absent modalities become zero inputs with all-zero masks
        (dks.py:192-200)."""
        t_max, b_dim = inputs[list(inputs.keys())[0]].shape[:2]
        feats, masks = {}, {}
        new_state = dict(state)
        for m in self.modalities:
            if m in inputs:
                x = inputs[m]
                flat_mask = ~jnp.isnan(
                    x.reshape(t_max, b_dim, -1)).any(axis=-1)
                x = jnp.where(jnp.isnan(x), 0.0, x)
            else:
                if self.dists[m] == 'Categorical':
                    shape = (t_max, b_dim, 1)
                else:
                    d = self.dims[m]
                    shape = (t_max, b_dim) + (tuple(d) if isinstance(
                        d, (tuple, list)) else (int(d),))
                x = jnp.zeros(shape, jnp.float32)
                flat_mask = jnp.zeros((t_max, b_dim), bool)
            x_flat = x.reshape((t_max * b_dim,) + x.shape[2:])
            f, new_state[m] = self.enc[m].apply(params["enc"][m],
                                                state[m], x_flat, train)
            feats[m] = f.reshape(t_max, b_dim, -1)
            masks[m] = flat_mask
        return feats, masks, new_state

    def _rnn_pass(self, params, feats, masks, b_dim):
        """Per-modality GRU scan with skip/mask policy (dks.py:216-239).
        Returns h_out: (T, B, n_mods·h_dim) in original time order."""
        outs = []
        for m in self.modalities:
            f = feats[m]
            mask = masks[m].astype(jnp.float32)
            if self.rnn_dir == 'bwd':
                f, mask = f[::-1], mask[::-1]
            h0 = jnp.repeat(params["h0"][m], b_dim, axis=1)

            rnn_p = params["rnn"][m]
            skip = self.rnn_skip

            def cell(h, xs):
                x_t, m_t = xs
                h_next = tnn.gru_step(rnn_p, x_t, h)
                if skip:
                    m_b = m_t[None, :, None]
                    h_next = m_b * h_next + (1 - m_b) * h
                return h_next, h_next[-1]

            _, h_seq = jax.lax.scan(cell, h0, (f, mask),
                                    unroll=tnn.auto_unroll())
            if self.rnn_dir == 'bwd':
                h_seq = h_seq[::-1]
            outs.append(h_seq)
        return jnp.concatenate(outs, axis=-1)

    # ------------------------------------------------------------------

    def forward(self, params, state, inputs, rng, lengths=None,
                sample=True, sample_init=False, train=False, **kwargs):
        """Structured inference forward (dks.py:157-297)."""
        some = inputs[list(inputs.keys())[0]]
        t_max, b_dim = some.shape[:2]
        inputs = {m: inputs[m] for m in inputs if m in self.modalities}

        feats, masks, enc_state = self._encode_feats(
            params, state["enc"], inputs, train)
        h_out = self._rnn_pass(params, feats, masks, b_dim)
        if self.feat_to_z:
            feat_cat = jnp.concatenate(
                [feats[m] for m in self.modalities], axis=-1)
        else:
            feat_cat = jnp.zeros((t_max, b_dim, 0))

        # Last observed timestep per sequence (dks.py:242-244):
        # all-modality mask product → mask_to_extent.
        mask_all = jnp.stack(
            [masks[m] for m in self.modalities]).prod(axis=0)
        idx = jnp.arange(t_max)[:, None] * mask_all.astype(jnp.int32)
        t_stop = jnp.max(idx, axis=0)  # (B,)

        z0_mean = jnp.full((b_dim, self.z_dim), self.z0_mean)
        z0_std = jnp.full((b_dim, self.z_dim), self.z0_std)
        keys = jax.random.split(rng, t_max)
        t_idx = jnp.arange(t_max)

        comb_p = params["combiner"]
        fwd_p = params["fwd"]
        min_std = self.min_std

        def cell(z_prev, xs):
            h_t, f_t, t, key = xs
            pm, ps = tnn.gtf_apply(fwd_p, z_prev, min_std)
            prior_mean_t = jnp.where(t == 0, z0_mean, pm)
            prior_std_t = jnp.where(t == 0, z0_std, ps)
            comb_in = jnp.concatenate([z_prev, h_t, f_t], axis=-1)
            im, istd = tnn.gaussian_mlp_apply(comb_p, comb_in)
            live = (t <= t_stop).astype(jnp.float32)[:, None]
            infer_mean_t = im * live + prior_mean_t * (1 - live)
            infer_std_t = istd * live + prior_std_t * (1 - live)
            if sample:
                z_t = self.sample_gauss(key, infer_mean_t, infer_std_t)
            elif sample_init:
                z_s = self.sample_gauss(key, infer_mean_t, infer_std_t)
                z_t = jnp.where(t == 0, z_s, infer_mean_t)
            else:
                z_t = infer_mean_t
            return z_t, (prior_mean_t, prior_std_t,
                         infer_mean_t, infer_std_t, z_t)

        # NOTE (reference parity): at t=0 the combiner sees z_prev =
        # z0_mean (dks.py:253-255 sets z_t to the prior mean before the
        # combiner input is formed).
        _, (p_mean, p_std, i_mean, i_std, z_samples) = jax.lax.scan(
            cell, z0_mean, (h_out, feat_cat, t_idx, keys),
            unroll=tnn.auto_unroll())

        recon, dec_state = self._decode(params["dec"], state["dec"],
                                        z_samples, train)
        new_state = {"enc": enc_state, "dec": dec_state}
        return ((i_mean, i_std), (p_mean, p_std), recon), new_state

    def _decode(self, params, state, z, train):
        t_max, b_dim = z.shape[:2]
        flat = z.reshape(t_max * b_dim, self.z_dim)
        recon = {}
        new_state = dict(state)
        for m in self.modalities:
            out, new_state[m] = self.dec[m].apply(params[m], state[m],
                                                  flat, train)
            recon[m] = tuple(
                r.reshape((t_max, b_dim) + r.shape[1:]) for r in out)
        return recon, new_state

    def sample(self, params, state, t_max, b_dim, rng):
        """Ancestral generation (dks.py:299-342)."""
        z0_mean = jnp.full((b_dim, self.z_dim), self.z0_mean)
        z0_std = jnp.full((b_dim, self.z_dim), self.z0_std)
        keys = jax.random.split(rng, t_max)
        t_idx = jnp.arange(t_max)
        fwd_p = params["fwd"]
        min_std = self.min_std

        def cell(z_prev, xs):
            t, key = xs
            pm, ps = tnn.gtf_apply(fwd_p, z_prev, min_std)
            prior_mean_t = jnp.where(t == 0, z0_mean, pm)
            prior_std_t = jnp.where(t == 0, z0_std, ps)
            z_t = self.sample_gauss(key, prior_mean_t, prior_std_t)
            return z_t, z_t

        _, z_samples = jax.lax.scan(cell, z0_mean, (t_idx, keys),
                                    unroll=tnn.auto_unroll())
        recon, _ = self._decode(params["dec"], state["dec"],
                                z_samples, train=False)
        return recon


if __name__ == "__main__":
    # Smoke test mirroring /root/reference/models/dks.py:344-370.
    import argparse
    import jax as _jax
    from ..data.spirals import SpiralsDataset
    from ..data.multiseq import seq_collate_dict

    parser = argparse.ArgumentParser()
    parser.add_argument('--dir', type=str, default="./data/spirals")
    parser.add_argument('--subset', type=str, default="train")
    args = parser.parse_args()

    print("Loading data...")
    dataset = SpiralsDataset(['spiral-x', 'spiral-y'], args.dir,
                             args.subset, truncate=True,
                             item_as_dict=True)
    print("Building model...")
    model = MultiDKS(['spiral-x', 'spiral-y'], [1, 1])
    params, state = model.init(_jax.random.PRNGKey(0))
    print("Passing a sample through the model...")
    data, mask, lengths, order, _ = seq_collate_dict([dataset[0]])
    inputs = {m: jnp.asarray(v) for m, v in data.items()
              if m in model.modalities}
    (infer, prior, recon), _ = model.forward(
        params, state, inputs, rng=_jax.random.PRNGKey(1), sample=False)
    print("Predicted:")
    for x, y in zip(np.asarray(recon['spiral-x'][0]).ravel(),
                    np.asarray(recon['spiral-y'][0]).ravel()):
        print("{:+0.3f}, {:+0.3f}".format(x, y))
