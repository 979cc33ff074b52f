"""Golden parity: the scan-based MultiDKS forward vs a literal numpy
transcription of the reference's sequential loops
(/root/reference/models/dks.py:157-297), in MAP mode with shared weights,
for all four (rnn_dir × rnn_skip) baseline variants.

The transcription follows the reference's *loop structure* (per-timestep
python loops, list accumulation, post-hoc time flip for the backward RNN,
t_stop prior fallback) so direction/masking/policy bugs in either
implementation show up as mismatches. Also covers: absent modalities
(zero inputs + all-zero masks, dks.py:192-200), categorical (embedding)
encoders (dks.py:86-91), and fully-unobserved sequence tails exercising
the t > t_stop prior fallback (dks.py:266-270).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dks import MultiDKS

Z, H, T, B = 4, 8, 9, 3
MODS = ["m0", "m1"]
DIMS = [2, 3]
MIN_STD = 1e-3


def relu(x):
    return np.maximum(x, 0.0)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def lin(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def np_gaussian_mlp(p, x):
    h = relu(lin(p["in_to_h"], x))
    return lin(p["h_to_mean"], h), \
        softplus(lin(p["h_to_std"], h)) + MIN_STD


def np_categorical_mlp(p, x):
    h = relu(lin(p["in_to_h"], x))
    logits = lin(p["h_to_out"], h)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True),)


def np_gtf(p, z):
    gate = sigmoid(lin(p["gate_2"], relu(lin(p["gate_1"], z))))
    z_lin = lin(p["z_lin"], z)
    z_nonlin = lin(p["nonlin_2"], relu(lin(p["nonlin_1"], z)))
    z_std = softplus(lin(p["z_to_std"], z_nonlin)) + MIN_STD
    return (1 - gate) * z_lin + gate * z_nonlin, z_std


def np_gru_step(p, x, h_stack):
    """torch nn.GRU step (gate order r, z, n) over stacked layers."""
    new_h = []
    inp = x
    for i, layer in enumerate(p["layers"]):
        h = h_stack[i]
        hd = h.shape[-1]
        gi = inp @ np.asarray(layer["w_ih"]) + np.asarray(layer["b_ih"])
        gh = h @ np.asarray(layer["w_hh"]) + np.asarray(layer["b_hh"])
        r = sigmoid(gi[..., :hd] + gh[..., :hd])
        zg = sigmoid(gi[..., hd:2 * hd] + gh[..., hd:2 * hd])
        n = np.tanh(gi[..., 2 * hd:] + r * gh[..., 2 * hd:])
        h_i = (1 - zg) * n + zg * h
        new_h.append(h_i)
        inp = h_i
    return np.stack(new_h, 0)


def np_encode(params, inputs, model, t_max, b_dim):
    """dks.py:189-209: zero-mask missing, encode features per modality."""
    feats, masks = {}, {}
    for m in model.modalities:
        if m not in inputs:
            masks[m] = np.zeros((t_max, b_dim), bool)
            if model.dists[m] == "Categorical":
                x = np.zeros((t_max, b_dim, 1))
            else:
                x = np.zeros((t_max, b_dim, int(model.dims[m])))
        else:
            x = np.array(inputs[m], copy=True)
            masks[m] = ~np.isnan(x.reshape(t_max, b_dim, -1)).any(-1)
            x = np.nan_to_num(x, nan=0.0)
        flat = x.reshape((t_max * b_dim,) + x.shape[2:])
        p = params["enc"][m]
        if model.dists[m] == "Categorical":
            idx = flat.reshape(-1).astype(np.int64)
            f = relu(np.asarray(p["embed"]["w"])[idx])
            f = relu(lin(p["lin"], f))
        else:
            f = relu(lin(p, flat))
        feats[m] = f.reshape(t_max, b_dim, -1)
    return feats, masks


def np_forward(params, inputs, model, rnn_dir, rnn_skip):
    """dks.py:157-297, MAP path (sample=False)."""
    t_max, b_dim = np.shape(inputs[list(inputs)[0]])[:2]
    feats, masks = np_encode(params, inputs, model, t_max, b_dim)
    feat_cat = np.concatenate([feats[m] for m in model.modalities], -1)

    # RNN inference pass (dks.py:216-239).
    h = {m: np.repeat(np.asarray(params["h0"][m]), b_dim, 1)
         for m in model.modalities}
    h_out = {m: [] for m in model.modalities}
    t_rng = range(t_max) if rnn_dir == "fwd" else reversed(range(t_max))
    for t in t_rng:
        for m in model.modalities:
            h_next = np_gru_step(params["rnn"][m], feats[m][t], h[m])
            if rnn_skip:
                mask_m = masks[m][t].reshape(1, b_dim, 1).astype(float)
                h[m] = mask_m * h_next + (1 - mask_m) * h[m]
            else:
                h[m] = h_next
            h_out[m].append(h[m][-1])
    h_out = np.concatenate(
        [np.stack(h_out[m], 0) for m in model.modalities], -1)
    if rnn_dir == "bwd":
        h_out = h_out[::-1]

    # Last-observation indices (dks.py:242-244 / multiseq.py:329-339).
    mask_all = np.stack(
        [masks[m] for m in model.modalities]).prod(0)
    idx = mask_all.astype(np.int64) * np.arange(t_max)[:, None]
    t_stop = idx.max(0)[:, None]  # (B, 1)

    # Sequential inference/sampling loop (dks.py:246-283), MAP path.
    prior_mean, prior_std, infer_mean, infer_std, z_samples = \
        [], [], [], [], []
    for t in range(t_max):
        if t > 0:
            prior_mean_t, prior_std_t = np_gtf(params["fwd"], z_t)
        else:
            prior_mean_t = np.zeros((b_dim, model.z_dim)) + model.z0_mean
            prior_std_t = np.zeros((b_dim, model.z_dim)) + model.z0_std
            z_t = prior_mean_t
        prior_mean.append(prior_mean_t)
        prior_std.append(prior_std_t)
        comb_in = np.concatenate([z_t, h_out[t], feat_cat[t]], -1)
        infer_mean_t, infer_std_t = np_gaussian_mlp(
            params["combiner"], comb_in)
        live = (t <= t_stop).astype(float)
        infer_mean_t = infer_mean_t * live + prior_mean_t * (1 - live)
        infer_std_t = infer_std_t * live + prior_std_t * (1 - live)
        infer_mean.append(infer_mean_t)
        infer_std.append(infer_std_t)
        z_t = infer_mean_t
        z_samples.append(z_t)
    z_samples = np.stack(z_samples, 0)

    recon = {}
    flat_z = z_samples.reshape(-1, model.z_dim)
    for m in model.modalities:
        if model.dists[m] == "Categorical":
            out = np_categorical_mlp(params["dec"][m], flat_z)
        else:
            out = np_gaussian_mlp(params["dec"][m], flat_z)
        recon[m] = tuple(r.reshape((t_max, b_dim) + r.shape[1:])
                         for r in out)
    return ((np.stack(infer_mean), np.stack(infer_std)),
            (np.stack(prior_mean), np.stack(prior_std)), recon)


def _speckled_inputs(seed, unobserved_tail=0):
    rng = np.random.RandomState(seed)
    inputs = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < 0.3] = np.nan
        if unobserved_tail:
            x[-unobserved_tail:] = np.nan
        inputs[m] = x
    # Guarantee at least one fully-observed timestep so t_stop > 0.
    for m in MODS:
        inputs[m][0] = np.nan_to_num(inputs[m][0], nan=0.1)
    return inputs


def _check(model, params, state, inputs, rnn_dir, rnn_skip):
    np_params = jax.tree_util.tree_map(np.asarray, params)
    (infer_j, prior_j, recon_j), _ = model.forward(
        params, state, {m: jnp.array(v) for m, v in inputs.items()},
        rng=jax.random.PRNGKey(0), sample=False)
    infer_n, prior_n, recon_n = np_forward(
        np_params, inputs, model, rnn_dir, rnn_skip)
    for j, n, tag in ((infer_j, infer_n, "infer"),
                      (prior_j, prior_n, "prior")):
        np.testing.assert_allclose(np.asarray(j[0]), n[0], rtol=1e-4,
                                   atol=1e-5, err_msg=tag + " mean")
        np.testing.assert_allclose(np.asarray(j[1]), n[1], rtol=1e-4,
                                   atol=1e-5, err_msg=tag + " std")
    for m in recon_n:
        for a, b in zip(recon_j[m], recon_n[m]):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-4,
                                       atol=1e-5, err_msg="recon " + m)


@pytest.mark.parametrize("rnn_dir", ["fwd", "bwd"])
@pytest.mark.parametrize("rnn_skip", [False, True])
def test_dks_map_forward_matches_reference_transcription(rnn_dir,
                                                         rnn_skip):
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H, rnn_dir=rnn_dir,
                     rnn_skip=rnn_skip)
    params, state = model.init(jax.random.PRNGKey(11))
    inputs = _speckled_inputs(seed=5)
    _check(model, params, state, inputs, rnn_dir, rnn_skip)


@pytest.mark.parametrize("rnn_dir", ["fwd", "bwd"])
def test_dks_unobserved_tail_prior_fallback(rnn_dir):
    """All-NaN tail → posterior falls back to the prior after t_stop."""
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H, rnn_dir=rnn_dir,
                     rnn_skip=True)
    params, state = model.init(jax.random.PRNGKey(12))
    inputs = _speckled_inputs(seed=6, unobserved_tail=3)
    _check(model, params, state, inputs, rnn_dir, rnn_skip=True)


def test_dks_absent_modality_matches_transcription():
    """Modality missing from the inputs dict entirely (dks.py:192-200):
    zero features, all-zero mask."""
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H, rnn_dir="bwd",
                     rnn_skip=True)
    params, state = model.init(jax.random.PRNGKey(13))
    inputs = _speckled_inputs(seed=7)
    del inputs["m1"]
    _check(model, params, state, inputs, rnn_dir="bwd", rnn_skip=True)


def test_dks_categorical_modality_matches_transcription():
    """Embedding encoder + categorical decoder path (dks.py:86-91,113)."""
    model = MultiDKS(["x", "lab"], [2, 5], dists=["Normal", "Categorical"],
                     z_dim=Z, h_dim=H, rnn_dir="fwd", rnn_skip=True)
    params, state = model.init(jax.random.PRNGKey(14))
    rng = np.random.RandomState(9)
    x = rng.randn(T, B, 2).astype(np.float32)
    x[rng.rand(T, B) < 0.3] = np.nan
    lab = rng.randint(0, 5, (T, B, 1)).astype(np.float32)
    lab[rng.rand(T, B) < 0.3] = np.nan
    x[0] = np.nan_to_num(x[0], nan=0.1)
    lab[0] = np.abs(np.nan_to_num(lab[0], nan=1.0))
    inputs = {"x": x, "lab": lab}
    _check(model, params, state, inputs, rnn_dir="fwd", rnn_skip=True)
