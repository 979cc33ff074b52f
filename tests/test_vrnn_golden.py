"""Golden parity: the scan-based MultiVRNN forward vs a literal numpy
transcription of the reference's sequential per-timestep loop
(/root/reference/models/vrnn.py:123-235), MAP mode, shared weights.

Covers both recurrence modes ('no_inputs', 'use_inputs' with elementwise
NaN imputation from own reconstructions) and absent modalities. The
reference's vrnn.py:105 constructs the prior with an unimported name
(NameError); the transcription uses the intended GaussianMLP prior, the
documented fix in models/vrnn.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.vrnn import MultiVRNN

Z, H, T, B = 4, 8, 7, 3
MODS = ["m0", "m1"]
DIMS = [2, 3]
MIN_STD = 1e-3
EPS = 1e-8


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


def np_gru_step(p, x, h_stack):
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


def np_poe(mean, std, mask):
    """dgts.py:15-51 transcription (signed-std precision PoE)."""
    var = std ** 2 + EPS
    Tm = 1.0 / var * np.sign(std)
    maskf = np.asarray(mask, float)[..., None]
    Tm = Tm * maskf
    mean = mean * maskf
    with np.errstate(divide="ignore", invalid="ignore"):
        pm = (mean * Tm).sum(0) / Tm.sum(0)
    pm = np.nan_to_num(pm, nan=0.0)
    ps = (1.0 / Tm.sum(0)) ** 0.5
    return pm, ps


def np_forward(params, inputs, model, recur_mode):
    """vrnn.py:123-235 transcription, MAP path."""
    t_max, b_dim = np.shape(inputs[list(inputs)[0]])[:2]
    h = np.repeat(np.asarray(params["h0"]), b_dim, 1)
    prior_mean, prior_std, infer_mean, infer_std = [], [], [], []
    rec_mean = {m: [] for m in model.modalities}
    rec_std = {m: [] for m in model.modalities}
    for t in range(t_max):
        if t > 0:
            prior_mean_t, prior_std_t = np_gaussian_mlp(
                params["prior"], h[-1])
        else:
            prior_mean_t = np.zeros((b_dim, Z)) + model.z0_mean
            prior_std_t = np.zeros((b_dim, Z)) + model.z0_std
        prior_mean.append(prior_mean_t)
        prior_std.append(prior_std_t)

        e_mean = [prior_mean_t]
        e_std = [prior_std_t]
        masks = [np.ones((b_dim,))]
        for m in model.modalities:
            if m not in inputs:
                continue
            x_t = np.array(inputs[m][t], copy=True)
            mask = ~np.isnan(x_t).any(-1)
            x_t = np.nan_to_num(x_t, nan=0.0)
            phi_m = relu(lin(params["phi"][m], x_t))
            em, es = np_gaussian_mlp(
                params["enc"][m], np.concatenate([phi_m, h[-1]], -1))
            e_mean.append(em)
            e_std.append(es)
            masks.append(mask.astype(float))
        infer_mean_t, infer_std_t = np_poe(
            np.stack(e_mean), np.stack(e_std), np.stack(masks))
        infer_mean.append(infer_mean_t)
        infer_std.append(infer_std_t)

        zq = infer_mean_t  # MAP
        phi_zq = relu(lin(params["phi_z"], zq))
        dec_in = np.concatenate([phi_zq, h[-1]], -1)
        for m in model.modalities:
            rm, rs = np_gaussian_mlp(params["dec"][m], dec_in)
            rec_mean[m].append(rm)
            rec_std[m].append(rs)

        if recur_mode == "use_inputs":
            phis = []
            for m in model.modalities:
                if m not in inputs:
                    x_imp = rec_mean[m][-1]
                else:
                    x_imp = np.array(inputs[m][t], copy=True)
                    nan_mask = np.isnan(x_imp)
                    x_imp[nan_mask] = rec_mean[m][-1][nan_mask]
                phis.append(relu(lin(params["phi"][m], x_imp)))
            rnn_in = np.concatenate(phis + [phi_zq], -1)
        else:
            rnn_in = phi_zq
        h = np_gru_step(params["rnn"], rnn_in, h)

    recon = {m: (np.stack(rec_mean[m]), np.stack(rec_std[m]))
             for m in model.modalities}
    return ((np.stack(infer_mean), np.stack(infer_std)),
            (np.stack(prior_mean), np.stack(prior_std)), recon)


def _speckled_inputs(seed):
    rng = np.random.RandomState(seed)
    inputs = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < 0.25] = np.nan           # row-missing
        x[rng.rand(T, B, d) < 0.15] = np.nan        # element-missing
        inputs[m] = x
    return inputs


def _check(model, params, state, inputs, recur_mode):
    np_params = jax.tree_util.tree_map(np.asarray, params)
    (infer_j, prior_j, recon_j), _ = model.forward(
        params, state, {m: jnp.array(v) for m, v in inputs.items()},
        rng=jax.random.PRNGKey(0), sample=False)
    infer_n, prior_n, recon_n = np_forward(np_params, inputs, model,
                                           recur_mode)
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


@pytest.mark.parametrize("recur_mode", ["no_inputs", "use_inputs"])
def test_vrnn_map_forward_matches_reference_transcription(recur_mode):
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H,
                      recur_mode=recur_mode)
    params, state = model.init(jax.random.PRNGKey(21))
    inputs = _speckled_inputs(seed=3)
    _check(model, params, state, inputs, recur_mode)


@pytest.mark.parametrize("recur_mode", ["no_inputs", "use_inputs"])
def test_vrnn_absent_modality_matches_transcription(recur_mode):
    """Absent modality: no expert contribution; in use_inputs mode its
    recurrence features come from the (detached) reconstruction."""
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H,
                      recur_mode=recur_mode)
    params, state = model.init(jax.random.PRNGKey(22))
    inputs = _speckled_inputs(seed=4)
    del inputs["m1"]
    _check(model, params, state, inputs, recur_mode)


def test_vrnn_use_inputs_gradients_finite():
    """Gradients through the elementwise imputation path stay finite."""
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H,
                      recur_mode="use_inputs")
    params, state = model.init(jax.random.PRNGKey(23))
    inputs = {m: jnp.array(v) for m, v in _speckled_inputs(8).items()}

    def loss(p):
        (infer, prior, recon), _ = model.forward(
            p, state, inputs, rng=jax.random.PRNGKey(1), sample=False)
        tot = 0.0
        for m in model.modalities:
            tot += jnp.sum(jnp.where(jnp.isnan(inputs[m]), 0.0,
                                     (recon[m][0] - jnp.nan_to_num(
                                         inputs[m])) ** 2))
        return tot

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))