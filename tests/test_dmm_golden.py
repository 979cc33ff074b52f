"""Golden parity test: the scan-based BFVI forward vs a literal numpy
transcription of the reference's sequential loops
(/root/reference/models/dmm.py), in MAP mode (sample=False, 1 particle)
with shared weights.

The transcription below follows the reference's *loop structure* (python
per-timestep loops, list accumulation, time reversal, `cons` expert
appending) — structurally different from the lax.scan implementation — so
direction/masking/expert-order bugs in either one show up as mismatches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM

Z, H, T, B = 4, 8, 9, 3
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
    return lin(p["h_to_mean"], h), softplus(lin(p["h_to_std"], h)) \
        + MIN_STD


def np_gtf(p, z):
    gate = sigmoid(lin(p["gate_2"], relu(lin(p["gate_1"], z))))
    z_lin = lin(p["z_lin"], z)
    z_nonlin = lin(p["nonlin_2"], relu(lin(p["nonlin_1"], z)))
    z_std = softplus(lin(p["z_to_std"], z_nonlin)) + MIN_STD
    return (1 - gate) * z_lin + gate * z_nonlin, z_std


def np_poe(mean, std, mask=None):
    """dgts.py:15-51 transcription."""
    var = std ** 2 + EPS
    Tm = 1.0 / var * np.sign(std)
    if mask is None:
        mask = ~np.isnan(var).any(-1)
    maskf = np.asarray(mask, float)[..., None]
    Tm = Tm * maskf
    mean = mean * maskf
    with np.errstate(divide="ignore", invalid="ignore"):
        pm = (mean * Tm).sum(0) / Tm.sum(0)
    pm = np.nan_to_num(pm, nan=0.0)
    ps = (1.0 / Tm.sum(0)) ** 0.5
    return pm, ps


def np_prior(params, b_dim):
    mean = np.repeat(np.asarray(params["z0_mean"]), b_dim, 0)
    std = np.repeat(np.exp(np.asarray(params["z0_log_std"])) + MIN_STD,
                    b_dim, 0)
    return mean, std


def np_z_next(params, z, direction, glb):
    """dmm.py:214-246, single-particle path."""
    glb_mean, glb_std = glb
    q_mean, q_std = np_gtf(params["trans"][direction], z[0])
    return np_poe(np.stack([glb_mean, q_mean]),
                  np.stack([glb_std, q_std]))


def np_z_filter(params, z_mean, z_std, z_masks, direction):
    """dmm.py:319-412, MAP path (sample=False, n_particles=1)."""
    t_max, b_dim = z_mean.shape[1:3]
    prior_mean, prior_std, infer_mean, infer_std, samples = \
        [], [], [], [], []
    rv = (lambda x: list(reversed(x))) if direction == "bwd" \
        else (lambda x: x)
    glb = np_prior(params, b_dim)
    z_t = None
    for t in rv(list(range(t_max))):
        prior_mask_t = np.ones((b_dim,))
        if len(samples) == 0:
            prior_mean_t, prior_std_t = glb
        else:
            prior_mean_t, prior_std_t = np_z_next(params, z_t, direction,
                                                  glb)
        prior_mean.append(prior_mean_t)
        prior_std.append(prior_std_t)
        z_mean_t = np.concatenate([prior_mean_t[None], z_mean[:, t]], 0)
        z_std_t = np.concatenate([prior_std_t[None], z_std[:, t]], 0)
        masks = np.concatenate([prior_mask_t[None], z_masks[:, t]], 0)
        infer_mean_t, infer_std_t = np_poe(z_mean_t, z_std_t, masks)
        infer_mean.append(infer_mean_t)
        infer_std.append(infer_std_t)
        z_t = infer_mean_t[None]
        samples.append(infer_mean_t)
    return ((np.stack(rv(infer_mean)), np.stack(rv(infer_std))),
            (np.stack(rv(prior_mean)), np.stack(rv(prior_std))),
            np.stack(rv(samples)))


def np_encode(params, inputs, model):
    z_mean, z_std, masks = [], [], []
    for m in model.modalities:
        x = np.asarray(inputs[m])
        t_max, b_dim = x.shape[:2]
        mask_m = ~np.isnan(x.reshape(t_max, b_dim, -1)).any(-1)
        x = np.nan_to_num(x, nan=0.0)
        mm, ms = np_gaussian_mlp(params["enc"][m],
                                 x.reshape(t_max * b_dim, -1))
        z_mean.append(mm.reshape(t_max, b_dim, -1))
        z_std.append(ms.reshape(t_max, b_dim, -1))
        masks.append(mask_m)
    return np.stack(z_mean), np.stack(z_std), np.stack(masks)


def np_forward(params, inputs, model, mode):
    """dmm.py:420-494, MAP path."""
    obs_mean, obs_std, obs_mask = np_encode(params, inputs, model)
    t_max, b_dim = obs_mean.shape[1:3]
    direction = "fwd" if mode in ("ffilter", "bsmooth") else "bwd"
    infer, prior, z_samples = np_z_filter(
        params, obs_mean, obs_std, obs_mask.astype(float), direction)
    if mode in ("fsmooth", "bsmooth"):
        direction = "fwd" if mode == "fsmooth" else "bwd"
        glb_mean, glb_std = np_prior(params, b_dim)
        inv_mean = np.broadcast_to(glb_mean[0], (t_max, b_dim, Z)).copy()
        inv_std = -np.broadcast_to(glb_std[0], (t_max, b_dim, Z)).copy()
        flt_mean, flt_std = prior
        flt_mask = np.ones((t_max, b_dim))
        flt_mask[-1] = 0.0
        inv_mask = np.ones((t_max, b_dim))
        cons_mean = np.concatenate(
            [obs_mean, flt_mean[None], inv_mean[None]], 0)
        cons_std = np.concatenate(
            [obs_std, flt_std[None], inv_std[None]], 0)
        cons_mask = np.concatenate(
            [obs_mask.astype(float), flt_mask[None], inv_mask[None]], 0)
        infer, prior, z_samples = np_z_filter(
            params, cons_mean, cons_std, cons_mask, direction)
    recon = {}
    for m in model.modalities:
        mm, ms = np_gaussian_mlp(
            params["dec"][m], z_samples.reshape(t_max * b_dim, Z))
        recon[m] = (mm.reshape(t_max, b_dim, -1),
                    ms.reshape(t_max, b_dim, -1))
    return infer, prior, recon


@pytest.fixture(scope="module")
def setup():
    model = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(42))
    np_params = jax.tree_util.tree_map(np.asarray, params)
    rng = np.random.RandomState(7)
    inputs = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < 0.3] = np.nan
        inputs[m] = x
    return model, params, state, np_params, inputs


@pytest.mark.parametrize("mode", ["bfilter", "ffilter", "fsmooth",
                                  "bsmooth"])
def test_map_forward_matches_reference_transcription(setup, mode):
    model, params, state, np_params, inputs = setup
    (infer_j, prior_j, recon_j), _ = model.forward(
        params, state, {m: jnp.array(v) for m, v in inputs.items()},
        rng=jax.random.PRNGKey(0), mode=mode, sample=False)
    infer_n, prior_n, recon_n = np_forward(np_params, inputs, model, mode)

    np.testing.assert_allclose(np.asarray(prior_j[0]), prior_n[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prior_j[1]), prior_n[1],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(infer_j[0]), infer_n[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(infer_j[1]), infer_n[1],
                               rtol=1e-4, atol=1e-5)
    for m in MODS:
        np.testing.assert_allclose(np.asarray(recon_j[m][0]),
                                   recon_n[m][0], rtol=1e-4, atol=1e-5)
