"""Tests for the DKS and VRNN baseline models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dks import MultiDKS
from multimodal_dmm_tpu.models.vrnn import MultiVRNN

T, B, Z, H = 10, 3, 4, 8
MODS = ["a", "b"]
DIMS = [2, 3]


def make_inputs(seed=0, nan_frac=0.3):
    rng = np.random.RandomState(seed)
    out = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < nan_frac] = np.nan
        out[m] = jnp.array(x)
    return out


@pytest.mark.parametrize("rnn_dir,rnn_skip", [("fwd", False),
                                              ("fwd", True),
                                              ("bwd", False),
                                              ("bwd", True)])
def test_dks_variants_forward(rnn_dir, rnn_skip):
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H, rnn_dir=rnn_dir,
                     rnn_skip=rnn_skip)
    params, state = model.init(jax.random.PRNGKey(0))
    (infer, prior, recon), _ = model.forward(
        params, state, make_inputs(), rng=jax.random.PRNGKey(1),
        sample=False)
    assert infer[0].shape == (T, B, Z)
    assert prior[0].shape == (T, B, Z)
    for m, d in zip(MODS, DIMS):
        assert recon[m][0].shape == (T, B, d)
    assert np.all(np.isfinite(np.asarray(infer[0])))
    assert np.all(np.isfinite(np.asarray(recon["a"][0])))


def test_dks_posterior_falls_back_to_prior_after_last_obs():
    """After the last jointly-observed timestep, infer == prior
    (dks.py:267-270)."""
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    inputs = make_inputs(nan_frac=0.0)
    # Cut all observations after t=5
    inputs = {m: jnp.asarray(x).at[6:].set(jnp.nan)
              for m, x in inputs.items()}
    (infer, prior, _), _ = model.forward(
        params, state, inputs, rng=jax.random.PRNGKey(1), sample=False)
    np.testing.assert_allclose(np.asarray(infer[0][6:]),
                               np.asarray(prior[0][6:]), atol=1e-6)
    # Before the cut they must differ
    assert not np.allclose(np.asarray(infer[0][:5]),
                           np.asarray(prior[0][:5]))


def test_dks_rnn_skip_freezes_hidden_state():
    """rnn_skip: hidden state frozen on unobserved steps ⇒ inference
    unchanged when a trailing missing block is removed vs zero-masked."""
    inputs = make_inputs(nan_frac=0.0)
    inputs_gap = {m: jnp.asarray(x).at[4:7].set(jnp.nan)
                  for m, x in inputs.items()}
    for skip in (True, False):
        model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H, rnn_dir="fwd",
                         rnn_skip=skip)
        params, state = model.init(jax.random.PRNGKey(0))
        (infer, _, _), _ = model.forward(params, state, inputs_gap,
                                         rng=jax.random.PRNGKey(1),
                                         sample=False)
        if skip:
            # With skip, the hidden state at t=7 equals that of t=3's
            # update → check finite and different handling vs mask mode
            frozen = np.asarray(infer[0])
        else:
            masked = np.asarray(infer[0])
    assert not np.allclose(frozen, masked)


def test_dks_step_and_grads():
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    inputs = make_inputs()
    mask = jnp.ones((T, B, 1))

    def loss_fn(p):
        loss, _ = model.step(p, state, inputs, mask, 1.0,
                             {"a": 1.0, "b": 1.0},
                             rng=jax.random.PRNGKey(2), uni_loss=False)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert np.any(np.asarray(grads["combiner"]["in_to_h"]["w"]) != 0)
    assert np.any(np.asarray(grads["h0"]["a"]) != 0)


def test_dks_sample():
    model = MultiDKS(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    recon = model.sample(params, state, 8, 2, jax.random.PRNGKey(3))
    assert recon["a"][0].shape == (8, 2, DIMS[0])


@pytest.mark.parametrize("recur_mode", ["no_inputs", "use_inputs"])
def test_vrnn_forward(recur_mode):
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H,
                      recur_mode=recur_mode)
    params, state = model.init(jax.random.PRNGKey(0))
    (infer, prior, recon), _ = model.forward(
        params, state, make_inputs(), rng=jax.random.PRNGKey(1),
        sample=False)
    assert infer[0].shape == (T, B, Z)
    for m, d in zip(MODS, DIMS):
        assert recon[m][0].shape == (T, B, d)
        assert recon[m][1].shape == (T, B, d)
    assert np.all(np.isfinite(np.asarray(recon["a"][0])))


def test_vrnn_missing_modality():
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    inputs = make_inputs()
    (infer, _, recon), _ = model.forward(
        params, state, {"a": inputs["a"]}, rng=jax.random.PRNGKey(1),
        sample=False)
    assert np.all(np.isfinite(np.asarray(infer[0])))
    assert recon["b"][0].shape == (T, B, DIMS[1])


def test_vrnn_step_and_grads():
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    inputs = make_inputs()
    mask = jnp.ones((T, B, 1))

    def loss_fn(p):
        loss, _ = model.step(p, state, inputs, mask, 1.0,
                             {"a": 1.0, "b": 1.0},
                             rng=jax.random.PRNGKey(2))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_vrnn_sample():
    model = MultiVRNN(MODS, DIMS, z_dim=Z, h_dim=H,
                      recur_mode="use_inputs")
    params, state = model.init(jax.random.PRNGKey(0))
    recon = model.sample(params, state, 6, 2, jax.random.PRNGKey(3))
    assert recon["a"][0].shape == (6, 2, DIMS[0])
