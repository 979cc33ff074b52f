"""The fused (stacked-variant) DMM objective must match the reference's
loop of separate forwards exactly in MAP mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM

T, B, Z, H = 10, 4, 5, 12
MODS = ["m0", "m1", "m2"]
DIMS = [2, 3, 1]


@pytest.fixture(scope="module")
def setup():
    model = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    inputs = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < 0.3] = np.nan
        inputs[m] = jnp.array(x)
    mask = jnp.ones((T, B, 1))
    return model, params, state, inputs, mask


@pytest.mark.parametrize("uni_loss", [True, False])
def test_fused_matches_unfused_map(setup, uni_loss):
    model, params, state, inputs, mask = setup
    rec_mults = {"m0": 0.5, "m1": 0.2, "m2": 1.0}
    common = dict(kld_mult=0.7, rec_mults=rec_mults,
                  rng=jax.random.PRNGKey(9), targets=inputs,
                  uni_loss=uni_loss, sample=False, match_mult=0.0,
                  train_particles=1, flt_particles=1)
    loss_ref, _ = model.step(params, state, inputs, mask, fused=False,
                             **common)
    loss_fused, _ = model.step(params, state, inputs, mask, fused=True,
                               **common)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=2e-4)


def test_fused_matches_unfused_subset_inputs(setup):
    """Fused path with an input dict missing a modality."""
    model, params, state, inputs, mask = setup
    sub = {m: inputs[m] for m in ("m0", "m2")}
    tgt = {m: inputs[m] for m in MODS}
    common = dict(kld_mult=1.0, rec_mults={m: 1.0 for m in MODS},
                  rng=jax.random.PRNGKey(4), targets=tgt,
                  uni_loss=True, sample=False, match_mult=0.0,
                  train_particles=1, flt_particles=1)
    # NOTE: with a missing modality the reference's unimodal forward for
    # the absent modality encodes NaN inputs (mask 0) — fused handles
    # this by the same zero-mask row.
    loss_ref, _ = model.step(params, state, sub, mask, fused=False,
                             **common)
    loss_fused, _ = model.step(params, state, sub, mask, fused=True,
                               **common)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=2e-4)


def test_fused_grads_match_map(setup):
    model, params, state, inputs, mask = setup
    rec_mults = {m: 1.0 for m in MODS}

    def loss_fn(p, fused):
        loss, _ = model.step(
            p, state, inputs, mask, 1.0, rec_mults,
            jax.random.PRNGKey(5), targets=inputs, sample=False,
            match_mult=0.0, train_particles=1, fused=fused)
        return loss

    g_ref = jax.grad(lambda p: loss_fn(p, False))(params)
    g_fused = jax.grad(lambda p: loss_fn(p, True))(params)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    fused_leaves = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-5)


def test_fused_sampling_runs_and_is_finite(setup):
    model, params, state, inputs, mask = setup
    loss, _ = model.step(params, state, inputs, mask, 1.0,
                         {m: 1.0 for m in MODS}, jax.random.PRNGKey(6),
                         targets=inputs, fused=True,
                         train_particles=5, match_particles=5)
    assert np.isfinite(float(loss))


def test_fused_bernoulli_logit_path_matches_unfused():
    """The fused objective's logit-space BCE (variant-sliced, no
    materialized probs) must match the unfused probs-space composition
    on a Bernoulli image modality."""
    from multimodal_dmm_tpu.models import codecs
    mods = ["video", "label"]
    model = MultiDMM(
        mods, [(3, 8, 8), 4], dists=["Bernoulli", "Categorical"],
        encoders={"video": codecs.image_encoder_codec(6, img_size=8)},
        decoders={"video": codecs.image_decoder_codec(6, img_size=8)},
        z_dim=6, h_dim=8)
    params, state = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(7)
    x_vid = (rng.rand(T, B, 3, 8, 8) > 0.5).astype(np.float32)
    x_vid[rng.rand(T, B) < 0.3] = np.nan
    x_lab = rng.randint(0, 4, (T, B, 1)).astype(np.float32)
    x_lab[rng.rand(T, B, 1) < 0.3] = np.nan
    inputs = {"video": jnp.array(x_vid), "label": jnp.array(x_lab)}
    mask = jnp.ones((T, B, 1))
    common = dict(kld_mult=0.5, rec_mults={"video": 1.0, "label": 2.0},
                  rng=jax.random.PRNGKey(2), targets=inputs,
                  uni_loss=True, sample=False, match_mult=0.0,
                  train_particles=1, flt_particles=1, train=False)

    def loss_of(p, fused):
        loss, _ = model.step(p, state, inputs, mask, fused=fused,
                             **common)
        return loss

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss_of(p, False))(params)
    l_fused, g_fused = jax.value_and_grad(
        lambda p: loss_of(p, True))(params)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("sample", [True, False])
def test_merged_two_mode_scan_matches_unmerged(setup, sample):
    """merge_mode_scans=True (both modes' filtering passes in one scan)
    must reproduce the unmerged fused objective — same RNG stream —
    in loss AND gradients."""
    model, params, state, inputs, mask = setup
    rec_mults = {"m0": 0.5, "m1": 0.2, "m2": 1.0}
    common = dict(targets=inputs, uni_loss=True, sample=sample,
                  match_mult=0.01, train_particles=7, flt_particles=1)

    def loss_of(p, merge):
        loss, _ = model.step(p, state, inputs, mask, 0.7, rec_mults,
                             jax.random.PRNGKey(9), fused=True,
                             merge_mode_scans=merge, **common)
        return loss

    l0, g0 = jax.value_and_grad(lambda p: loss_of(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_of(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("sample,flt_particles",
                         [(True, 1), (False, 1), (True, 3)])
def test_ragged_two_mode_scan_matches_unmerged(setup, sample,
                                               flt_particles):
    """ragged_mode_scans=True (both modes' filtering passes in one
    ragged-K scan, z_filter_grouped) must reproduce the unmerged fused
    objective — same RNG stream — in loss AND gradients, including at
    flt_particles not equal to 1 or train_particles (which the older
    merge_mode_scans path cannot represent)."""
    model, params, state, inputs, mask = setup
    rec_mults = {"m0": 0.5, "m1": 0.2, "m2": 1.0}
    common = dict(targets=inputs, uni_loss=True, sample=sample,
                  match_mult=0.01, train_particles=7,
                  flt_particles=flt_particles)

    def loss_of(p, ragged):
        loss, _ = model.step(p, state, inputs, mask, 0.7, rec_mults,
                             jax.random.PRNGKey(9), fused=True,
                             ragged_mode_scans=ragged, **common)
        return loss

    l0, g0 = jax.value_and_grad(lambda p: loss_of(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_of(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)
