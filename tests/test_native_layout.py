"""Codec-native batch layout: the device loader stores conv-codec
modalities channels-last (one permutation at upload) and the fused step
consumes them transpose-free (models/dmm.py native_mods). Pure layout —
the objective must match the edge-layout step to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_dmm_tpu.models import codecs
from multimodal_dmm_tpu.models.dmm import MultiDMM

T, B = 4, 3


def _image_model():
    model = MultiDMM(
        ["video", "label"], [(3, 8, 8), 4],
        dists=["Bernoulli", "Categorical"],
        encoders={"video": codecs.image_encoder_codec(6, img_size=8)},
        decoders={"video": codecs.image_decoder_codec(6, img_size=8)},
        z_dim=6, h_dim=8)
    params, state = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(7)
    x_vid = (rng.rand(T, B, 3, 8, 8) > 0.5).astype(np.float32)
    x_vid[rng.rand(T, B) < 0.3] = np.nan
    x_lab = rng.randint(0, 4, (T, B, 1)).astype(np.float32)
    inputs = {"video": jnp.array(x_vid), "label": jnp.array(x_lab)}
    mask = jnp.ones((T, B, 1))
    return model, params, state, inputs, mask


def test_native_input_perms_eligibility():
    model, *_ = _image_model()
    assert model.native_input_perms() == {"video": (1, 2, 0)}
    # MLP-codec modalities (spirals) have no native layout.
    mlp = MultiDMM(["x", "y"], [2, 2], z_dim=4, h_dim=4)
    assert mlp.native_input_perms() == {}


@pytest.mark.parametrize("sample", [False, True])
def test_native_step_matches_edge(sample):
    """Same RNG stream, same math — the native-layout step must equal
    the edge-layout step in loss AND parameter gradients (reduction
    order over permuted elements is the only difference)."""
    model, params, state, inputs, mask = _image_model()
    native_inputs = {
        "video": jnp.transpose(inputs["video"], (0, 1, 3, 4, 2)),
        "label": inputs["label"],
    }
    common = dict(kld_mult=0.5, rec_mults={"video": 1.0, "label": 2.0},
                  rng=jax.random.PRNGKey(2), uni_loss=True,
                  sample=sample, match_mult=0.01, train_particles=3,
                  flt_particles=1, train=True)

    def loss_edge(p):
        loss, _ = model.step(p, state, inputs, mask, targets=inputs,
                             **common)
        return loss

    def loss_native(p):
        loss, _ = model.step(p, state, native_inputs, mask,
                             targets=native_inputs,
                             native_mods=("video",), **common)
        return loss

    l_e, g_e = jax.value_and_grad(loss_edge)(params)
    l_n, g_n = jax.value_and_grad(loss_native)(params)
    np.testing.assert_allclose(float(l_n), float(l_e), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_e),
                    jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_native_requires_fused():
    model, params, state, inputs, mask = _image_model()
    native_inputs = {
        "video": jnp.transpose(inputs["video"], (0, 1, 3, 4, 2)),
        "label": inputs["label"],
    }
    with pytest.raises(ValueError):
        model.step(params, state, native_inputs, mask, 1.0,
                   {"video": 1.0, "label": 1.0}, jax.random.PRNGKey(0),
                   targets=native_inputs, fused=False,
                   native_mods=("video",))


def test_device_loader_native_storage():
    """Native-perm storage must yield exactly the edge batches with the
    trailing dims permuted — same shuffle, same burst windows."""
    from multimodal_dmm_tpu.training.device_loader import DeviceTrainData

    rng = np.random.RandomState(3)
    items = []
    for i in range(5):
        length = int(rng.randint(3, 7))
        items.append({
            "length": length,
            "video": rng.rand(length, 3, 8, 8).astype(np.float32),
            "label": rng.randint(0, 4, (length, 1)).astype(np.float32),
        })

    class _DS:
        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    mods = ["video", "label"]
    edge = DeviceTrainData(_DS(), mods, batch_size=2, burst_frac=0.2)
    nat = DeviceTrainData(_DS(), mods, batch_size=2, burst_frac=0.2,
                          native_perms={"video": (1, 2, 0)})
    assert nat.data["video"].shape == edge.data["video"].shape[:2] + (
        8, 8, 3)
    for (ie, te, me, le), (iv, tv, mv, lv) in zip(edge.epoch(11),
                                                  nat.epoch(11)):
        assert le == lv
        np.testing.assert_array_equal(np.asarray(me), np.asarray(mv))
        np.testing.assert_array_equal(
            np.asarray(iv["video"]),
            np.asarray(jnp.transpose(ie["video"], (0, 1, 3, 4, 2))))
        np.testing.assert_array_equal(np.asarray(iv["label"]),
                                      np.asarray(ie["label"]))
        np.testing.assert_array_equal(
            np.asarray(tv["video"]),
            np.asarray(jnp.transpose(te["video"], (0, 1, 3, 4, 2))))
