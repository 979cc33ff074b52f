"""Parity tests of the functional NN core against torch layer semantics.

These check *math* parity (same weights → same outputs), which is what
makes training curves comparable with the reference. Weights are copied
from freshly-constructed torch modules into our param pytrees.
"""

import numpy as np
import jax.numpy as jnp
import jax
import torch
import torch.nn as nn

from multimodal_dmm_tpu.models import nn as tnn


def test_linear_matches_torch():
    torch.manual_seed(0)
    lin = nn.Linear(7, 5)
    p = {"w": jnp.array(lin.weight.detach().numpy().T),
         "b": jnp.array(lin.bias.detach().numpy())}
    x = np.random.RandomState(0).randn(3, 7).astype(np.float32)
    got = tnn.linear_apply(p, jnp.array(x))
    want = lin(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(1)
    in_dim, h_dim, layers = 6, 8, 2
    gru = nn.GRU(in_dim, h_dim, layers)
    p = {"layers": []}
    for l in range(layers):
        p["layers"].append({
            "w_ih": jnp.array(getattr(gru, f"weight_ih_l{l}").detach().numpy().T),
            "w_hh": jnp.array(getattr(gru, f"weight_hh_l{l}").detach().numpy().T),
            "b_ih": jnp.array(getattr(gru, f"bias_ih_l{l}").detach().numpy()),
            "b_hh": jnp.array(getattr(gru, f"bias_hh_l{l}").detach().numpy()),
        })
    rng = np.random.RandomState(2)
    T, B = 5, 3
    x = rng.randn(T, B, in_dim).astype(np.float32)
    h0 = rng.randn(layers, B, h_dim).astype(np.float32)

    out_t, h_t = gru(torch.tensor(x), torch.tensor(h0))

    h = jnp.array(h0)
    outs = []
    for t in range(T):
        h = tnn.gru_step(p, jnp.array(x[t]), h)
        outs.append(h[-1])
    got_out = np.stack([np.asarray(o) for o in outs])
    np.testing.assert_allclose(got_out, out_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conv2d_matches_torch():
    torch.manual_seed(2)
    conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
    # torch OIHW → our HWIO
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    p = {"w": jnp.array(w), "b": jnp.array(conv.bias.detach().numpy())}
    x = np.random.RandomState(3).randn(2, 3, 16, 16).astype(np.float32)
    got = tnn.conv2d_apply(p, jnp.array(x.transpose(0, 2, 3, 1)),
                           stride=2, padding=1)
    want = conv(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_deconv2d_matches_torch():
    torch.manual_seed(3)
    deconv = nn.ConvTranspose2d(8, 4, 4, stride=2, padding=1)
    # torch IOHW → our pre-flipped HWIO (format 2): spatial-flip + (h,w,i,o)
    w = deconv.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
    p = {"w": jnp.array(w), "b": jnp.array(deconv.bias.detach().numpy())}
    x = np.random.RandomState(4).randn(2, 8, 8, 8).astype(np.float32)
    got = tnn.deconv2d_apply(p, jnp.array(x.transpose(0, 2, 3, 1)),
                             stride=2, padding=1)
    want = deconv(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape  # (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_deconv1d_matches_torch():
    torch.manual_seed(4)
    deconv = nn.ConvTranspose1d(6, 4, 3, stride=2, padding=1)
    # torch IOW → our pre-flipped WIO (format 2)
    w = deconv.weight.detach().numpy().transpose(2, 0, 1)[::-1]
    p = {"w": jnp.array(w), "b": jnp.array(deconv.bias.detach().numpy())}
    x = np.random.RandomState(5).randn(2, 6, 11).astype(np.float32)
    got = tnn.deconv1d_apply(p, jnp.array(x.transpose(0, 2, 1)),
                             stride=2, padding=1)
    want = deconv(torch.tensor(x)).detach().numpy().transpose(0, 2, 1)
    assert got.shape == want.shape  # L_out = (11-1)*2 - 2 + 3 = 21
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_conv1d_matches_torch():
    torch.manual_seed(5)
    conv = nn.Conv1d(10, 4, 3, stride=2, padding=1)
    w = conv.weight.detach().numpy().transpose(2, 1, 0)  # O I W → W I O
    p = {"w": jnp.array(w), "b": jnp.array(conv.bias.detach().numpy())}
    x = np.random.RandomState(6).randn(2, 10, 1281).astype(np.float32)
    got = tnn.conv1d_apply(p, jnp.array(x.transpose(0, 2, 1)),
                           stride=2, padding=1)
    want = conv(torch.tensor(x)).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_batchnorm_matches_torch_train_and_eval():
    torch.manual_seed(6)
    bn = nn.BatchNorm2d(5)
    p, state = tnn.batchnorm_init(5)
    x = np.random.RandomState(7).randn(4, 5, 6, 6).astype(np.float32)

    bn.train()
    want = bn(torch.tensor(x)).detach().numpy()
    got, new_state = tnn.batchnorm_apply(
        p, state, jnp.array(x.transpose(0, 2, 3, 1)), train=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-3, atol=1e-5)

    bn.eval()
    want_e = bn(torch.tensor(x)).detach().numpy()
    got_e, _ = tnn.batchnorm_apply(
        p, new_state, jnp.array(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got_e).transpose(0, 3, 1, 2),
                               want_e, rtol=1e-3, atol=1e-4)


def test_gaussian_mlp_shapes_and_min_std():
    key = jax.random.PRNGKey(0)
    p = tnn.gaussian_mlp_init(key, 4, 3, 16)
    mean, std = tnn.gaussian_mlp_apply(p, jnp.zeros((10, 4)), min_std=1e-3)
    assert mean.shape == (10, 3) and std.shape == (10, 3)
    assert np.all(np.asarray(std) >= 1e-3)


def test_gtf_gate_interpolation():
    """GTF mean must interpolate between linear and nonlinear paths."""
    key = jax.random.PRNGKey(1)
    p = tnn.gtf_init(key, 5, 20)
    z = jax.random.normal(jax.random.PRNGKey(2), (7, 5))
    mean, std = tnn.gtf_apply(p, z, min_std=1e-3)
    assert mean.shape == (7, 5) and std.shape == (7, 5)
    assert np.all(np.asarray(std) >= 1e-3)
    # Manual recomputation
    import jax.nn as jnn
    gate = jnn.sigmoid(tnn.linear_apply(
        p["gate_2"], jnn.relu(tnn.linear_apply(p["gate_1"], z))))
    z_lin = tnn.linear_apply(p["z_lin"], z)
    z_non = tnn.linear_apply(p["nonlin_2"],
                             jnn.relu(tnn.linear_apply(p["nonlin_1"], z)))
    want = (1 - gate) * z_lin + gate * z_non
    np.testing.assert_allclose(np.asarray(mean), np.asarray(want), rtol=1e-5)


def test_gtf_packed_matches_unpacked():
    """gtf_apply_packed(gtf_pack(p), z) must equal gtf_apply(p, z) —
    the packed form only re-groups the same contractions."""
    key = jax.random.PRNGKey(3)
    p = tnn.gtf_init(key, 5, 20)
    for shape in [(7, 5), (3, 7, 5)]:
        z = jax.random.normal(jax.random.PRNGKey(4), shape)
        mean, std = tnn.gtf_apply(p, z, min_std=1e-3)
        pk = tnn.gtf_pack(p)
        pmean, pstd = tnn.gtf_apply_packed(pk, z, min_std=1e-3)
        np.testing.assert_allclose(np.asarray(pmean), np.asarray(mean),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pstd), np.asarray(std),
                                   rtol=1e-6, atol=1e-6)


def test_gtf_packed_bf16_close_to_f32():
    """bf16-packed GTF tracks the f32 GTF within bf16 tolerance."""
    key = jax.random.PRNGKey(5)
    p = tnn.gtf_init(key, 8, 16)
    z = jax.random.normal(jax.random.PRNGKey(6), (11, 8))
    mean, std = tnn.gtf_apply(p, z, min_std=1e-3)
    pk = tnn.gtf_pack(p, compute_dtype=jnp.bfloat16)
    pmean, pstd = tnn.gtf_apply_packed(pk, z, min_std=1e-3)
    assert pmean.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(pmean), np.asarray(mean),
                               rtol=0.05, atol=0.05)
