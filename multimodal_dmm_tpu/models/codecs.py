"""Modality codecs: conv encoder/decoder stacks for images and audio.

Functional equivalents of /root/reference/models/common.py:114-290
(ImageEncoder/ImageDecoder, AudioEncoder/AudioDecoder) with BatchNorm state
threaded explicitly. Data contract at the codec boundary matches the
reference: images are channel-first ``(N, C, H, W)`` and audio slices are
``(N, 2·n_frames, n_freqs)``; internally everything runs channels-last
(NHWC / NWC), the layout XLA tiles onto the TPU's convolution units.

A *codec* here is a dict with "init" and "apply" callables plus metadata;
models treat encoders/decoders uniformly via this interface, whether they
are default MLP heads or conv stacks.
"""

import jax
import jax.numpy as jnp

from . import nn as tnn


# ---------------------------------------------------------------------------
# Image encoder / decoder (common.py:114-175)
# ---------------------------------------------------------------------------

def image_encoder_init(key, z_dim, gauss_out=True, img_size=64,
                       n_channels=3, n_kernels=64, n_layers=3):
    feat_size = img_size // 2 ** n_layers
    feat_dim = feat_size ** 2 * n_kernels
    chans = [n_channels] + [n_kernels // 2 ** (n_layers - 1 - l)
                            for l in range(n_layers)]
    keys = jax.random.split(key, n_layers + 2)
    convs, bns, bn_states = [], [], []
    for l in range(n_layers):
        convs.append(tnn.conv2d_init(keys[l], chans[l], chans[l + 1],
                                     ksize=3, xavier=True))
        if l < n_layers - 1:  # last conv layer has no BN/ReLU
            bn_p, bn_s = tnn.batchnorm_init(chans[l + 1])
            bns.append(bn_p)
            bn_states.append(bn_s)
    params = {"convs": convs, "bns": bns}
    state = {"bns": bn_states}
    if gauss_out:
        params["to_mean"] = tnn.linear_init(keys[-2], feat_dim, z_dim,
                                            xavier=True)
        params["to_std"] = tnn.linear_init(keys[-1], feat_dim, z_dim,
                                           xavier=True)
    meta = {"gauss_out": gauss_out, "feat_dim": feat_dim,
            "n_layers": n_layers}
    return params, state, meta


def image_encoder_apply(params, state, meta, x, train):
    """x: (N, C, H, W) → (mean, std) or raw feats (N, feat_dim).

    ``meta["native_in"]`` means x is ALREADY channels-last (N, H, W, C)
    — the device loader stores training batches in the conv-native
    layout so the per-step edge transpose (an HBM round-trip of the
    full video tensor) disappears from the train step.
    """
    dt = meta.get("dt")
    h = x if meta.get("native_in") \
        else jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
    new_bns = []
    n_layers = meta["n_layers"]
    for l in range(n_layers):
        h = tnn.conv2d_apply(params["convs"][l], h, stride=2, padding=1,
                             compute_dtype=dt)
        if l < n_layers - 1:
            h, bn_s = tnn.batchnorm_apply(params["bns"][l],
                                          state["bns"][l], h, train)
            new_bns.append(bn_s)
            h = jax.nn.relu(h)
    new_state = {"bns": new_bns}
    # Flatten in torch NCHW order for weight-layout parity with reference.
    feats = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    if not meta["gauss_out"]:
        return feats, new_state
    z_mean = tnn.linear_apply(params["to_mean"], feats)
    z_std = jax.nn.softplus(tnn.linear_apply(params["to_std"], feats))
    return (z_mean, z_std), new_state


def image_decoder_init(key, z_dim, img_size=64, n_channels=3,
                       n_kernels=64, n_layers=3):
    feat_size = img_size // 2 ** n_layers
    feat_dim = feat_size ** 2 * n_kernels
    chans = [n_kernels // 2 ** l for l in range(n_layers)] + [n_channels]
    keys = jax.random.split(key, n_layers + 1)
    params = {"z_to_feat": tnn.linear_init(keys[0], z_dim, feat_dim,
                                           xavier=True)}
    deconvs, bns, bn_states = [], [], []
    for l in range(n_layers):
        deconvs.append(tnn.deconv2d_init(keys[l + 1], chans[l], chans[l + 1],
                                         ksize=4, xavier=True))
        if l < n_layers - 1:
            bn_p, bn_s = tnn.batchnorm_init(chans[l + 1])
            bns.append(bn_p)
            bn_states.append(bn_s)
    params["deconvs"] = deconvs
    params["bns"] = bns
    state = {"bns": bn_states}
    meta = {"feat_shape": (n_kernels, feat_size, feat_size),
            "n_layers": n_layers}
    return params, state, meta


def image_decoder_apply(params, state, meta, z, train):
    """z: (N, z_dim) → sigmoid probs (N, C, H, W) as a 1-tuple.

    ``meta["logits"]`` skips the final sigmoid and returns the
    pre-sigmoid activations instead — the training objective consumes
    these via the fused log-sigmoid BCE (ops/losses.py
    nll_bernoulli_logits), avoiding a materialized probability tensor.
    """
    n_k, fs, _ = meta["feat_shape"]
    feats = jax.nn.relu(tnn.linear_apply(params["z_to_feat"], z))
    h = feats.reshape(-1, n_k, fs, fs)          # torch NCHW layout
    h = jnp.transpose(h, (0, 2, 3, 1))          # → NHWC
    dt = meta.get("dt")
    new_bns = []
    n_layers = meta["n_layers"]
    for l in range(n_layers):
        h = tnn.deconv2d_apply(params["deconvs"][l], h, stride=2,
                               padding=1, compute_dtype=dt)
        if l < n_layers - 1:
            h, bn_s = tnn.batchnorm_apply(params["bns"][l],
                                          state["bns"][l], h, train)
            new_bns.append(bn_s)
            h = jax.nn.relu(h)
    if not meta.get("logits"):
        h = jax.nn.sigmoid(h)
    if not meta.get("raw_layout"):
        h = jnp.transpose(h, (0, 3, 1, 2))  # → NCHW
    return (h,), {"bns": new_bns}


# ---------------------------------------------------------------------------
# Audio encoder / decoder (common.py:221-290)
# ---------------------------------------------------------------------------

def audio_encoder_init(key, z_dim, gauss_out=True, n_freqs=1281,
                       n_frames=5, n_kernels=16, n_layers=3):
    feat_size = (n_freqs - 1) // 2 ** n_layers + 1
    feat_dim = feat_size * n_kernels
    n_channels = n_frames * 2
    chans = [n_channels] + [n_kernels // 2 ** (n_layers - 1 - l)
                            for l in range(n_layers)]
    keys = jax.random.split(key, n_layers + 2)
    convs, bns, bn_states = [], [], []
    for l in range(n_layers):
        convs.append(tnn.conv1d_init(keys[l], chans[l], chans[l + 1],
                                     ksize=3, xavier=True))
        if l < n_layers - 1:
            bn_p, bn_s = tnn.batchnorm_init(chans[l + 1])
            bns.append(bn_p)
            bn_states.append(bn_s)
    params = {"convs": convs, "bns": bns}
    state = {"bns": bn_states}
    if gauss_out:
        params["to_mean"] = tnn.linear_init(keys[-2], feat_dim, z_dim,
                                            xavier=True)
        params["to_std"] = tnn.linear_init(keys[-1], feat_dim, z_dim,
                                           xavier=True)
    meta = {"gauss_out": gauss_out, "feat_dim": feat_dim,
            "n_layers": n_layers}
    return params, state, meta


def audio_encoder_apply(params, state, meta, x, train):
    """x: (N, 2·n_frames, n_freqs) → (mean, std) or feats.
    ``meta["native_in"]``: x already (N, n_freqs, 2·n_frames)."""
    h = x if meta.get("native_in") \
        else jnp.transpose(x, (0, 2, 1))  # NCW → NWC
    dt = meta.get("dt")
    new_bns = []
    n_layers = meta["n_layers"]
    for l in range(n_layers):
        h = tnn.conv1d_apply(params["convs"][l], h, stride=2, padding=1,
                             compute_dtype=dt)
        if l < n_layers - 1:
            h, bn_s = tnn.batchnorm_apply(params["bns"][l],
                                          state["bns"][l], h, train)
            new_bns.append(bn_s)
            h = jax.nn.relu(h)
    new_state = {"bns": new_bns}
    feats = jnp.transpose(h, (0, 2, 1)).reshape(h.shape[0], -1)
    if not meta["gauss_out"]:
        return feats, new_state
    z_mean = tnn.linear_apply(params["to_mean"], feats)
    z_std = jax.nn.softplus(tnn.linear_apply(params["to_std"], feats))
    return (z_mean, z_std), new_state


def audio_decoder_init(key, z_dim, n_freqs=1281, n_frames=5,
                       n_kernels=16, n_layers=3):
    feat_size = (n_freqs - 1) // 2 ** n_layers + 1
    feat_dim = feat_size * n_kernels
    n_channels = n_frames * 2
    chans = [n_kernels // 2 ** l for l in range(n_layers)] + [n_channels]
    keys = jax.random.split(key, n_layers + 1)
    params = {"z_to_feat": tnn.linear_init(keys[0], z_dim, feat_dim,
                                           xavier=True)}
    deconvs, bns, bn_states = [], [], []
    for l in range(n_layers):
        deconvs.append(tnn.deconv1d_init(keys[l + 1], chans[l], chans[l + 1],
                                         ksize=3, xavier=True))
        if l < n_layers - 1:
            bn_p, bn_s = tnn.batchnorm_init(chans[l + 1])
            bns.append(bn_p)
            bn_states.append(bn_s)
    params["deconvs"] = deconvs
    params["bns"] = bns
    state = {"bns": bn_states}
    meta = {"feat_shape": (n_kernels, feat_size), "n_layers": n_layers}
    return params, state, meta


def audio_decoder_apply(params, state, meta, z, train):
    n_k, fs = meta["feat_shape"]
    feats = jax.nn.relu(tnn.linear_apply(params["z_to_feat"], z))
    h = feats.reshape(-1, n_k, fs)
    h = jnp.transpose(h, (0, 2, 1))  # → NWC
    dt = meta.get("dt")
    new_bns = []
    n_layers = meta["n_layers"]
    for l in range(n_layers):
        h = tnn.deconv1d_apply(params["deconvs"][l], h, stride=2,
                               padding=1, compute_dtype=dt)
        if l < n_layers - 1:
            h, bn_s = tnn.batchnorm_apply(params["bns"][l],
                                          state["bns"][l], h, train)
            new_bns.append(bn_s)
            h = jax.nn.relu(h)
    if not meta.get("logits"):
        h = jax.nn.sigmoid(h)
    if not meta.get("raw_layout"):
        h = jnp.transpose(h, (0, 2, 1))  # → NCW
    return (h,), {"bns": new_bns}


# ---------------------------------------------------------------------------
# Codec wrappers: uniform init/apply interface over the conv stacks
# ---------------------------------------------------------------------------

from .base import Codec  # noqa: E402


def image_encoder_codec(z_dim, gauss_out=True, img_size=64, n_channels=3,
                        n_kernels=64, n_layers=3, compute_dtype=None):
    """ImageEncoder as a Codec; `.feat_dim` exposed for DKS feature mode
    (reference: models/dks.py:101-106 reads enc.feat_dim)."""
    feat_size = img_size // 2 ** n_layers
    feat_dim = feat_size ** 2 * n_kernels

    def init(key):
        p, s, meta = image_encoder_init(key, z_dim, gauss_out, img_size,
                                        n_channels, n_kernels, n_layers)
        init.meta = meta
        return p, s

    def _meta(native_in):
        return {"gauss_out": gauss_out, "feat_dim": feat_dim,
                "n_layers": n_layers, "dt": compute_dtype,
                "native_in": native_in}

    def apply(params, state, x, train):
        return image_encoder_apply(params, state, _meta(False), x, train)

    def apply_native(params, state, x, train):
        """x already channels-last (N, H, W, C) — no edge transpose
        (see image_encoder_apply native_in)."""
        return image_encoder_apply(params, state, _meta(True), x, train)

    codec = Codec(init, apply)
    codec.feat_dim = feat_dim
    codec.apply_native = apply_native
    # Edge layout (C, H, W) → native (H, W, C) on the trailing dims.
    codec.raw_perm = (1, 2, 0)
    return codec


def image_decoder_codec(z_dim, img_size=64, n_channels=3, n_kernels=64,
                        n_layers=3, compute_dtype=None):
    feat_size = img_size // 2 ** n_layers

    def init(key):
        p, s, _ = image_decoder_init(key, z_dim, img_size, n_channels,
                                     n_kernels, n_layers)
        return p, s

    def apply(params, state, z, train):
        meta = {"feat_shape": (n_kernels, feat_size, feat_size),
                "n_layers": n_layers, "dt": compute_dtype}
        return image_decoder_apply(params, state, meta, z, train)

    def apply_logits(params, state, z, train):
        """Pre-sigmoid activations in the decoder's NATIVE NHWC layout
        (no edge transpose): the training loss is layout-agnostic
        elementwise-reduce, so the caller transposes the (V-free)
        targets via ``raw_perm`` instead of copying the much larger
        stacked-variant activations to NCHW."""
        meta = {"feat_shape": (n_kernels, feat_size, feat_size),
                "n_layers": n_layers, "dt": compute_dtype,
                "logits": True, "raw_layout": True}
        return image_decoder_apply(params, state, meta, z, train)

    codec = Codec(init, apply)
    codec.apply_logits = apply_logits
    # Edge layout (C, H, W) → native (H, W, C) on the trailing dims.
    codec.raw_perm = (1, 2, 0)
    return codec


def audio_encoder_codec(z_dim, gauss_out=True, n_freqs=1281, n_frames=5,
                        n_kernels=16, n_layers=3, compute_dtype=None):
    feat_size = (n_freqs - 1) // 2 ** n_layers + 1
    feat_dim = feat_size * n_kernels

    def init(key):
        p, s, _ = audio_encoder_init(key, z_dim, gauss_out, n_freqs,
                                     n_frames, n_kernels, n_layers)
        return p, s

    def _meta(native_in):
        return {"gauss_out": gauss_out, "feat_dim": feat_dim,
                "n_layers": n_layers, "dt": compute_dtype,
                "native_in": native_in}

    def apply(params, state, x, train):
        return audio_encoder_apply(params, state, _meta(False), x, train)

    def apply_native(params, state, x, train):
        """x already (N, n_freqs, 2·n_frames) — no edge transpose."""
        return audio_encoder_apply(params, state, _meta(True), x, train)

    codec = Codec(init, apply)
    codec.feat_dim = feat_dim
    codec.apply_native = apply_native
    # Edge layout (C, W) → native (W, C) on the trailing dims.
    codec.raw_perm = (1, 0)
    return codec


def audio_decoder_codec(z_dim, n_freqs=1281, n_frames=5, n_kernels=16,
                        n_layers=3, compute_dtype=None):
    feat_size = (n_freqs - 1) // 2 ** n_layers + 1

    def init(key):
        p, s, _ = audio_decoder_init(key, z_dim, n_freqs, n_frames,
                                     n_kernels, n_layers)
        return p, s

    def apply(params, state, z, train):
        meta = {"feat_shape": (n_kernels, feat_size),
                "n_layers": n_layers, "dt": compute_dtype}
        return audio_decoder_apply(params, state, meta, z, train)

    def apply_logits(params, state, z, train):
        """Pre-sigmoid activations in the native NWC layout (see the
        image codec's apply_logits)."""
        meta = {"feat_shape": (n_kernels, feat_size),
                "n_layers": n_layers, "dt": compute_dtype,
                "logits": True, "raw_layout": True}
        return audio_decoder_apply(params, state, meta, z, train)

    codec = Codec(init, apply)
    codec.apply_logits = apply_logits
    # Edge layout (C, W) → native (W, C) on the trailing dims.
    codec.raw_perm = (1, 0)
    return codec
