"""bf16 codec compute stays numerically close to the f32 path."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_dmm_tpu.models import codecs


def test_image_codec_bf16_close_to_f32():
    key = jax.random.PRNGKey(0)
    enc32 = codecs.image_encoder_codec(64, gauss_out=True)
    enc16 = codecs.image_encoder_codec(64, gauss_out=True,
                                       compute_dtype=jnp.bfloat16)
    params, state = enc32.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 64, 64))
    (m32, s32), _ = enc32.apply(params, state, x, train=False)
    (m16, s16), _ = enc16.apply(params, state, x, train=False)
    assert m16.dtype == jnp.float32  # f32 accumulation + heads
    scale = np.abs(np.asarray(m32)).mean() + 1e-3
    err = np.abs(np.asarray(m16) - np.asarray(m32)).mean()
    assert err / scale < 0.05, (err, scale)


def test_image_decoder_bf16_close_to_f32():
    key = jax.random.PRNGKey(2)
    dec32 = codecs.image_decoder_codec(64)
    dec16 = codecs.image_decoder_codec(64,
                                       compute_dtype=jnp.bfloat16)
    params, state = dec32.init(key)
    z = jax.random.normal(jax.random.PRNGKey(3), (6, 64))
    (p32,), _ = dec32.apply(params, state, z, train=False)
    (p16,), _ = dec16.apply(params, state, z, train=False)
    assert p16.dtype == jnp.float32
    err = np.abs(np.asarray(p16) - np.asarray(p32)).mean()
    assert err < 0.02, err  # probs in [0,1]
