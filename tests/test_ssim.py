"""SSIM parity against a torch transcription of the reference's
pytorch-msssim-derived implementation."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_dmm_tpu.ops.ssim import eval_ssim


def torch_ssim(X, Y, win_size=11, win_sigma=1.5, data_range=1.0):
    """Transcription of /root/reference/utils.py:77-162."""
    coords = torch.arange(win_size, dtype=torch.float) - win_size // 2
    g = torch.exp(-(coords ** 2) / (2 * win_sigma ** 2))
    g = (g / g.sum()).unsqueeze(0).unsqueeze(0)
    win = g.repeat(X.shape[1], 1, 1, 1)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    cat = torch.cat([X, Y, X * X, Y * Y, X * Y], dim=1)
    w5 = win.repeat(5, 1, 1, 1)
    C = cat.shape[1]
    out = F.conv2d(cat, w5.unsqueeze(2) if False else w5.reshape(
        C, 1, 1, win_size), stride=1, padding=0, groups=C)
    out = out.transpose(2, 3).contiguous()
    out = F.conv2d(out, w5.reshape(C, 1, 1, win_size), stride=1,
                   padding=0, groups=C)
    out = out.transpose(2, 3).contiguous()
    ch = X.shape[1]
    mu1, mu2, s1, s2, s12 = (out[:, i * ch:(i + 1) * ch]
                             for i in range(5))
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = s1 - mu1_sq
    s2 = s2 - mu2_sq
    s12 = s12 - mu12
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    smap = ((2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)) * cs
    return smap.mean(-1).mean(-1).mean(-1)


def test_ssim_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(6, 3, 32, 32).astype(np.float32)
    y = np.clip(x + rng.randn(6, 3, 32, 32).astype(np.float32) * 0.1,
                0, 1)
    got = np.asarray(eval_ssim(jnp.array(x), jnp.array(y)))
    want = torch_ssim(torch.tensor(x), torch.tensor(y)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_ssim_identity_is_one():
    rng = np.random.RandomState(1)
    x = rng.rand(3, 1, 24, 24).astype(np.float32)
    got = np.asarray(eval_ssim(jnp.array(x), jnp.array(x)))
    assert np.all(got > 0.99)


def test_ssim_degrades_with_noise():
    rng = np.random.RandomState(2)
    x = rng.rand(4, 3, 32, 32).astype(np.float32)
    y1 = np.clip(x + 0.05 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    y2 = np.clip(x + 0.5 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    s1 = np.asarray(eval_ssim(jnp.array(x), jnp.array(y1))).mean()
    s2 = np.asarray(eval_ssim(jnp.array(x), jnp.array(y2))).mean()
    assert s1 > s2
