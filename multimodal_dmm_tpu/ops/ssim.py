"""Differentiable SSIM (structural similarity) in JAX.

Equivalent of /root/reference/utils.py:77-212 (adapted there from
pytorch-msssim): separable 1-D Gaussian blur with *valid* padding, the
fused 5-channel blur trick (X, Y, X², Y², XY in one depthwise conv), per
image mean over C·H·W. Defaults match: win_size=11, win_sigma=1.5,
data_range=1.0, K1=0.01, K2=0.03.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel_1d(size, sigma):
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return jnp.asarray(g / g.sum())


def _blur(x, win):
    """Depthwise valid-padding separable blur. x: (N, C, H, W)."""
    c = x.shape[1]
    k = win.shape[0]
    # Horizontal then vertical 1-D passes, depthwise (feature groups).
    kern_h = jnp.tile(win.reshape(1, 1, 1, k), (c, 1, 1, 1))  # OIHW
    out = jax.lax.conv_general_dilated(
        x, kern_h, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c)
    kern_v = jnp.tile(win.reshape(1, 1, k, 1), (c, 1, 1, 1))
    out = jax.lax.conv_general_dilated(
        out, kern_v, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c)
    return out


def eval_ssim(x, y, win_size=11, win_sigma=1.5, data_range=1.0,
              size_average=False, full=False):
    """SSIM per image of two (N, C, H, W) batches."""
    if x.ndim != 4 or y.ndim != 4:
        raise ValueError("Input images must be 4-d tensors.")
    if x.shape != y.shape:
        raise ValueError("Input images must have the same dimensions.")
    if win_size % 2 != 1:
        raise ValueError("Window size must be odd.")

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gauss_kernel_1d(win_size, win_sigma)

    cat = jnp.concatenate([x, y, x * x, y * y, x * y], axis=1)
    out = _blur(cat, win)
    c = x.shape[1]
    mu1, mu2, s1_sq, s2_sq, s12 = (
        out[:, i * c:(i + 1) * c] for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1_sq = s1_sq - mu1_sq
    s2_sq = s2_sq - mu2_sq
    s12 = s12 - mu1_mu2

    cs_map = (2 * s12 + c2) / (s1_sq + s2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    ssim_val = ssim_map.mean(axis=(1, 2, 3))
    cs = cs_map.mean(axis=(1, 2, 3))
    if size_average:
        ssim_val = ssim_val.mean()
        cs = cs.mean()
    if full:
        return ssim_val, cs
    return ssim_val
