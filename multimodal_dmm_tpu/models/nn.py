"""Functional NN core: explicit param pytrees + pure apply functions.

This is the framework's equivalent of /root/reference/models/common.py, but
built the JAX way: every module is (init(key, ...) -> params,
apply(params, x) -> y), params are plain dicts, and everything composes
under jit / grad / vmap / scan.

Initialization matches torch defaults so training curves are comparable:

- ``linear``: torch nn.Linear default — weight and bias ~ U(-k, k) with
  k = 1/sqrt(fan_in) (torch kaiming_uniform(a=sqrt(5)) reduces to this).
- ``linear(..., xavier=True)``: xavier_uniform weight (torch default bias),
  used where the reference calls nn.init.xavier_uniform_
  (/root/reference/models/common.py:87,109,137-138,170).
- ``gru``: all weights/biases ~ U(-1/sqrt(h_dim), 1/sqrt(h_dim)).

Weights are stored (in_dim, out_dim) so application is ``x @ W + b`` — the
layout XLA tiles directly onto the MXU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def auto_unroll():
    """Default lax.scan unroll for the model-family time loops.

    The per-step bodies here are tiny (dozens of sub-microsecond ops),
    so on accelerators the loops are latency-bound and unrolling lets
    XLA fuse/overlap across timesteps (measured 19.2 -> 17.0 ms/step on
    the Weizmann train bench). On CPU keep the rolled loop: the test
    suite compiles hundreds of small programs and unrolling only bloats
    them. Pure scheduling hint — numerics-exact either way.
    """
    try:
        return 1 if jax.default_backend() == "cpu" else 25
    except Exception:
        return 1


# ---------------------------------------------------------------------------
# Linear / MLP heads
# ---------------------------------------------------------------------------

def linear_init(key, in_dim, out_dim, xavier=False, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    if xavier:
        bound = math.sqrt(6.0 / (in_dim + out_dim))
    else:
        bound = 1.0 / math.sqrt(in_dim)
    w = _uniform(kw, (in_dim, out_dim), bound, dtype)
    b = _uniform(kb, (out_dim,), 1.0 / math.sqrt(in_dim), dtype)
    return {"w": w, "b": b}


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


def embedding_init(key, num, dim, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return {"w": jax.random.normal(key, (num, dim), dtype)}


def embedding_apply(p, idx):
    return p["w"][idx]


def gaussian_mlp_init(key, in_dim, out_dim, h_dim, min_std=1e-3):
    """GaussianMLP (common.py:25-41): Linear+ReLU → (mean, softplus std)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "in_to_h": linear_init(k1, in_dim, h_dim),
        "h_to_mean": linear_init(k2, h_dim, out_dim),
        "h_to_std": linear_init(k3, h_dim, out_dim),
    }


def gaussian_mlp_apply(p, x, min_std=1e-3):
    h = jax.nn.relu(linear_apply(p["in_to_h"], x))
    mean = linear_apply(p["h_to_mean"], h)
    std = jax.nn.softplus(linear_apply(p["h_to_std"], h)) + min_std
    return mean, std


def categorical_mlp_init(key, in_dim, out_dim, h_dim):
    """CategoricalMLP (common.py:9-23): Linear+ReLU → softmax probs."""
    k1, k2 = jax.random.split(key)
    return {
        "in_to_h": linear_init(k1, in_dim, h_dim),
        "h_to_out": linear_init(k2, h_dim, out_dim),
    }


def categorical_mlp_apply(p, x):
    h = jax.nn.relu(linear_apply(p["in_to_h"], x))
    probs = jax.nn.softmax(linear_apply(p["h_to_out"], h), axis=-1)
    return (probs,)


def gtf_init(key, z_dim, h_dim, min_std=0.0):
    """GaussianGTF (common.py:43-68): GRU-like gated transition function."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "gate_1": linear_init(k1, z_dim, h_dim),
        "gate_2": linear_init(k2, h_dim, z_dim),
        "z_lin": linear_init(k3, z_dim, z_dim),
        "nonlin_1": linear_init(k4, z_dim, h_dim),
        "nonlin_2": linear_init(k5, h_dim, z_dim),
        "z_to_std": linear_init(k6, z_dim, z_dim),
    }


def gtf_apply(p, z, min_std=0.0, compute_dtype=None):
    """GTF transition; ``compute_dtype=bfloat16`` runs the six matmuls
    on the MXU in reduced precision (f32 params and activations)."""
    if compute_dtype is None:
        lin = linear_apply
    else:
        def lin(q, x):
            out = jnp.matmul(x.astype(compute_dtype),
                             q["w"].astype(compute_dtype))
            return out.astype(jnp.float32) + q["b"]
    gate = jax.nn.sigmoid(lin(
        p["gate_2"], jax.nn.relu(lin(p["gate_1"], z))))
    z_lin = lin(p["z_lin"], z)
    z_nonlin = lin(
        p["nonlin_2"], jax.nn.relu(lin(p["nonlin_1"], z)))
    z_std = jax.nn.softplus(lin(p["z_to_std"], z_nonlin)) \
        + min_std
    z_mean = (1 - gate) * z_lin + gate * z_nonlin
    return z_mean, z_std


def gtf_pack(p, compute_dtype=None):
    """Pre-pack GTF weights for the scan hot path.

    Concatenates the three z-side input projections (gate_1, nonlin_1,
    z_lin) into ONE matmul, stacks the two second-stage projections
    (gate_2, nonlin_2) into a batched matmul, and optionally casts the
    weights to the MXU compute dtype — all ONCE, outside the scan, so
    the scan body re-does neither the concatenation nor the casts every
    timestep. ``gtf_apply_packed(gtf_pack(p), z)`` computes exactly
    ``gtf_apply(p, z)`` (each output column block sees the identical
    contraction).
    """
    w1 = jnp.concatenate([p["gate_1"]["w"], p["nonlin_1"]["w"],
                          p["z_lin"]["w"]], axis=1)
    b1 = jnp.concatenate([p["gate_1"]["b"], p["nonlin_1"]["b"],
                          p["z_lin"]["b"]])
    w2 = jnp.stack([p["gate_2"]["w"], p["nonlin_2"]["w"]])
    b2 = jnp.stack([p["gate_2"]["b"], p["nonlin_2"]["b"]])
    w3, b3 = p["z_to_std"]["w"], p["z_to_std"]["b"]
    if compute_dtype is not None:
        w1 = w1.astype(compute_dtype)
        w2 = w2.astype(compute_dtype)
        w3 = w3.astype(compute_dtype)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3,
            "h_dim": int(p["gate_1"]["w"].shape[1])}


def gtf_apply_packed(pk, z, min_std=0.0):
    """GTF transition from pre-packed weights (see ``gtf_pack``).

    Three matmuls deep instead of four, three matmul ops instead of
    six; biases and activations stay float32 regardless of the packed
    weight dtype (matching ``gtf_apply``'s compute_dtype contract).
    """
    h_dim = pk["h_dim"]
    cd = pk["w1"].dtype
    zc = z.astype(cd)
    a1 = jnp.matmul(zc, pk["w1"]).astype(jnp.float32) + pk["b1"]
    g1 = jax.nn.relu(a1[..., :h_dim])
    n1 = jax.nn.relu(a1[..., h_dim:2 * h_dim])
    z_lin = a1[..., 2 * h_dim:]
    x2 = jnp.stack([g1, n1]).astype(cd)          # (2, ..., H)
    a2 = jnp.einsum("p...h,phd->p...d", x2, pk["w2"]).astype(jnp.float32)
    a2 = a2 + pk["b2"].reshape((2,) + (1,) * (a2.ndim - 2) + (-1,))
    gate = jax.nn.sigmoid(a2[0])
    z_nonlin = a2[1]
    z_std = jax.nn.softplus(
        jnp.matmul(z_nonlin.astype(cd), pk["w3"]).astype(jnp.float32)
        + pk["b3"]) + min_std
    z_mean = (1 - gate) * z_lin + gate * z_nonlin
    return z_mean, z_std


# ---------------------------------------------------------------------------
# GRU (torch-equation compatible), used by DKS/VRNN inference networks
# ---------------------------------------------------------------------------

def gru_init(key, in_dim, h_dim, n_layers=1, bias=True):
    """torch nn.GRU-compatible single/multi-layer GRU cell parameters."""
    layers = []
    for layer in range(n_layers):
        d_in = in_dim if layer == 0 else h_dim
        k = jax.random.fold_in(key, layer)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        bound = 1.0 / math.sqrt(h_dim)
        layers.append({
            "w_ih": _uniform(k1, (d_in, 3 * h_dim), bound),
            "w_hh": _uniform(k2, (h_dim, 3 * h_dim), bound),
            "b_ih": _uniform(k3, (3 * h_dim,), bound) if bias
            else jnp.zeros((3 * h_dim,)),
            "b_hh": _uniform(k4, (3 * h_dim,), bound) if bias
            else jnp.zeros((3 * h_dim,)),
        })
    return {"layers": layers}


def gru_cell(p_layer, x, h):
    """One GRU step for one layer. torch gate order: r, z, n."""
    hd = h.shape[-1]
    gi = x @ p_layer["w_ih"] + p_layer["b_ih"]
    gh = h @ p_layer["w_hh"] + p_layer["b_hh"]
    i_r, i_z, i_n = gi[..., :hd], gi[..., hd:2 * hd], gi[..., 2 * hd:]
    h_r, h_z, h_n = gh[..., :hd], gh[..., hd:2 * hd], gh[..., 2 * hd:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def gru_step(p, x, h_stack):
    """One timestep through all layers. h_stack: (n_layers, B, H)."""
    new_h = []
    inp = x
    for i, layer in enumerate(p["layers"]):
        h_i = gru_cell(layer, inp, h_stack[i])
        new_h.append(h_i)
        inp = h_i
    return jnp.stack(new_h, axis=0)


# ---------------------------------------------------------------------------
# Convolutions (NHWC internally for TPU; NCHW at the API edge for parity
# with the reference's (T, B, C, H, W) data contract)
# ---------------------------------------------------------------------------

def conv2d_init(key, c_in, c_out, ksize=3, xavier=True):
    """torch nn.Conv2d layout (out,in,kh,kw) init, stored as HWIO."""
    kw_, kb = jax.random.split(key)
    fan_in = c_in * ksize * ksize
    fan_out = c_out * ksize * ksize
    if xavier:
        bound = math.sqrt(6.0 / (fan_in + fan_out))
    else:
        bound = 1.0 / math.sqrt(fan_in)
    w = _uniform(kw_, (ksize, ksize, c_in, c_out), bound)
    b = _uniform(kb, (c_out,), 1.0 / math.sqrt(fan_in))
    return {"w": w, "b": b}


def conv2d_apply(p, x, stride=2, padding=1, compute_dtype=None):
    """x: (N, H, W, C) → (N, H', W', C'). ``compute_dtype`` (e.g.
    bfloat16) runs the MXU contraction in reduced precision with f32
    accumulation; params stay f32 masters."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.astype(jnp.float32) + p["b"]


def deconv2d_flip_to_v2(w_hwoi):
    """Convert a (k, k, out, in) HWOI deconv kernel (storage format 1) to
    the format-2 physical layout: the spatially-flipped HWIO kernel of the
    equivalent input-dilated forward convolution. Pure element permutation
    — the conv consumes bit-identical tap values either way."""
    return jnp.transpose(w_hwoi[::-1, ::-1, :, :], (0, 1, 3, 2))


def deconv2d_init(key, c_in, c_out, ksize=4, xavier=True):
    """torch nn.ConvTranspose2d weight is (in, out, kh, kw); xavier bounds
    use fan_in = in*k*k as torch computes them on that layout.

    The kernel is drawn in HWOI (preserving the historical RNG element
    order) but STORED pre-flipped as the HWIO kernel of the equivalent
    dilated forward conv, so ``deconv2d_apply`` needs no per-step
    flip/transpose. With the flip in the graph, XLA folds the kernel
    reverse into a reverse of the *activations* in the weight-grad pass
    (~1.3 ms/step of big-tensor `reverse` + forced copies in the r4
    trace); pre-flipped storage removes every such node."""
    kw_, kb = jax.random.split(key)
    fan_in = c_in * ksize * ksize
    fan_out = c_out * ksize * ksize
    if xavier:
        bound = math.sqrt(6.0 / (fan_in + fan_out))
    else:
        bound = 1.0 / math.sqrt(c_out * ksize * ksize)
    w = _uniform(kw_, (ksize, ksize, c_out, c_in), bound)  # drawn HWOI
    b = _uniform(kb, (c_out,), 1.0 / math.sqrt(c_out * ksize * ksize))
    return {"w": deconv2d_flip_to_v2(w), "b": b}


def deconv2d_apply(p, x, stride=2, padding=1, compute_dtype=None):
    """torch ConvTranspose2d semantics via input-dilated convolution.

    out_size = (in-1)*stride - 2*padding + ksize
    """
    ksize = p["w"].shape[0]
    pad = ksize - 1 - padding
    # Kernel stored pre-flipped HWIO (see deconv2d_init): use directly.
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.astype(jnp.float32) + p["b"]


def conv1d_init(key, c_in, c_out, ksize=3, xavier=True):
    kw_, kb = jax.random.split(key)
    fan_in = c_in * ksize
    fan_out = c_out * ksize
    bound = math.sqrt(6.0 / (fan_in + fan_out)) if xavier \
        else 1.0 / math.sqrt(fan_in)
    w = _uniform(kw_, (ksize, c_in, c_out), bound)
    b = _uniform(kb, (c_out,), 1.0 / math.sqrt(fan_in))
    return {"w": w, "b": b}


def conv1d_apply(p, x, stride=2, padding=1, compute_dtype=None):
    """x: (N, L, C)."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out.astype(jnp.float32) + p["b"]


def deconv1d_flip_to_v2(w_woi):
    """(k, out, in) WOI format-1 kernel → flipped WIO (format 2)."""
    return jnp.transpose(w_woi[::-1, :, :], (0, 2, 1))


def deconv1d_init(key, c_in, c_out, ksize=3, xavier=True):
    """Drawn WOI (historical RNG order), stored pre-flipped WIO — see
    deconv2d_init for why."""
    kw_, kb = jax.random.split(key)
    fan_in = c_in * ksize
    fan_out = c_out * ksize
    bound = math.sqrt(6.0 / (fan_in + fan_out)) if xavier \
        else 1.0 / math.sqrt(c_out * ksize)
    w = _uniform(kw_, (ksize, c_out, c_in), bound)  # drawn WOI
    b = _uniform(kb, (c_out,), 1.0 / math.sqrt(c_out * ksize))
    return {"w": deconv1d_flip_to_v2(w), "b": b}


def deconv1d_apply(p, x, stride=2, padding=1, compute_dtype=None):
    """torch ConvTranspose1d: out = (in-1)*stride - 2*padding + ksize."""
    ksize = p["w"].shape[0]
    pad = ksize - 1 - padding
    w = p["w"]  # stored pre-flipped WIO (see deconv1d_init)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out.astype(jnp.float32) + p["b"]


# ---------------------------------------------------------------------------
# BatchNorm (functional, with running-stat state like torch BatchNorm)
# ---------------------------------------------------------------------------

def batchnorm_init(c, eps=1e-5, momentum=0.1):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
    }, {
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
        "eps": eps,
        "momentum": momentum,
    }


def batchnorm_apply(p, state, x, train):
    """x: (..., C) — stats over all axes but the last (torch BN semantics
    over N,H,W). Returns (out, new_state)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * n / max(n - 1, 1)
        mom = state["momentum"]
        new_state = dict(state)
        new_state["mean"] = (1 - mom) * state["mean"] + mom * mean
        new_state["var"] = (1 - mom) * state["var"] + mom * unbiased
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + state["eps"])
    out = (x - mean) * inv * p["scale"] + p["bias"]
    return out, new_state
