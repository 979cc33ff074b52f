"""Model-level equivalence: MultiDMM with the full-scan Pallas kernel
(interpret mode) vs the lax.scan path — same RNG stream, so outputs are
bit-comparable, in MAP and sampled modes and through the step loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM

T, B, Z, H = 8, 9, 128, 32
MODS = ["a", "b"]
DIMS = [4, 6]


def make_models():
    base = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H, use_pallas=False,
                    use_scan_kernel=False)
    kern = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H, use_pallas=False,
                    use_scan_kernel=True)
    kern._scan_kernel_interpret = True
    params, state = base.init(jax.random.PRNGKey(0))
    return base, kern, params, state


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    out = {}
    for m, d in zip(MODS, DIMS):
        x = rng.randn(T, B, d).astype(np.float32)
        x[rng.rand(T, B) < 0.3] = np.nan
        out[m] = jnp.array(x)
    return out


@pytest.mark.parametrize("mode,sample,fp", [
    ("bfilter", False, 1),
    ("fsmooth", False, 1),
    ("fsmooth", True, 4),
    ("bsmooth", True, 2),
])
def test_forward_equivalence(mode, sample, fp):
    base, kern, params, state = make_models()
    inputs = make_inputs()
    key = jax.random.PRNGKey(5)
    out_b, _ = base.forward(params, state, inputs, rng=key, mode=mode,
                            sample=sample, flt_particles=fp)
    out_k, _ = kern.forward(params, state, inputs, rng=key, mode=mode,
                            sample=sample, flt_particles=fp)
    for (ib, pb, rb), (ik, pk, rk) in [(out_b, out_k)]:
        np.testing.assert_allclose(np.asarray(ik[0]), np.asarray(ib[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ik[1]), np.asarray(ib[1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pk[0]), np.asarray(pb[0]),
                                   rtol=1e-4, atol=1e-5)
        for m in MODS:
            np.testing.assert_allclose(np.asarray(rk[m][0]),
                                       np.asarray(rb[m][0]),
                                       rtol=1e-4, atol=1e-5)


def test_step_loss_and_grads_equivalence():
    base, kern, params, state = make_models()
    inputs = make_inputs(1)
    mask = jnp.ones((T, B, 1))
    common = dict(kld_mult=1.0, rec_mults={m: 1.0 for m in MODS},
                  targets=inputs, train_particles=3, match_particles=2)

    def loss_fn(model):
        def f(p):
            loss, _ = model.step(p, state, inputs, mask,
                                 rng=jax.random.PRNGKey(7), **common)
            return loss
        return f

    lb, gb = jax.value_and_grad(loss_fn(base))(params)
    lk, gk = jax.value_and_grad(loss_fn(kern))(params)
    np.testing.assert_allclose(float(lk), float(lb), rtol=1e-4)
    for (pa, a), (pb_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gb),
            jax.tree_util.tree_leaves_with_path(gk)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa))
