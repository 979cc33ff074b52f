"""Optimizer parity: optax chain(add_decayed_weights, adam) must match
torch.optim.Adam(weight_decay=...) step for step (the reference's
optimizer, trainer.py:212-213)."""

import numpy as np
import jax.numpy as jnp
import optax
import torch


def test_adam_l2_matches_torch_over_steps():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    lr, wd = 1e-2, 1e-4

    # torch reference
    w_t = torch.tensor(w0, requires_grad=True)
    opt_t = torch.optim.Adam([w_t], lr=lr, weight_decay=wd)
    # optax
    params = {"w": jnp.array(w0)}
    tx = optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))
    opt_state = tx.init(params)

    for step in range(5):
        g = rng.randn(4, 3).astype(np.float32)
        # torch step
        opt_t.zero_grad()
        w_t.grad = torch.tensor(g)
        opt_t.step()
        # optax step
        updates, opt_state = tx.update({"w": jnp.array(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), w_t.detach().numpy(),
            rtol=1e-5, atol=1e-6,
            err_msg=f"diverged at step {step}")


def test_clip_then_adam_matches_torch():
    """Reference clips the global grad norm before Adam
    (trainer.py:248-251)."""
    rng = np.random.RandomState(1)
    w0 = rng.randn(6, 2).astype(np.float32)
    lr, wd, clip = 5e-3, 1e-4, 0.5

    w_t = torch.tensor(w0, requires_grad=True)
    opt_t = torch.optim.Adam([w_t], lr=lr, weight_decay=wd)
    params = {"w": jnp.array(w0)}
    tx = optax.chain(optax.clip_by_global_norm(clip),
                     optax.add_decayed_weights(wd), optax.adam(lr))
    opt_state = tx.init(params)

    for _ in range(3):
        g = rng.randn(6, 2).astype(np.float32) * 10
        opt_t.zero_grad()
        w_t.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([w_t], clip)
        opt_t.step()
        updates, opt_state = tx.update({"w": jnp.array(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   w_t.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
