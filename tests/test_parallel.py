"""Data-parallel training over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM
from multimodal_dmm_tpu.parallel import (make_mesh, shard_batch,
                                         make_dp_train_step, replicated)

T, B, Z, H = 12, 8, 4, 8
MODS = ["a", "b"]
DIMS = [2, 3]


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_matches_single_device():
    model = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)
    batch = {m: rng.randn(T, B, d).astype(np.float32)
             for m, d in zip(MODS, DIMS)}
    mask = np.ones((T, B, 1), np.float32)
    train_args = {"train_particles": 1, "match_particles": 2,
                  "match_mult": 0.0}

    key = jax.random.PRNGKey(7)

    # Single-device (no mesh) run of the same math, same key — computed
    # FIRST because the dp step donates its param/opt buffers.
    def loss_fn(p):
        loss, new_state = model.step(
            p, state, {m: jnp.asarray(v) for m, v in batch.items()},
            jnp.asarray(mask), 1.0, {"a": 1.0, "b": 1.0}, key,
            targets={m: jnp.asarray(v) for m, v in batch.items()},
            train=True, **train_args)
        return loss / (T * B), (loss, new_state)

    grads, (loss_1, _) = jax.grad(loss_fn, has_aux=True)(params)

    mesh = make_mesh(8)
    dp_step = make_dp_train_step(model, optimizer, {"a": 1.0, "b": 1.0},
                                 train_args, mesh)
    sharded_batch, sharded_mask = shard_batch(mesh, batch, mask)
    rep = replicated(mesh)
    p_rep = jax.device_put(params, rep)
    o_rep = jax.device_put(opt_state, rep)
    new_p, _, new_o, loss_dp = dp_step(
        p_rep, state, o_rep, sharded_batch, sharded_batch, sharded_mask,
        jnp.float32(1.0), jnp.float32(T * B), key)
    # MAP parts of the loss agree; sampled parts use the same key but
    # different partitioning of random bits — compare the deterministic
    # total loss magnitude loosely and the updated params strictly for
    # finiteness.
    assert np.isfinite(float(loss_dp)) and np.isfinite(float(loss_1))
    assert np.allclose(float(loss_dp), float(loss_1), rtol=0.3)
    for leaf in jax.tree_util.tree_leaves(new_p):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dp_step_output_sharding_is_replicated():
    model = MultiDMM(MODS, DIMS, z_dim=Z, h_dim=H)
    params, state = model.init(jax.random.PRNGKey(1))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(
        model, optimizer, {"a": 1.0, "b": 1.0},
        {"match_mult": 0.0, "train_particles": 1}, mesh)
    rng = np.random.RandomState(1)
    batch = {m: rng.randn(T, B, d).astype(np.float32)
             for m, d in zip(MODS, DIMS)}
    mask = np.ones((T, B, 1), np.float32)
    sb, sm = shard_batch(mesh, batch, mask)
    new_p, _, _, loss = dp_step(
        jax.device_put(params, replicated(mesh)), state,
        jax.device_put(opt_state, replicated(mesh)), sb, sb, sm,
        jnp.float32(1.0), jnp.float32(T * B), jax.random.PRNGKey(3))
    leaf = jax.tree_util.tree_leaves(new_p)[0]
    # Replicated output → addressable on all 8 devices
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_fully_replicated
