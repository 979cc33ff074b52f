"""Device mesh + data-parallel training over ICI.

The reference is single-device (SURVEY §2: no DP/TP/PP anywhere; the only
SPMD axis this workload has is the batch). The TPU-native scale-out is
batch data parallelism over a `jax.sharding.Mesh`: parameters and
optimizer state are replicated, batch tensors are sharded on their batch
axis, and XLA inserts the gradient all-reduce over ICI automatically when
the jitted train step is constrained with these shardings.

Time-first layout note: batches are (T, B, ...) so the batch axis is
axis 1 for data/mask tensors.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """Build a 1-D device mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, ndim, batch_axis=1, axis_name="data"):
    """Sharding for a (T, B, ...) tensor: shard axis ``batch_axis``."""
    spec = [None] * ndim
    spec[batch_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh, batch, mask, axis_name="data"):
    """Device-put a batch dict + mask with batch-axis sharding."""
    out = {m: jax.device_put(
        v, batch_sharding(mesh, np.ndim(v), 1, axis_name))
        for m, v in batch.items()}
    mask_s = jax.device_put(
        mask, batch_sharding(mesh, np.ndim(mask), 1, axis_name))
    return out, mask_s


def make_dp_train_step(model, optimizer, rec_mults, train_args, mesh,
                       axis_name="data"):
    """Jitted data-parallel train step.

    Params/opt_state replicated, batch sharded over the mesh; the gradient
    all-reduce is inserted by XLA (GSPMD) and rides ICI.
    """
    rep = replicated(mesh)
    train_args = dict(train_args)

    def train_step(params, state, opt_state, inputs, targets, mask,
                   kld_mult, n_data, rng):
        def loss_fn(p):
            loss, new_state = model.step(
                p, state, inputs, mask, kld_mult, rec_mults, rng,
                targets=targets, train=True, **train_args)
            return loss / n_data, (loss, new_state)

        grads, (loss, new_state) = jax.grad(loss_fn, has_aux=True)(params)
        import optax
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, loss

    return jax.jit(
        train_step,
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 2))


def make_mesh_2d(n_data, n_model, devices=None,
                 axis_names=("data", "model")):
    """Build a 2-D (data × model) device mesh.

    The 'data' axis shards batch columns; the 'model' axis shards the
    fused objective's stacked variant/particle rows (SURVEY §5.8/§7.1:
    the z-scan is sequential in T, but the V variant rows and K
    particle rows are embarrassingly parallel)."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model
    if len(devices) < n:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def make_2d_train_step(model, optimizer, rec_mults, train_args, mesh,
                       data_axis="data", model_axis="model"):
    """Jitted 2-D-parallel train step (prototype).

    Params/opt replicated; the batch shards over ``data_axis``; the
    model enables its stacked-variant sharding constraint so the V·B
    merged dimension of the fused objective spreads over
    (model, data) — GSPMD then inserts the cross-axis collectives
    (variant-row loss partial sums reduce over ICI). Numerically exact
    vs 1-D DP and single-device (tests/test_parallel.py).
    """
    rep = replicated(mesh)
    train_args = dict(train_args)
    model.set_variant_mesh(mesh, axes=(model_axis, data_axis))

    def train_step(params, state, opt_state, inputs, targets, mask,
                   kld_mult, n_data, rng):
        def loss_fn(p):
            loss, new_state = model.step(
                p, state, inputs, mask, kld_mult, rec_mults, rng,
                targets=targets, train=True, **train_args)
            return loss / n_data, (loss, new_state)

        grads, (loss, new_state) = jax.grad(loss_fn,
                                            has_aux=True)(params)
        import optax
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, loss

    return jax.jit(
        train_step,
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 2))
