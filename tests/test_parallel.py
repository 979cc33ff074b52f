"""Data-parallel training over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multimodal_dmm_tpu.models.dmm import MultiDMM
from multimodal_dmm_tpu.parallel import (make_mesh, shard_batch,
                                         make_dp_train_step, replicated,
                                         batch_sharding)

T, B, Z, H = 12, 8, 4, 8
MODS = ["a", "b"]
DIMS = [2, 3]


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_matches_single_device_exact():
    """MAP mode (sample=False, match_mult=0) is deterministic: the DP
    step must reproduce the single-device loss AND updated params up to
    float32 reduction-order noise."""
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
                  "match_mult": 0.0, "sample": False}

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
    updates_1, _ = optimizer.update(grads, opt_state, params)
    new_p_1 = optax.apply_updates(params, updates_1)

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

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=2e-5)
    flat_dp = jax.tree_util.tree_leaves_with_path(new_p)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(new_p_1))
    assert flat_dp and len(flat_dp) == len(flat_1)
    for path, leaf in flat_dp:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1[path]),
            rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_2d_mesh_train_step_matches_single_device_exact():
    """2-D (data × model) prototype (VERDICT r2 item 7): the stacked
    variant rows shard over the 'model' axis, batch over 'data'; MAP
    mode must reproduce single-device loss AND updated params."""
    from multimodal_dmm_tpu.parallel import (make_mesh_2d,
                                             make_2d_train_step)
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
                  "match_mult": 0.0, "sample": False}
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        loss, new_state = model.step(
            p, state, {m: jnp.asarray(v) for m, v in batch.items()},
            jnp.asarray(mask), 1.0, {"a": 1.0, "b": 1.0}, key,
            targets={m: jnp.asarray(v) for m, v in batch.items()},
            train=True, **train_args)
        return loss / (T * B), (loss, new_state)

    grads, (loss_1, _) = jax.grad(loss_fn, has_aux=True)(params)
    updates_1, _ = optimizer.update(grads, opt_state, params)
    new_p_1 = optax.apply_updates(params, updates_1)

    # 4 data × 2 model over the 8 virtual devices. The fused objective
    # has V = 3 variant rows (joint + 2 uni) — not a multiple of the
    # model axis, which GSPMD handles by padding the merged V·B dim.
    mesh = make_mesh_2d(4, 2)
    try:
        step_2d = make_2d_train_step(model, optimizer,
                                     {"a": 1.0, "b": 1.0}, train_args,
                                     mesh)
        sharded = {m: jax.device_put(
            v, batch_sharding(mesh, np.ndim(v), 1)) for m, v in
            batch.items()}
        mask_s = jax.device_put(mask,
                                batch_sharding(mesh, np.ndim(mask), 1))
        new_p, _, _, loss_2d = step_2d(
            jax.device_put(params, replicated(mesh)), state,
            jax.device_put(opt_state, replicated(mesh)), sharded,
            sharded, mask_s, jnp.float32(1.0), jnp.float32(T * B), key)
    finally:
        model.set_variant_mesh(None)

    np.testing.assert_allclose(float(loss_2d), float(loss_1), rtol=2e-5)
    flat_2d = jax.tree_util.tree_leaves_with_path(new_p)
    flat_1 = dict(jax.tree_util.tree_leaves_with_path(new_p_1))
    assert flat_2d and len(flat_2d) == len(flat_1)
    for path, leaf in flat_2d:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_1[path]),
            rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_trainer_mesh_flag_end_to_end(tmp_path):
    """--mesh 8 trains, evaluates, and checkpoints on the virtual mesh
    through the ordinary Trainer drivers."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset

    data_dir = str(tmp_path / "data")
    gen_dataset(n_examples=20, n_train=12, timesteps=16,
                data_dir=data_dir)
    argv = ["--data_dir", data_dir, "--save_dir", str(tmp_path / "save"),
            "--epochs", "2", "--eval_freq", "1", "--save_freq", "2",
            "--batch_size", "8", "--device", "cpu", "--mesh", "8"]
    args = SpiralsTrainer.parser.parse_args(argv)
    trainer = SpiralsTrainer(args)
    assert trainer.mesh is not None
    trainer.run_train(args)
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_fully_replicated
    import os
    assert os.path.exists(str(tmp_path / "save" / "best.pth"))
    _, metrics = trainer.run_eval(args)
    assert np.isfinite(metrics["mse"])


def test_trainer_mesh_matches_single_device_map_loss(tmp_path):
    """One MAP-mode epoch under --mesh 8 reproduces the single-device
    epoch loss (same seed, host loader, deterministic objective)."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset
    from multimodal_dmm_tpu.training.loader import BatchLoader

    data_dir = str(tmp_path / "data")
    gen_dataset(n_examples=16, n_train=8, timesteps=16,
                data_dir=data_dir)
    losses = {}
    for tag, mesh_n in (("single", 0), ("mesh", 8)):
        argv = ["--data_dir", data_dir,
                "--save_dir", str(tmp_path / ("save_" + tag)),
                "--epochs", "1", "--batch_size", "8", "--device", "cpu",
                "--burst_frac", "0.0", "--seed", "3",
                "--train_args",
                "{sample: false, match_mult: 0.0, train_particles: 1}"]
        if mesh_n:
            argv += ["--mesh", str(mesh_n)]
        args = SpiralsTrainer.parser.parse_args(argv)
        trainer = SpiralsTrainer(args)
        loader = BatchLoader(trainer.train_data,
                             batch_size=args.batch_size, shuffle=False)
        losses[tag] = trainer.train(loader, 1, args)
    np.testing.assert_allclose(losses["mesh"], losses["single"],
                               rtol=2e-5)


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


def test_trainer_mesh_2d_matches_single_device_map_loss(tmp_path):
    """--mesh 4x2 (data x model) through the ordinary Trainer: one
    MAP-mode epoch reproduces the single-device epoch loss, and the
    variant-sharding hook is armed on the model."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset
    from multimodal_dmm_tpu.training.loader import BatchLoader

    data_dir = str(tmp_path / "data")
    gen_dataset(n_examples=16, n_train=8, timesteps=16,
                data_dir=data_dir)
    losses = {}
    for tag, mesh_spec in (("single", None), ("mesh2d", "4x2")):
        argv = ["--data_dir", data_dir,
                "--save_dir", str(tmp_path / ("save_" + tag)),
                "--epochs", "1", "--batch_size", "8", "--device", "cpu",
                "--burst_frac", "0.0", "--seed", "3",
                "--train_args",
                "{sample: false, match_mult: 0.0, train_particles: 1}"]
        if mesh_spec:
            argv += ["--mesh", mesh_spec]
        args = SpiralsTrainer.parser.parse_args(argv)
        trainer = SpiralsTrainer(args)
        if mesh_spec:
            assert trainer.mesh is not None
            assert trainer.mesh.devices.shape == (4, 2)
            assert trainer.model.vb_mesh is trainer.mesh
            assert trainer._mesh_n_data == 4
        loader = BatchLoader(trainer.train_data,
                             batch_size=args.batch_size, shuffle=False)
        losses[tag] = trainer.train(loader, 1, args)
    np.testing.assert_allclose(losses["mesh2d"], losses["single"],
                               rtol=2e-5)


def test_trainer_mesh_2d_rejects_variantless_model(tmp_path):
    """DKS has no stacked-variant axis: --mesh NxM must fail fast with
    a clear error instead of silently training unsharded."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset

    data_dir = str(tmp_path / "data")
    gen_dataset(n_examples=8, n_train=4, timesteps=8,
                data_dir=data_dir)
    argv = ["--data_dir", data_dir, "--save_dir", str(tmp_path / "s"),
            "--method", "b-mask", "--device", "cpu", "--batch_size",
            "4", "--mesh", "4x2"]
    args = SpiralsTrainer.parser.parse_args(argv)
    with pytest.raises(ValueError, match="variant"):
        SpiralsTrainer(args)
