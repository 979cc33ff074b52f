"""Device-resident eval engine tests.

Covers: on-device task composition parity with the host deletion
operators (deterministic tasks bit-equivalent, random deletion count
exact), and device-vs-host `evaluate` metric equivalence on the spirals
app (the engine VERDICT r2 item 1 asked for).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_dmm_tpu.data import multiseq as mseq
from multimodal_dmm_tpu.training.eval_engine import (DeviceEvalData,
                                                     compose_task,
                                                     time_avg_dev)
from multimodal_dmm_tpu.training.loader import BatchLoader


def _batch(rng, t_max=12, b_dim=5, mods=("a", "b")):
    lengths = np.sort(rng.randint(4, t_max + 1, b_dim))[::-1]
    lengths = jnp.asarray(lengths.astype(np.float32))
    targets = {}
    for m in mods:
        x = rng.randn(t_max, b_dim, 2).astype(np.float32)
        for i, le in enumerate(np.asarray(lengths, int)):
            x[le:, i] = np.nan
        targets[m] = jnp.asarray(x)
    return targets, lengths


def test_keep_segment_bit_equivalent_to_host():
    rng = np.random.RandomState(0)
    targets, lengths = _batch(rng)
    host_in = {m: np.asarray(targets[m], copy=True) for m in targets}
    host = mseq.keep_segment(host_in, 0.25, 0.75,
                             list(np.asarray(lengths, int)))
    dev = compose_task(targets, lengths, jax.random.PRNGKey(0),
                       jnp.float32(0.0), jnp.float32(0.25),
                       jnp.float32(0.75))
    for m in targets:
        np.testing.assert_array_equal(np.isnan(np.asarray(dev[m])),
                                      np.isnan(host[m]))
        got = np.asarray(dev[m])
        keep = ~np.isnan(host[m])
        np.testing.assert_array_equal(got[keep], host[m][keep])


def test_rand_delete_count_and_validity():
    rng = np.random.RandomState(1)
    targets, lengths = _batch(rng, t_max=20, b_dim=6)
    drop = 0.4
    dev = compose_task(targets, lengths, jax.random.PRNGKey(3),
                       jnp.float32(drop), jnp.float32(0.0),
                       jnp.float32(1.0))
    lengths_i = np.asarray(lengths, int)
    for m in targets:
        was = ~np.isnan(np.asarray(targets[m][..., 0]))
        now = ~np.isnan(np.asarray(dev[m][..., 0]))
        # Never resurrects missing data.
        assert not (now & ~was).any()
        # Deletes exactly int(drop * L) valid steps per sequence.
        deleted = (was & ~now).sum(axis=0)
        np.testing.assert_array_equal(deleted,
                                      (drop * lengths_i).astype(int))


def test_rand_delete_independent_across_modalities():
    rng = np.random.RandomState(2)
    targets, lengths = _batch(rng, t_max=30, b_dim=4)
    dev = compose_task(targets, lengths, jax.random.PRNGKey(9),
                       jnp.float32(0.5), jnp.float32(0.0),
                       jnp.float32(1.0))
    pa = np.isnan(np.asarray(dev["a"][..., 0]))
    pb = np.isnan(np.asarray(dev["b"][..., 0]))
    assert (pa != pb).any()


def test_drop_and_keep_mods():
    rng = np.random.RandomState(3)
    targets, lengths = _batch(rng)
    dev = compose_task(targets, lengths, jax.random.PRNGKey(1),
                       jnp.float32(0.9), jnp.float32(0.0),
                       jnp.float32(1.0), drop_mods=("a",),
                       keep_mods=("b",))
    assert np.isnan(np.asarray(dev["a"])).all()
    np.testing.assert_array_equal(np.asarray(dev["b"]),
                                  np.asarray(targets["b"]))


def test_time_avg_dev_matches_host():
    rng = np.random.RandomState(4)
    t_max, b_dim = 10, 4
    lengths = np.array([10, 7, 5, 0], np.float32)  # last = ghost
    mask = (np.arange(t_max)[:, None] < lengths[None, :])[..., None]
    val = rng.randn(t_max, b_dim).astype(np.float32)
    got = np.asarray(time_avg_dev(jnp.asarray(val), jnp.asarray(mask),
                                  jnp.asarray(lengths)))
    for i in range(3):
        li = int(lengths[i])
        np.testing.assert_allclose(got[i], val[:li, i].sum() / li,
                                   rtol=1e-6)
    assert got[3] == 0.0


def test_device_eval_data_upload_matches_loader(tmp_path):
    from multimodal_dmm_tpu.data.spirals import SpiralsDataset, \
        gen_dataset
    gen_dataset(n_examples=10, n_train=6, timesteps=15,
                data_dir=str(tmp_path))
    ds = SpiralsDataset(["spiral-x", "spiral-y"], str(tmp_path),
                        "test", truncate=True, item_as_dict=True)
    loader = BatchLoader(ds, batch_size=3)
    dev = DeviceEvalData(ds, ["spiral-x", "spiral-y"], 3)
    host_batches = list(loader)
    assert len(dev.batches) == len(host_batches)
    for b, (targets, mask, lengths, order, ids) in zip(dev.batches,
                                                       host_batches):
        assert b.lengths == list(lengths)
        assert b.order == list(order)
        assert b.ids == list(ids)
        np.testing.assert_array_equal(np.asarray(b.mask), mask)
        for m in b.targets:
            np.testing.assert_array_equal(np.asarray(b.targets[m]),
                                          targets[m])


# ---------------------------------------------------------------------------
# End-to-end: device engine vs host evaluate on the spirals app.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def spirals_trainer(tmp_path_factory):
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset
    data_dir = tmp_path_factory.mktemp("spirals_data")
    save_dir = tmp_path_factory.mktemp("save")
    gen_dataset(n_examples=16, n_train=10, timesteps=18,
                data_dir=str(data_dir))
    argv = ["--data_dir", str(data_dir), "--save_dir", str(save_dir),
            "--epochs", "1", "--batch_size", "5", "--device", "cpu",
            "--seed", "1"]
    args = SpiralsTrainer.parser.parse_args(argv)
    trainer = SpiralsTrainer(args)
    return trainer, args


@pytest.mark.parametrize("task", [
    dict(drop_frac=0.0, start_frac=0.25, stop_frac=0.75),     # half
    dict(drop_frac=0.0, start_frac=0.0, stop_frac=0.5),       # fwd
    dict(drop_frac=0.0, start_frac=0.0, stop_frac=1.0,
         drop_mods=["spiral-y"], keep_mods=["spiral-x"]),     # condgen
])
def test_device_eval_matches_host_on_deterministic_tasks(
        spirals_trainer, task):
    """drop_frac=0 removes the only RNG-source deviation, so the device
    engine must reproduce the host path's metrics exactly (same inputs,
    same MAP forward, same metric math)."""
    trainer, args = spirals_trainer
    args.drop_frac = task.get("drop_frac", 0.0)
    args.start_frac = task.get("start_frac", 0.0)
    args.stop_frac = task.get("stop_frac", 1.0)
    args.drop_mods = task.get("drop_mods", [])
    args.keep_mods = task.get("keep_mods", [])
    args.eval_set = None
    args.visualize = False
    loader = BatchLoader(trainer.test_data,
                         batch_size=args.batch_sz_eval)

    assert trainer.mesh is None
    _, dev_m = trainer._evaluate_device(loader, args)
    # Host path: bypass the device gate by calling with collect.
    _, host_m = trainer.evaluate(loader, args, collect_results=True)

    for k in ("kld_loss", "rec_loss", "mse", "mse_std"):
        np.testing.assert_allclose(dev_m[k], host_m[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_device_eval_random_task_is_sane(spirals_trainer):
    """drop_frac>0 uses jax RNG (documented deviation): metrics must be
    finite and in the same ballpark as the host draw."""
    trainer, args = spirals_trainer
    args.drop_frac, args.start_frac, args.stop_frac = 0.5, 0.0, 1.0
    args.drop_mods, args.keep_mods = [], []
    args.eval_set = None
    args.visualize = False
    loader = BatchLoader(trainer.test_data,
                         batch_size=args.batch_sz_eval)
    _, dev_m = trainer._evaluate_device(loader, args)
    _, host_m = trainer.evaluate(loader, args, collect_results=True)
    assert np.isfinite(dev_m["mse"])
    assert abs(dev_m["mse"] - host_m["mse"]) < max(
        1.0, 0.5 * abs(host_m["mse"]))


def test_evaluate_gate_routes_to_device_engine(spirals_trainer):
    """collect_results=False on a meshless trainer with a device metric
    hook must route through the device engine (cache populated)."""
    trainer, args = spirals_trainer
    args.drop_frac, args.start_frac, args.stop_frac = 0.0, 0.0, 1.0
    args.drop_mods, args.keep_mods = [], []
    args.eval_set = None
    args.visualize = False
    loader = BatchLoader(trainer.test_data,
                         batch_size=args.batch_sz_eval)
    before = len(trainer._task_eval_cache)
    _, m = trainer.evaluate(loader, args, collect_results=False)
    assert np.isfinite(m["mse"])
    assert trainer._eval_dev_cache
    assert len(trainer._task_eval_cache) >= max(before, 1)

# ---------------------------------------------------------------------------
# Mesh-compatible device eval (VERDICT r3 item 3): the engine must stay
# active under --mesh and reproduce the host path's metrics.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mesh_spec", ["2", "8", "2x2"])
def test_device_eval_matches_host_under_mesh(tmp_path_factory,
                                             mesh_spec):
    """--mesh 2 shards the eval batch (6 % 2 == 0), --mesh 8 exercises
    the replicated fallback (the 6-sequence test set is one eval batch
    and 6 % 8 != 0; train batch_size is 8 to satisfy the trainer's
    divisibility contract), --mesh 2x2 adds the 2-D variant mesh. All
    must match the host evaluate exactly on a deterministic task."""
    from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
    from multimodal_dmm_tpu.data.spirals import gen_dataset
    data_dir = tmp_path_factory.mktemp("spirals_mesh_data")
    save_dir = tmp_path_factory.mktemp("spirals_mesh_save")
    gen_dataset(n_examples=16, n_train=10, timesteps=18,
                data_dir=str(data_dir))
    batch = "8" if mesh_spec == "8" else "6"
    argv = ["--data_dir", str(data_dir), "--save_dir", str(save_dir),
            "--epochs", "1", "--batch_size", batch, "--device", "cpu",
            "--seed", "1", "--mesh", mesh_spec]
    args = SpiralsTrainer.parser.parse_args(argv)
    trainer = SpiralsTrainer(args)
    try:
        assert trainer.mesh is not None
        args.drop_frac, args.start_frac, args.stop_frac = 0.0, 0.25, 0.75
        args.drop_mods, args.keep_mods = [], []
        args.eval_set = None
        args.visualize = False
        loader = BatchLoader(trainer.test_data,
                             batch_size=args.batch_sz_eval)
        _, dev_m = trainer._evaluate_device(loader, args)
        # Host path (collect_results=True bypasses the device gate).
        _, host_m = trainer.evaluate(loader, args, collect_results=True)
        for k in ("kld_loss", "rec_loss", "mse", "mse_std"):
            np.testing.assert_allclose(dev_m[k], host_m[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
    finally:
        if getattr(trainer.model, "vb_mesh", None) is not None:
            trainer.model.set_variant_mesh(None)
