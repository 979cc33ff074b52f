"""Intra-trial resume (--resume_trial / MDMM_RESUME_TRIAL).

The reference has no notion of resuming an interrupted training run —
its Ray trials restart from scratch. Here the trainer checkpoints the
full (params, opt_state, sampling-RNG, best-loss) tuple every
save_freq epochs, so a killed run continues bit-exactly: the shuffle
order is a pure function of (seed, epoch), the KLD anneal of the
epoch number, and the sampling stream is restored from the
checkpoint. This is load-bearing for long CPU sweeps under timeouts
(the DKS probe battery) and for TPU sweeps across tunnel outages.
"""

import os
import pickle

import jax
import numpy as np
import pytest

from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
from multimodal_dmm_tpu.data.spirals import gen_dataset
from multimodal_dmm_tpu.experiments import tune


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spirals_data")
    gen_dataset(n_examples=12, n_train=8, timesteps=20,
                data_dir=str(d))
    return str(d)


def _make(data_dir, save_dir, epochs, **over):
    defaults = dict(data_dir=data_dir, save_dir=save_dir, epochs=epochs,
                    eval_freq=2, save_freq=2, batch_size=4,
                    device="cpu", seed=0,
                    eval_args="{flt_particles: 5}")
    defaults.update(over)
    argv = []
    for k, v in defaults.items():
        if isinstance(v, bool):
            if v:
                argv.append("--" + k)
        else:
            argv += ["--" + k, str(v)]
    args = SpiralsTrainer.parser.parse_args(argv)
    return SpiralsTrainer(args), args


def _leaves(params):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


@pytest.mark.slow
def test_resume_is_bit_exact(data_dir, tmp_path):
    # Straight run: 6 epochs end to end.
    t_full, a_full = _make(data_dir, str(tmp_path / "full"), epochs=6)
    t_full.run_train(a_full)
    full_leaves = _leaves(t_full.params)

    # Interrupted run: 4 epochs, then a fresh process-equivalent
    # trainer resumes from the epoch_4 checkpoint and finishes 5-6.
    t_a, a_a = _make(data_dir, str(tmp_path / "split"), epochs=4)
    t_a.run_train(a_a)
    ck = pickle.load(open(tmp_path / "split" / "epoch_4.pth", "rb"))
    assert ck["epoch"] == 4 and "rng" in ck and "best_loss" in ck

    t_b, a_b = _make(data_dir, str(tmp_path / "split"), epochs=6,
                     resume_trial=True)
    t_b.run_train(a_b)

    for got, want in zip(_leaves(t_b.params), full_leaves):
        np.testing.assert_array_equal(got, want)


def test_latest_checkpoint_skips_corrupt(tmp_path):
    from multimodal_dmm_tpu.training.checkpoint import save_checkpoint
    save_checkpoint(str(tmp_path / "epoch_2.pth"), ["spiral-x"],
                    {"w": np.ones(3)}, extra={"epoch": 2})
    (tmp_path / "epoch_4.pth").write_bytes(b"truncated-garbage")
    n, ck = SpiralsTrainer._latest_epoch_checkpoint(str(tmp_path))
    assert n == 2
    assert ck["epoch"] == 2


def test_latest_checkpoint_empty_dir(tmp_path):
    n, ck = SpiralsTrainer._latest_epoch_checkpoint(str(tmp_path))
    assert n is None and ck is None
    n, ck = SpiralsTrainer._latest_epoch_checkpoint(
        str(tmp_path / "does_not_exist"))
    assert n is None and ck is None


@pytest.mark.slow
def test_tune_partial_resume(data_dir, tmp_path):
    """The trial runner continues a partial trial (progress.csv but no
    completed last_result.json) from its epoch checkpoint, appending
    to progress.csv instead of truncating it."""
    cfg = {"data_dir": data_dir, "epochs": 4, "eval_freq": 1,
           "save_freq": 2, "batch_size": 4, "device": "cpu",
           "seed": tune.grid_search([0]),
           "eval_args": {"flt_particles": 5}}

    # Simulate an interrupted first attempt: run 2 epochs inside the
    # trial logdir with the tune Reporter, but leave no
    # last_result.json (the runner writes that, and a kill precedes it).
    logdir = tmp_path / "exp" / "spirals_tune_0_seed=0"
    logdir.mkdir(parents=True)
    reporter = tune.Reporter(str(logdir))
    root = os.getcwd()
    try:
        os.chdir(str(logdir))
        t0, a0 = _make(data_dir, "spirals_save", epochs=2, eval_freq=1,
                       save_freq=2)
        try:
            t0.run_train(a0, reporter)
        except tune.StopTrial:
            pass
    finally:
        os.chdir(root)
    rows_before = open(logdir / "progress.csv").read().splitlines()
    assert not (logdir / "last_result.json").exists()

    tune.register_trainable(
        "spirals_tune", lambda c, r: SpiralsTrainer.tune(c, r))
    cks = tune.run("spirals_tune", name="exp", config=cfg,
                   local_dir=str(tmp_path), resume=True)
    assert cks[0]["status"] == "TERMINATED"
    assert cks[0]["last_result"]["done"]

    rows_after = open(logdir / "progress.csv").read().splitlines()
    # Appended, not truncated: prior rows intact, exactly one header.
    assert rows_after[:len(rows_before)] == rows_before
    assert sum(1 for r in rows_after if r.startswith("mean_loss")
               or r.startswith("timestamp")) <= 1
    iters = [int(float(r.split(",")[2])) for r in rows_after[1:]]
    # First attempt reported epochs 1-2; the resume continues at 3.
    assert iters[-1] == 4
    assert 3 in iters
