"""End-to-end trainer tests on a tiny spirals corpus (CPU).

Covers: training loop drives loss down, checkpoint roles, eval-task
composition, --method remap, run_find, and auto rec_mults.
"""

import os

import numpy as np
import pytest

from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
from multimodal_dmm_tpu.data.spirals import gen_dataset


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("spirals_data")
    gen_dataset(n_examples=20, n_train=12, timesteps=20,
                data_dir=str(data_dir))
    return str(data_dir)


def make_args(data_dir, save_dir, **over):
    defaults = dict(data_dir=data_dir, save_dir=save_dir, epochs=2,
                    eval_freq=1, save_freq=1, batch_size=6, device="cpu",
                    seed=1)
    defaults.update(over)
    argv = []
    for k, v in defaults.items():
        if isinstance(v, bool):
            if v:
                argv.append("--" + k)
        else:
            argv += ["--" + k, str(v)]
    return SpiralsTrainer.parser.parse_args(argv)


def test_train_eval_checkpoint_cycle(tiny_env, tmp_path):
    save_dir = str(tmp_path / "save")
    args = make_args(tiny_env, save_dir)
    trainer = SpiralsTrainer(args)
    # auto rec_mults resolved by post_build_args
    assert isinstance(args.rec_mults, dict)
    assert abs(args.rec_mults["spiral-x"] - 0.5) < 1e-9
    trainer.run_train(args)
    for fn in ("best.pth", "epoch_1.pth", "epoch_2.pth", "last.pth"):
        assert os.path.exists(os.path.join(save_dir, fn)), fn

    # Reload best checkpoint and evaluate
    args2 = make_args(tiny_env, save_dir, evaluate=True)
    trainer2 = SpiralsTrainer(args2)
    train_m, test_m = trainer2.run_eval(args2)
    assert np.isfinite(test_m["mse"])
    assert "kld_loss" in test_m and "rec_loss" in test_m


def test_training_reduces_loss(tiny_env, tmp_path):
    args = make_args(tiny_env, str(tmp_path / "save"), epochs=15,
                     eval_freq=15, save_freq=15, lr="5e-3")
    trainer = SpiralsTrainer(args)
    from multimodal_dmm_tpu.training.loader import BatchLoader
    train_data = trainer.train_data.split(args.split, args.bylen)
    loader = BatchLoader(train_data, batch_size=args.batch_size,
                         shuffle=True)
    first = trainer.train(loader, 1, args)
    losses = [trainer.train(loader, ep, args) for ep in range(2, 16)]
    assert losses[-1] < first * 0.9, (first, losses[-1])


def test_method_remap_bfvi(tiny_env, tmp_path):
    args = make_args(tiny_env, str(tmp_path / "save"), method="bfvi")
    trainer = SpiralsTrainer(args)
    assert args.model == "dmm"
    assert args.eval_args["flt_particles"] == 200


def test_eval_task_composition(tiny_env, tmp_path):
    """Conditional generation: drop y, keep x — recon must cover y."""
    save_dir = str(tmp_path / "save")
    args = make_args(tiny_env, save_dir)
    trainer = SpiralsTrainer(args)
    trainer.run_train(args)
    args.drop_mods = ["spiral-y"]
    args.keep_mods = ["spiral-x"]
    args.drop_frac, args.start_frac, args.stop_frac = 0.0, 0.0, 1.0
    from multimodal_dmm_tpu.training.loader import BatchLoader
    loader = BatchLoader(trainer.test_data, batch_size=args.batch_sz_eval)
    args.eval_set = None
    results, metrics = trainer.evaluate(loader, args)
    assert np.isfinite(metrics["mse"])
    # inputs must show y fully dropped, x fully kept
    assert all(np.isnan(seq).all() for seq in results["inputs"]["spiral-y"])
    assert all(~np.isnan(seq).any() for seq in results["inputs"]["spiral-x"])
    assert len(results["recon"]["spiral-y"]) == 8


def test_run_find(tiny_env, tmp_path):
    save_dir = str(tmp_path / "save")
    args = make_args(tiny_env, save_dir)
    trainer = SpiralsTrainer(args)
    trainer.run_train(args)
    os.remove(os.path.join(save_dir, "best.pth"))
    best_epoch, metrics = trainer.run_find(args)
    assert best_epoch in (1, 2)
    assert os.path.exists(os.path.join(save_dir, "best.pth"))
