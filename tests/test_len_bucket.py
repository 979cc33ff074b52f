"""Length-bucketed eval batching (SURVEY §7.1 row 6): ragged-length
batches pad T up to a bucket multiple so XLA reuses a small set of
compiled shapes; bucketing must be numerics-neutral (padded steps are
masked out of every loss/metric)."""

import numpy as np
import pytest

from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer
from multimodal_dmm_tpu.data.spirals import gen_dataset
from multimodal_dmm_tpu.training.loader import BatchLoader


@pytest.fixture(scope="module")
def ragged_env(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("spirals_data")
    gen_dataset(n_examples=18, n_train=10, timesteps=50,
                data_dir=str(data_dir))
    return str(data_dir)


def _make_trainer(data_dir, save_dir, **over):
    defaults = dict(data_dir=data_dir, save_dir=save_dir, epochs=1,
                    eval_freq=1, save_freq=1, batch_size=5, device="cpu",
                    seed=1)
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


def test_loader_buckets_time_axis(ragged_env, tmp_path):
    trainer, args = _make_trainer(ragged_env, str(tmp_path / "s"))
    # Split by length → ragged chunk lengths (chunk len 17: 17/17/16).
    ragged = trainer.test_data.split(17, True)
    lengths_seen = set()
    for batch, mask, lengths, order, ids in BatchLoader(
            ragged, batch_size=5, len_bucket=16):
        t = mask.shape[0]
        assert t % 16 == 0
        assert t >= max(lengths)
        # mask covers exactly the real steps
        assert mask[:, :len(lengths)].sum() == sum(lengths)
        lengths_seen.add(t)
    assert lengths_seen == {32}  # 17 and 16 both round up to 32


def test_bucketing_is_numerics_neutral(ragged_env, tmp_path):
    trainer, args = _make_trainer(ragged_env, str(tmp_path / "s2"))
    ragged = trainer.test_data.split(17, True)
    args.eval_set = None

    metrics = {}
    for bucket in (0, 16):
        np.random.seed(123)  # rand_delete draws must match across runs
        loader = BatchLoader(ragged, batch_size=5, len_bucket=bucket)
        _, metrics[bucket] = trainer.evaluate(loader, args)
    # Task metrics (MSE over real steps) are padding-invariant. The
    # kld/rec losses shift by <1%: inference scans also traverse the
    # padded tail, so the conditional-prior chain entering the real
    # steps differs — the same property the reference has for
    # shorter-than-max sequences inside any ragged batch.
    np.testing.assert_allclose(metrics[16]["mse"], metrics[0]["mse"],
                               rtol=1e-3)
    np.testing.assert_allclose(metrics[16]["mse_std"],
                               metrics[0]["mse_std"], rtol=5e-3)
    for k in ("kld_loss", "rec_loss"):
        np.testing.assert_allclose(metrics[16][k], metrics[0][k],
                                   rtol=2e-2, err_msg=k)


def test_len_bucket_flag_reaches_eval_loader(ragged_env, tmp_path):
    trainer, args = _make_trainer(ragged_env, str(tmp_path / "s3"),
                                  len_bucket=16)
    assert args.len_bucket == 16
    trainer.run_train(args)  # smoke: flag flows through run_train eval