"""End-to-end tests of the Weizmann and VidTIMIT apps on synthetic
fixtures (CPU, tiny models via model_args z_dim/h_dim overrides)."""

import os

import numpy as np
import pytest

from multimodal_dmm_tpu.data import weizmann as wdata
from multimodal_dmm_tpu.data import vidtimit as vdata


@pytest.fixture(scope="module")
def weizmann_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("weizmann"))
    wdata.gen_synthetic(d, persons_subset=['daria', 'shahar'],
                        actions_subset=['bend', 'jack'],
                        t_range=(20, 30))
    return d


@pytest.fixture(scope="module")
def vidtimit_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidtimit"))
    vdata.gen_synthetic(d, n_subjects=2, n_sentences=3,
                        t_range=(20, 30))
    return d


def test_weizmann_dataset_layout(weizmann_dir):
    ds = wdata.WeizmannDataset(weizmann_dir, item_as_dict=True)
    assert len(ds) == 4
    assert sorted(ds.modalities) == ['action', 'mask', 'person', 'video']
    item = ds[0]
    T = item['length']
    assert item['video'].shape == (T, 3, 64, 64)
    assert item['mask'].shape == (T, 1, 64, 64)
    assert item['person'].shape == (T, 1)
    assert item['action'].shape == (T, 1)
    # leave-one-person-out split
    train = ds.select([['shahar'], None], invert=True)
    test = ds.select([['shahar'], None])
    assert len(train) == 2 and len(test) == 2


def test_vidtimit_dataset_layout(vidtimit_dir):
    ds = vdata.VidTIMITDataset(vidtimit_dir, item_as_dict=True)
    assert len(ds) == 6
    item = ds[0]
    T = item['length']
    assert item['video'].shape == (T, 3, 64, 64)
    assert item['audio'].shape[0] in (T, T + 1)  # truncate aligns
    assert item['audio'].shape[1:] == (10, 1281)
    train = ds.select([None, ['sa1', 'sa2']], invert=True)
    test = ds.select([None, ['sa1', 'sa2']])
    assert len(test) == 4 and len(train) == 2


def test_spec_wav_roundtrip():
    """wav → spec → wav reconstructs the waveform closely."""
    rate = vdata.audio_rate
    ts = np.arange(rate) / rate
    wav = (np.sin(2 * np.pi * 220 * ts)
           + 0.5 * np.sin(2 * np.pi * 440 * ts)).astype(np.float32)
    spec = vdata.wav_to_spec(wav, rate)
    assert spec.shape[1:] == (10, 1281)
    rec = vdata.spec_to_wav(spec, rate)
    n = min(len(wav), len(rec))
    # Ignore window edges
    err = np.abs(rec[2560:n - 2560] - wav[2560:n - 2560])
    assert err.mean() < 0.05


def _mini_args(cls, data_dir, save_dir, **over):
    defaults = dict(data_dir=data_dir, save_dir=save_dir, epochs=1,
                    eval_freq=1, save_freq=1, batch_size=4, split=10,
                    bylen=True, device="cpu", seed=1,
                    model_args="{z_dim: 16, h_dim: 16}")
    defaults.update(over)
    argv = []
    for k, v in defaults.items():
        if isinstance(v, bool):
            if v:
                argv.append("--" + k)
        else:
            argv += ["--" + k, str(v)]
    return cls.parser.parse_args(argv)


def test_weizmann_trainer_end_to_end(weizmann_dir, tmp_path):
    from multimodal_dmm_tpu.apps.weizmann import WeizmannTrainer
    save_dir = str(tmp_path / "save")
    args = _mini_args(WeizmannTrainer, weizmann_dir, save_dir)
    trainer = WeizmannTrainer(args)
    trainer.run_train(args)
    assert os.path.exists(os.path.join(save_dir, "best.pth"))
    # evaluate from checkpoint, with AVI export
    args2 = _mini_args(WeizmannTrainer, weizmann_dir, save_dir,
                       evaluate=True)
    args2.eval_sets = ["test"]
    trainer2 = WeizmannTrainer(args2)
    train_m, test_m = trainer2.run_eval(args2)
    for k in ("mse", "ssim", "m_mse", "m_ssim", "action", "person"):
        assert k in test_m, k
    assert np.isfinite(test_m["ssim"])
    assert os.path.exists(os.path.join(save_dir, "test.avi"))


def test_weizmann_dks_variant(weizmann_dir, tmp_path):
    """--method f-mask → DKS with gauss_out=False conv features."""
    from multimodal_dmm_tpu.apps.weizmann import WeizmannTrainer
    save_dir = str(tmp_path / "save")
    args = _mini_args(WeizmannTrainer, weizmann_dir, save_dir,
                      method="f-mask")
    trainer = WeizmannTrainer(args)
    assert args.model == "dks"
    trainer.run_train(args)
    assert os.path.exists(os.path.join(save_dir, "last.pth"))


def test_vidtimit_trainer_end_to_end(vidtimit_dir, tmp_path):
    from multimodal_dmm_tpu.apps.vidtimit import VidTIMITTrainer
    save_dir = str(tmp_path / "save")
    args = _mini_args(VidTIMITTrainer, vidtimit_dir, save_dir)
    trainer = VidTIMITTrainer(args)
    trainer.run_train(args)
    assert os.path.exists(os.path.join(save_dir, "best.pth"))
    args2 = _mini_args(VidTIMITTrainer, vidtimit_dir, save_dir,
                       evaluate=True)
    args2.eval_sets = ["test"]
    trainer2 = VidTIMITTrainer(args2)
    _, test_m = trainer2.run_eval(args2)
    for k in ("v_mse", "ssim", "a_mse"):
        assert k in test_m
    assert np.isfinite(test_m["a_mse"])
    assert os.path.exists(os.path.join(save_dir, "test.avi"))
    assert os.path.exists(os.path.join(save_dir, "test.wav"))
