"""Tests for the multiseq data engine: generation, loading, resampling,
collation round-trips, corruption and deletion ops."""

import numpy as np
import pytest

from multimodal_dmm_tpu.data import multiseq as mseq
from multimodal_dmm_tpu.data.spirals import SpiralsDataset, gen_dataset


@pytest.fixture(scope="session")
def spirals_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spirals")
    gen_dataset(n_examples=20, n_train=12, timesteps=50, data_dir=str(d))
    return str(d)


def test_spirals_generation_and_loading(spirals_dir):
    train = SpiralsDataset(["spiral-x", "spiral-y"], spirals_dir, "train",
                           truncate=True, item_as_dict=True)
    test = SpiralsDataset(["spiral-x", "spiral-y"], spirals_dir, "test",
                          truncate=True, item_as_dict=True)
    assert len(train) == 12 and len(test) == 8
    item = train[0]
    assert item["spiral-x"].shape == (50, 1)
    assert item["spiral-y"].shape == (50, 1)
    assert item["metadata"].shape == (50, 6)
    assert item["length"] == 50


def test_generation_is_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    gen_dataset(n_examples=6, n_train=4, timesteps=10, data_dir=d1)
    gen_dataset(n_examples=6, n_train=4, timesteps=10, data_dir=d2)
    a = SpiralsDataset(["spiral-x"], d1, "train")
    b = SpiralsDataset(["spiral-x"], d2, "train")
    for i in range(len(a)):
        np.testing.assert_array_equal(a.data["spiral-x"][i],
                                      b.data["spiral-x"][i])


def test_collate_sorts_and_restores_order(spirals_dir):
    ds = SpiralsDataset(["spiral-x", "spiral-y"], spirals_dir, "train",
                        truncate=True, item_as_dict=True)
    items = [ds[i] for i in range(5)]
    # Fake unequal lengths by slicing
    for k, item in enumerate(items):
        L = 50 - 7 * k
        for m in ("spiral-x", "spiral-y", "metadata"):
            item[m] = item[m][:L]
        item["length"] = L
    batch, mask, lengths, order, ids = mseq.seq_collate_dict(items)
    assert lengths == sorted(lengths, reverse=True)
    assert batch["spiral-x"].shape == (50, 5, 1)
    assert mask.shape == (50, 5, 1)
    # NaN padding beyond length
    assert np.all(np.isnan(batch["spiral-x"][lengths[-1]:, -1]))
    # Decollate returns original order and lengths
    dec = mseq.seq_decoll_dict(batch, lengths, order)
    orig_lengths = [50 - 7 * k for k in range(5)]
    assert [len(s) for s in dec["spiral-x"]] == orig_lengths


def test_len_to_mask_and_extent():
    mask = mseq.len_to_mask([4, 2])
    assert mask.shape == (4, 2, 1)
    assert mask[:, 0, 0].tolist() == [True] * 4
    assert mask[:, 1, 0].tolist() == [True, True, False, False]
    m = np.zeros((6, 2, 1), bool)
    m[1:4, 0] = True
    m[2:3, 1] = True
    t_start, t_stop = mseq.mask_to_extent(m)
    assert t_start.tolist() == [1, 2]
    assert t_stop.tolist() == [3, 2]


def test_resample_downsample_and_upsample():
    d = np.arange(10, dtype=float).reshape(10, 1)
    down = mseq.resample_to_base(d, 2.0)
    np.testing.assert_allclose(down[:, 0], [0.5, 2.5, 4.5, 6.5, 8.5])
    d7 = np.arange(7, dtype=float).reshape(7, 1)
    down7 = mseq.resample_to_base(d7, 2.0)  # 3 pairs + remainder mean
    np.testing.assert_allclose(down7[:, 0], [0.5, 2.5, 4.5, 6.0])
    up = mseq.resample_to_base(d, 0.5)
    assert len(up) == 20
    np.testing.assert_allclose(up[:4, 0], [0, 0, 1, 1])


def test_corrupt_modes(spirals_dir):
    np.random.seed(0)
    ds = SpiralsDataset(["spiral-x", "spiral-y"], spirals_dir, "train",
                        truncate=True, item_as_dict=True)
    cor = ds.corrupt(0.5, mode="uniform", modalities=["spiral-x"])
    fr = np.mean([np.isnan(a).mean() for a in cor.data["spiral-x"]])
    assert abs(fr - 0.5) < 0.02
    assert not any(np.isnan(a).any() for a in cor.data["spiral-y"])
    # burst: contiguous NaN run
    burst = ds.corrupt(0.3, mode="burst", modalities=["spiral-x"])
    a = burst.data["spiral-x"][0][:, 0]
    nan_idx = np.where(np.isnan(a))[0]
    if len(nan_idx) > 1:
        assert np.all(np.diff(nan_idx) == 1)
    # all_none: whole modality missing sometimes
    semi = ds.corrupt(1.0, mode="all_none", modalities=["spiral-y"])
    assert all(np.isnan(a).all() for a in semi.data["spiral-y"])
    # original untouched
    assert not any(np.isnan(a).any() for a in ds.data["spiral-x"])


def test_split_and_select_and_merge(spirals_dir):
    ds = SpiralsDataset(["spiral-x", "spiral-y"], spirals_dir, "train",
                        truncate=True, item_as_dict=True)
    chunks = ds.split(25, n_is_len=True)
    assert len(chunks) == len(ds) * 2
    assert all(l == 25 for l in chunks.lengths)
    bynum = ds.split(5, n_is_len=False)
    assert len(bynum) == len(ds) * 5

    ids = [ds.seq_ids[0][0], ds.seq_ids[1][0]]
    sel = ds.select([ids])
    assert len(sel) == 2
    inv = ds.select([ids], invert=True)
    assert len(inv) == len(ds) - 2

    merged = mseq.MultiseqDataset.merge(sel, inv)
    assert len(merged) == len(ds)


def test_normalize(spirals_dir):
    ds = SpiralsDataset(["spiral-x"], spirals_dir, "train",
                        truncate=True, item_as_dict=True)
    norm = ds.normalize(modalities=["spiral-x"])
    allx = np.concatenate(norm.data["spiral-x"], 0)
    assert abs(np.nanmean(allx)) < 1e-6
    assert abs(np.nanstd(allx) - 1.0) < 1e-3
    rng = ds.normalize(modalities=["spiral-x"], method="range")
    allr = np.concatenate(rng.data["spiral-x"], 0)
    assert np.nanmax(allr) <= 1.0 + 1e-9
    assert np.nanmin(allr) >= -1.0 - 1e-9


def test_deletion_ops():
    np.random.seed(1)
    T, B = 20, 4
    batch = {"a": np.random.randn(T, B, 2).astype(np.float32)}
    lengths = [20, 18, 15, 10]

    rd = mseq.rand_delete(batch, 0.5, lengths)
    for b in range(B):
        n_nan = np.isnan(rd["a"][:lengths[b], b, 0]).sum()
        assert n_nan == int(0.5 * lengths[b])

    ks = mseq.keep_segment(batch, 0.25, 0.75, lengths)
    for b in range(B):
        L = lengths[b]
        t0, t1 = int(0.25 * L), int(0.75 * L)
        assert np.all(np.isnan(ks["a"][:t0, b]))
        assert not np.any(np.isnan(ks["a"][t0:t1, b]))

    dl = mseq.del_segment(batch, 0.25, 0.75, lengths)
    for b in range(B):
        L = lengths[b]
        t0, t1 = int(0.25 * L), int(0.75 * L)
        assert np.all(np.isnan(dl["a"][t0:t1, b]))
        assert not np.any(np.isnan(dl["a"][:t0, b]))

    bd = mseq.burst_delete(batch, 0.2, lengths)
    for b in range(B):
        nan_idx = np.where(np.isnan(bd["a"][:lengths[b], b, 0]))[0]
        if len(nan_idx) > 1:
            assert np.all(np.diff(nan_idx) == 1)

    # Input batch must not be mutated
    assert not np.any(np.isnan(batch["a"]))


def test_seq_collate_batch_larger_than_modalities():
    """Regression: tuple-form seq_collate's lengths vector is
    per-SEQUENCE (reference multiseq.py:359 zeroes len(data) entries —
    the batch size — despite the `n_modalities` name). A 10-item batch
    of 4-modality items used to raise a broadcast error."""
    from multimodal_dmm_tpu.data.multiseq import seq_collate
    rng = np.random.RandomState(0)
    items = []
    for i in range(10):
        t = 5 + i
        items.append(tuple(rng.rand(t, d) for d in (3, 1, 2, 2)))
    out = seq_collate(items)
    *mods, mask, lengths = out
    assert len(mods) == 4
    assert lengths == sorted(lengths, reverse=True)
    assert lengths == list(range(14, 4, -1))
    for m in mods:
        assert m.shape[:2] == (14, 10)
    assert mask.shape[:2] == (14, 10)
