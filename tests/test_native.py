"""Native C++ data-layer kernels vs their numpy fallbacks."""

import numpy as np
import pytest

from multimodal_dmm_tpu.data import _native
from multimodal_dmm_tpu.data import multiseq as mseq


@pytest.fixture(scope="module")
def lib():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_native_pad_and_merge_matches_numpy(lib):
    rng = np.random.RandomState(0)
    seqs = [rng.randn(L, 3).astype(np.float64) for L in (7, 4, 9)]
    got = _native.pad_and_merge_f32(seqs, 9)
    ref = np.full((9, 3, 3), np.nan, np.float32)
    for i, s in enumerate(seqs):
        ref[:len(s), i] = s
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert np.isnan(got[7:, 1]).all()


def test_native_pad_multidim(lib):
    rng = np.random.RandomState(1)
    seqs = [rng.randn(L, 2, 4).astype(np.float32) for L in (5, 3)]
    got = _native.pad_and_merge_f32(seqs, 6)
    assert got.shape == (6, 2, 2, 4)
    np.testing.assert_allclose(got[:5, 0], seqs[0], rtol=1e-6)
    assert np.isnan(got[3:, 1]).all()


def test_native_resample_matches_numpy(lib):
    rng = np.random.RandomState(2)
    for L in (10, 7, 12):
        d = rng.randn(L, 3)
        got = _native.resample_avg(d, 2)
        end = 2 * (L // 2)
        avg = d[:end].reshape(-1, 2, 3).mean(1)
        if end < L:
            avg = np.concatenate([avg, d[end:].mean(0)[None]])
        np.testing.assert_allclose(got, avg, rtol=1e-12)


def test_collate_uses_native_transparently(lib):
    """seq_collate_dict output is identical regardless of backend."""
    rng = np.random.RandomState(3)
    items = []
    for L in (8, 5, 6):
        items.append({"a": rng.randn(L, 2), "length": L,
                      "id": (str(L),)})
    batch, mask, lengths, order, ids = mseq.seq_collate_dict(items)
    assert batch["a"].shape == (8, 3, 2)
    assert lengths == [8, 6, 5]
    # padding NaN in the right places
    assert np.isnan(batch["a"][6:, 1]).all()
    assert not np.isnan(batch["a"][:5, 2]).any()
