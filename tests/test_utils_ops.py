"""Tests for small shared utilities: anneal schedule, CCC."""

import numpy as np

from multimodal_dmm_tpu.ops.schedules import anneal
from multimodal_dmm_tpu.ops.metrics import eval_ccc


def test_anneal_linear_ramp():
    assert anneal(0.0, 1.0, 0, 100) == 0.0
    assert abs(anneal(0.0, 1.0, 50, 100) - 0.5) < 1e-12
    assert anneal(0.0, 1.0, 100, 100) == 1.0
    assert anneal(0.0, 1.0, 250, 100) == 1.0
    assert abs(anneal(0.2, 0.8, 30, 60) - 0.5) < 1e-12


def test_ccc_perfect_and_anticorrelated():
    rng = np.random.RandomState(0)
    y = rng.randn(200)
    assert abs(eval_ccc(y, y) - 1.0) < 1e-9
    assert eval_ccc(y, -y) < 0
    # Shift penalizes CCC even at perfect correlation
    assert eval_ccc(y, y + 2.0) < 0.5
