"""Evaluation metric utilities (CCC; SSIM lives in ops/ssim.py).

Reference: /root/reference/utils.py:14-22.
"""

import numpy as np


def eval_ccc(y_true, y_pred):
    """Concordance correlation coefficient (host-side, numpy)."""
    true_mean = np.mean(y_true)
    true_var = np.var(y_true)
    pred_mean = np.mean(y_pred)
    pred_var = np.var(y_pred)
    covar = np.cov(y_true, y_pred, bias=True)[0][1]
    ccc = 2 * covar / (true_var + pred_var + (pred_mean - true_mean) ** 2)
    return ccc
