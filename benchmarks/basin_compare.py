"""Budget-matched basin comparison: our TPU suite arms vs the torch
reference at the same epoch budget.

Our side: per-seed best-eval-by-epoch-E from each trial's progress.csv
(eval composite MSE every eval_freq epochs — the suite's mean_loss).
Torch side: the same quantity parsed from ref_spirals_h2h train logs
(the reference's run_eval prints an `MSE: x +-y` line at every
eval_freq epochs during training; spirals.py --epochs E).

Usage:
  python benchmarks/basin_compare.py \
      --ours results/dks_prec_default_r5 results/dks_bfvi_tpu_r5 \
      --torch_dir results/ref_h2h_200 --epochs 200

Prints per-seed rows for every arm plus rank-sum tests between each
our-arm and the torch seeds of the matching method (method matched by
the `method` key in the trial's params.json vs the torch log tag).
"""

import argparse
import glob
import json
import os
import re

import pandas as pd

MSE_RE = re.compile(r"MSE:\s*([0-9.eE+-]+)\s*\+-")


def ours_best_eval(exp_dir, epochs):
    rows = []
    for d in sorted(glob.glob(os.path.join(exp_dir, "*_tune_*"))):
        pcsv = os.path.join(d, "progress.csv")
        pjson = os.path.join(d, "params.json")
        if not (os.path.exists(pcsv) and os.path.exists(pjson)):
            continue
        cfg = json.load(open(pjson))
        df = pd.read_csv(pcsv)
        sub = df[df.training_iteration <= epochs]
        if not len(sub):
            continue
        rows.append(dict(stack="ours", method=cfg.get("method", "?"),
                         seed=cfg.get("seed"),
                         best_eval=float(sub.mean_loss.min())))
    return rows


def torch_best_eval(torch_dir):
    """One row per <method>_s<seed>_train.log: min of the training-time
    eval MSE lines (the reference evaluates on the validation split
    every eval_freq epochs; best-by-budget = min over the log)."""
    rows = []
    for log in sorted(glob.glob(os.path.join(torch_dir,
                                             "*_train.log"))):
        tag = os.path.basename(log)[:-len("_train.log")]
        method, _, seed = tag.rpartition("_s")
        mses = [float(m.group(1)) for m in
                map(MSE_RE.search, open(log, errors="replace"))
                if m]
        if not mses:
            continue
        rows.append(dict(stack="torch", method=method, seed=int(seed),
                         best_eval=min(mses)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", nargs="+", required=True)
    ap.add_argument("--torch_dir", required=True)
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()

    rows = []
    for d in args.ours:
        rows += ours_best_eval(d, args.epochs)
    rows += torch_best_eval(args.torch_dir)
    df = pd.DataFrame(rows)
    if not len(df):
        print("no data found")
        return
    print(df.sort_values(["method", "stack", "seed"])
            .to_string(index=False))

    try:
        from scipy.stats import mannwhitneyu
    except ImportError:
        return
    for method in sorted(df.method.unique()):
        a = df[(df.method == method) & (df["stack"] == "ours")].best_eval
        b = df[(df.method == method) & (df["stack"] == "torch")].best_eval
        if len(a) >= 2 and len(b) >= 2:
            u = mannwhitneyu(a, b)
            print(f"{method}: ours n={len(a)} mean={a.mean():.3f} "
                  f"vs torch n={len(b)} mean={b.mean():.3f} "
                  f"MWU p={u.pvalue:.3f}")
        else:
            print(f"{method}: insufficient n for a test "
                  f"(ours {len(a)}, torch {len(b)})")


if __name__ == "__main__":
    main()
