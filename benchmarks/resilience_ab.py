"""Resilience A/B at protocol scale (VERDICT r1 item 8).

Runs matched-seed training pairs with the numerical-resilience stack ON
(default: non-finite updates skipped via apply_if_finite + precision
floor) and OFF (--no_skip_nonfinite), at the experiment suites'
protocol, and tabulates the converged eval metrics — evidence that the
resilience stack does not shift converged quality, it only removes the
kill-the-run failure mode.

Spirals: suite protocol (lr 5e-3, 500 epochs, batch 100).
Weizmann: suite protocol (lr 5e-4, 500 epochs, kld_anneal 250),
synthetic fixture.

Writes one CSV (dataset, seed, variant, best_metric, best_epoch,
n_nonfinite_epochs, completed) and prints a pivot table.
"""

import argparse
import csv
import os
import re
import subprocess
import sys

EVAL_RE = re.compile(
    r"Evaluation\s+KLD:\s*[0-9.eE+-]+\s+Recon:\s*[0-9.eE+-nainf]+"
    r"\s+(MSE|SSIM):\s*([0-9.eE+-]+|nan)", re.IGNORECASE)
NAN_RE = re.compile(r"nan", re.IGNORECASE)


def run_one(app, flags, log_path, repo):
    cmd = [sys.executable, app] + flags
    with open(log_path, "w") as f:
        f.write("$ " + " ".join(cmd) + "\n")
        f.flush()
        rc = subprocess.run(cmd, cwd=repo, stdout=f,
                            stderr=subprocess.STDOUT).returncode
    return rc


def parse_log(log_path, better):
    """best (min for mse / max for ssim) over printed eval lines."""
    vals, nonfinite = [], 0
    for line in open(log_path):
        m = EVAL_RE.search(line)
        if m:
            v = m.group(2)
            if v == "nan" or v == "NaN":
                nonfinite += 1
            else:
                vals.append(float(v))
        elif "Loss:" in line and NAN_RE.search(line.split("Loss:")[-1]):
            nonfinite += 1
    if not vals:
        return float("nan"), -1, nonfinite
    best = (min if better == "min" else max)(vals)
    return best, vals.index(best), nonfinite


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="results/resilience_ab")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--datasets", nargs="+",
                    default=["spirals", "weizmann"])
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []

    configs = {
        "spirals": {
            "app": "spirals.py",
            "flags": ["--lr", "5e-3", "--epochs", str(args.epochs),
                      "--data_dir", "data/spirals"],
            "better": "min",
        },
        "weizmann": {
            "app": "weizmann.py",
            "flags": ["--lr", "5e-4", "--epochs", str(args.epochs),
                      "--kld_anneal", "250",
                      "--data_dir", "data/weizmann",
                      "--modalities", "video", "mask", "action",
                      "--drop_mods", "mask", "action"],
            "better": "max",
        },
    }

    for ds in args.datasets:
        cfg = configs[ds]
        for seed in args.seeds:
            for variant, extra in (("resilient", []),
                                   ("no_skip", ["--no_skip_nonfinite"])):
                tag = f"{ds}_s{seed}_{variant}"
                save = os.path.join(args.out_dir, tag + "_save")
                log = os.path.join(args.out_dir, tag + ".log")
                rc = run_one(cfg["app"],
                             cfg["flags"] + extra +
                             ["--seed", str(seed), "--save_dir", save],
                             log, repo)
                best, best_i, nonf = parse_log(log, cfg["better"])
                rows.append({
                    "dataset": ds, "seed": seed, "variant": variant,
                    "best_metric": best, "best_eval_idx": best_i,
                    "n_nonfinite": nonf, "rc": rc,
                })
                print(rows[-1], flush=True)
                with open(os.path.join(args.out_dir, "ab_results.csv"),
                          "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=list(rows[0]))
                    w.writeheader()
                    w.writerows(rows)

    # Pivot summary.
    print("\ndataset seed  resilient        no_skip")
    by = {(r["dataset"], r["seed"]): {} for r in rows}
    for r in rows:
        by[(r["dataset"], r["seed"])][r["variant"]] = r
    for (ds, seed), pair in sorted(by.items()):
        a = pair.get("resilient", {})
        b = pair.get("no_skip", {})
        print(f"{ds:9s} {seed}  "
              f"{a.get('best_metric', float('nan')):.4f}"
              f" (nf={a.get('n_nonfinite', '?')})   "
              f"{b.get('best_metric', float('nan')):.4f}"
              f" (nf={b.get('n_nonfinite', '?')})")


if __name__ == "__main__":
    main()
