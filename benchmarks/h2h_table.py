"""Merge our spirals suite task CSV with the patched-reference h2h CSV
into one side-by-side markdown table (RESULTS.md material).

Usage: python benchmarks/h2h_table.py \
    [--ours results/spirals_suite_r2/task_results.csv] \
    [--ref /tmp/ref_h2h/task_results.csv]
"""

import argparse
import csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours",
                    default="results/spirals_suite_r2/task_results.csv")
    ap.add_argument("--ref", default="/tmp/ref_h2h/task_results.csv")
    args = ap.parse_args()

    tasks = ["recon", "half", "fwd", "bwd", "condgen"]
    ours = {}
    with open(args.ours) as f:
        for row in csv.DictReader(f):
            ours[row["method"]] = {t: float(row[t]) for t in tasks}
    ref = {}
    with open(args.ref) as f:
        for row in csv.DictReader(f):
            ref[row["method"]] = {t: float(row[t]) for t in tasks}

    print("| method | impl | " + " | ".join(tasks) + " |")
    print("|---|---|" + "---|" * len(tasks))
    for m in sorted(set(ours) | set(ref)):
        if m in ref:
            print(f"| {m} | reference (torch, seed 1) | "
                  + " | ".join(f"{ref[m][t]:.3f}" for t in tasks) + " |")
        if m in ours:
            print(f"| {m} | ours (TPU, 3-seed mean) | "
                  + " | ".join(f"{ours[m][t]:.3f}" for t in tasks) + " |")


if __name__ == "__main__":
    main()
