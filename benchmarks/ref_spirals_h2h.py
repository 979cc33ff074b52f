"""Head-to-head driver: run the patched PyTorch reference through the
spirals suite protocol (train 500 epochs at lr 5e-3, pick best.pth by
eval MSE, evaluate the 5-task suite) for selected methods, writing a
task_results.csv comparable to our experiments.spirals_suite output.

The reference lives outside this repo (default /tmp/ref_patched — a copy
of ztangent/multimodal-dmm patched only for torch-2.x bool semantics);
this script only shells out to it. Task flag sets mirror
/root/reference/experiments/spirals_suite.py:157-169.
"""

import argparse
import csv
import os
import re
import subprocess
import sys

TASKS = {
    'recon': ['--drop_frac', '0.0', '--start_frac', '0.0',
              '--stop_frac', '1.0'],
    'half': ['--drop_frac', '0.5', '--start_frac', '0.0',
             '--stop_frac', '1.0'],
    'fwd': ['--drop_frac', '0.0', '--start_frac', '0.0',
            '--stop_frac', '0.75'],
    'bwd': ['--drop_frac', '0.0', '--start_frac', '0.25',
            '--stop_frac', '1.0'],
    'condgen': ['--drop_frac', '0.0', '--start_frac', '0.0',
                '--stop_frac', '0.25', '--keep_mods', 'spiral-x'],
}

MSE_RE = re.compile(r"MSE:\s*([0-9.eE+-]+)\s*\+-([0-9.eE+-]+)")


def run(cmd, cwd, log):
    with open(log, "a") as f:
        f.write("\n$ " + " ".join(cmd) + "\n")
        f.flush()
        proc = subprocess.run(cmd, cwd=cwd, stdout=f,
                              stderr=subprocess.STDOUT)
    return proc.returncode


def last_test_mse(log):
    """The reference's run_eval prints --Training-- then --Testing--
    evaluation lines; take the final (test) MSE."""
    mses = []
    for line in open(log):
        m = MSE_RE.search(line)
        if m:
            mses.append((float(m.group(1)), float(m.group(2))))
    return mses[-1] if mses else (float("nan"), float("nan"))


def read_existing(csv_path):
    """Load prior rows so re-runs resume instead of redoing trials."""
    rows = []
    if os.path.exists(csv_path):
        with open(csv_path, newline='') as f:
            for r in csv.DictReader(f):
                rows.append(dict(r))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ref_dir', default='/tmp/ref_patched')
    ap.add_argument('--data_dir', default='/tmp/ref_spirals_data')
    ap.add_argument('--out_dir', default='/tmp/ref_h2h')
    ap.add_argument('--jobs', nargs='+', default=['b-mask:1', 'bfvi:2'],
                    help='priority-ordered method:seed pairs')
    ap.add_argument('--epochs', type=int, default=500)
    ap.add_argument('--lr', type=str, default='5e-3')
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    csv_path = os.path.join(args.out_dir, 'task_results.csv')
    rows = read_existing(csv_path)
    done = {(r['method'], str(r.get('seed', '1'))) for r in rows}
    for job in args.jobs:
        method, seed = job.rsplit(':', 1)
        if (method, seed) in done:
            print(f"{job}: already in task_results.csv, skipping",
                  flush=True)
            continue
        tag = f"{method}_s{seed}"
        save_dir = os.path.join(args.out_dir, tag)
        os.makedirs(save_dir, exist_ok=True)
        train_log = os.path.join(args.out_dir, f"{tag}_train.log")
        best = os.path.join(save_dir, 'best.pth')
        if not os.path.exists(best):
            rc = run([sys.executable, 'spirals.py', '--method', method,
                      '--lr', args.lr, '--epochs', str(args.epochs),
                      '--seed', seed,
                      '--data_dir', args.data_dir,
                      '--save_dir', save_dir],
                     args.ref_dir, train_log)
            print(f"{tag}: train rc={rc}", flush=True)
        if not os.path.exists(best):
            print(f"{tag}: no best.pth, skipping tasks", flush=True)
            continue
        row = {'method': method, 'seed': seed}
        for task, flags in TASKS.items():
            task_log = os.path.join(args.out_dir, f"{tag}_{task}.log")
            open(task_log, "w").close()
            rc = run([sys.executable, 'spirals.py', '--method', method,
                      '--evaluate', '--load', best,
                      '--data_dir', args.data_dir,
                      '--save_dir', save_dir] + flags,
                     args.ref_dir, task_log)
            mse, std = last_test_mse(task_log)
            row[task] = mse
            row[task + '_std'] = std
            print(f"{tag}/{task}: MSE {mse} +-{std} (rc={rc})",
                  flush=True)
        rows.append(row)
        done.add((method, seed))
        # Write incrementally so partial results survive.
        keys = (['method', 'seed'] +
                [k for t in TASKS for k in (t, t + '_std')])
        with open(csv_path, 'w', newline='') as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for r in rows:
                w.writerow({k: r.get(k, '') for k in keys})


if __name__ == '__main__':
    main()
