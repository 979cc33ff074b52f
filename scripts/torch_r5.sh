#!/bin/bash
# Budget-matched torch basin runs (round 5, replaces the 120-ep
# ref_h2h_basin phase in opp_r5.sh — see its stamp note): the 200-ep
# default-arm logs show train loss dips to 0.3-0.6 on EVERY seed, good
# and fwd-bad alike, so a 120-ep train-loss dip cannot classify basin
# membership. What CAN be compared cleanly is the budget-matched
# distribution: torch at the SAME 200-epoch budget as the
# dks_prec_default_r5 / dks_bfvi_tpu_r5 arms, using the per-10-epoch
# eval MSE lines both stacks print, plus the end-of-run task battery.
# Jobs are priority-ordered and land incrementally in
# results/ref_h2h_200/task_results.csv; the CPU deadline cuts the list
# wherever it cuts.
#
# Usage: setsid bash scripts/torch_r5.sh & echo $! > /tmp/torch_r5.pid
set -u
cd /root/repo
STAMP_DIR=results/torch_r5
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

CPU_STOP=$(date -u -d '13:52' +%s)

# Wait for the opportunistic queue (chip phases) to finish.
if [ -f /tmp/opp_r5.pid ]; then
    p=$(cat /tmp/opp_r5.pid)
    while kill -0 "$p" 2>/dev/null; do
        say "opp queue (pid $p) still running; waiting 60s"
        sleep 60
    done
fi
say "CPU free"

now=$(date +%s)
tmo=$(( CPU_STOP - now ))
if [ "$tmo" -lt 600 ]; then
    say "no room left before CPU_STOP; exiting"
    exit 0
fi
say "=== ref_h2h_200 START (tmo=${tmo}s)"
timeout "$tmo" python benchmarks/ref_spirals_h2h.py \
    --ref_dir /tmp/ref_patched --data_dir /tmp/ref_spirals_data \
    --out_dir results/ref_h2h_200 --epochs 200 \
    --jobs b-mask:4 b-mask:5 b-mask:6 bfvi:4 bfvi:5 bfvi:6 \
    > "$STAMP_DIR/ref_h2h_200.log" 2>&1
say "=== ref_h2h_200 END rc=$?"
say "torch queue complete"
