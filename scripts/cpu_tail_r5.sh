#!/bin/bash
# Optional round-5 CPU tail — runs only if wall-clock remains after the
# addendum queue. Two opportunistic DKS-basin items (RESULTS §20):
#   - probe F: bfvi basin statistics at 4 CPU seeds (decider (d); the
#     r4 run died with the session and left no artifacts)
#   - torch b-mask seeds 7-8 (extends decider (a) n if it's close)
# Every trial/seed lands incrementally; an unfinished phase just has no
# stamp and partial per-trial state.
#
# Usage: setsid bash scripts/cpu_tail_r5.sh & echo $! > /tmp/cpu_tail.pid
set -u
cd /root/repo
STAMP_DIR=results/cpu_tail_r5
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

for f in /tmp/tpu_pipe.pid /tmp/tpu_perf.pid /tmp/tpu_add.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f")
    while kill -0 "$p" 2>/dev/null; do
        say "waiting on $f (pid $p); sleep 180"
        sleep 180
    done
done
say "CPU free"

phase() {
    local name=$1 tmo=$2; shift 2
    if [ -f "$STAMP_DIR/$name.done" ]; then
        say "skip $name (stamped done)"
        return 0
    fi
    say "=== $name START: $*"
    timeout "$tmo" "$@" > "$STAMP_DIR/$name.log" 2>&1
    local rc=$?
    say "=== $name END rc=$rc"
    [ "$rc" -eq 0 ] && touch "$STAMP_DIR/$name.done"
    return "$rc"
}

phase probe_f 14400 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --n_repeats 4 --local_dir results --exp_name dks_probe_f_r5 \
    --config '{method: bfvi, device: cpu, no_skip_nonfinite: true}' --resume

phase ref_h2h_s78 14400 python benchmarks/ref_spirals_h2h.py \
    --ref_dir /tmp/ref_patched --data_dir /tmp/ref_spirals_data \
    --out_dir results/ref_h2h \
    --jobs b-mask:7 b-mask:8

say "cpu tail complete"
