#!/bin/bash
# Round-5 perf measurement queue. Waits for the science pipeline
# (tpu_pipeline_r5.sh, pid in /tmp/tpu_pipe.pid) to release the chip,
# then benches the round's perf levers. Stamp-gated like the pipeline.
#
# Usage: setsid bash scripts/tpu_perf_r5.sh & echo $! > /tmp/tpu_perf.pid
set -u
cd /root/repo
STAMP_DIR=results/tpu_perf_r5
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# Wait for the science pipeline to exit (chip owner).
if [ -f /tmp/tpu_pipe.pid ]; then
    p=$(cat /tmp/tpu_pipe.pid)
    while kill -0 "$p" 2>/dev/null; do
        say "science pipeline (pid $p) still running; waiting 120s"
        sleep 120
    done
fi
say "chip free"

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

export MDMM_BENCH_WAIT_S=600

# 1. Ragged two-mode scan vs the current default (the round's main
# structural scan lever).
phase bench_ragged  3600 python bench.py --ragged
phase bench_default 3600 python bench.py

# 2. Warm-cache cold-start measurement (VERDICT r4 stretch #7): the
# second identical invocation must compile from the persistent cache.
phase bench_default_warm 1800 python bench.py

# 3. Ragged + hardware RNG (the two small wins compose?).
phase bench_ragged_rbg 3600 python bench.py --ragged --rbg

say "perf queue complete"
