#!/bin/bash
# Round-5 tail queue. Runs after the perf script releases the chip.
#
# 1. weizmann_partial 500-epoch decider cells: the 200-epoch grid shows
#    basin bimodality at 30% deletion (seed 1 escapes at ~ep 90 and
#    reaches SSIM 0.74; seeds 0/2 plateau at ~0.15-0.23) and universal
#    collapse at 60%+. The reference protocol is 500 epochs
#    (/root/reference/weizmann.py:42) — these cells decide whether the
#    collapse is an epoch-budget artifact of our reduced protocol:
#      A: seed 0 @ 30%  (collapsed at 200 ep)
#      B: seed 2 @ 30%  (collapsed at 200 ep)
#      C: seed 1 @ 60%  (collapsed at 200 ep)
# 2. Torch reference b-mask seeds 4-6 (DKS basin decider (a), VERDICT
#    r5 item 4): CPU-only, runs last when the chip is idle so it cannot
#    starve TPU dispatch on this 1-core box.
#
# Usage: setsid bash scripts/tpu_addendum_r5.sh & echo $! > /tmp/tpu_add.pid
set -u
cd /root/repo
STAMP_DIR=results/tpu_addendum_r5
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# Wait for the perf queue (which itself waits for the science pipeline).
for f in /tmp/tpu_pipe.pid /tmp/tpu_perf.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f")
    while kill -0 "$p" 2>/dev/null; do
        say "waiting on $f (pid $p); sleep 120"
        sleep 120
    done
done
say "chip free"

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

wait_tunnel() {
    local deadline=$(( $(date +%s) + 36000 ))
    until probe; do
        [ "$(date +%s)" -gt "$deadline" ] && return 1
        say "tunnel down; retrying in 120s"
        sleep 120
    done
    say "tunnel OK"
}

phase() {
    local name=$1 tmo=$2 gate=$3; shift 3
    if [ -f "$STAMP_DIR/$name.done" ]; then
        say "skip $name (stamped done)"
        return 0
    fi
    if [ "$gate" = tpu ]; then wait_tunnel || return 1; fi
    say "=== $name START: $*"
    timeout "$tmo" "$@" > "$STAMP_DIR/$name.log" 2>&1
    local rc=$?
    say "=== $name END rc=$rc"
    [ "$rc" -eq 0 ] && touch "$STAMP_DIR/$name.done"
    return "$rc"
}

# 1. The three 500-epoch decider cells (each its own exp so the scalar
# seed override cannot collide trial dirs).
phase w500_s0_l03 7200 tpu python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.3 --local_dir results \
    --exp_name weizmann_partial_500_s0_l03 \
    --config '{epochs: 500, seed: 0}' --resume
phase w500_s2_l03 7200 tpu python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.3 --local_dir results \
    --exp_name weizmann_partial_500_s2_l03 \
    --config '{epochs: 500, seed: 2}' --resume
phase w500_s1_l06 7200 tpu python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.6 --local_dir results \
    --exp_name weizmann_partial_500_s1_l06 \
    --config '{epochs: 500, seed: 1}' --resume

# 2. Torch b-mask seeds 4-6 (CPU; chip idle now). Incremental CSV —
# each seed lands in results/ref_h2h/task_results.csv as it finishes.
phase ref_h2h_s456 28800 cpu python benchmarks/ref_spirals_h2h.py \
    --ref_dir /tmp/ref_patched --data_dir /tmp/ref_spirals_data \
    --out_dir results/ref_h2h \
    --jobs b-mask:4 b-mask:5 b-mask:6

say "addendum complete"
