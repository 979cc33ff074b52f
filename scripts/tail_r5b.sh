#!/bin/bash
# Consolidated round-5 tail queue (replaces tpu_perf_r5.sh +
# tpu_addendum_r5.sh + cpu_tail_r5.sh, which were killed in their wait
# loops at ~08:40 — none had started work; their stamp dirs were empty).
#
# Why the rewrite: the round ends ~14:08 UTC and the original chain
# (perf -> 3x w500 cells -> torch 500-ep seeds, with vidtimit at the
# full 500-ep protocol inside the science pipeline) cannot fit in the
# ~3.5 h that remain after the DKS precision arms. This queue fits by
#   - running vidtimit at a reduced 200-epoch protocol (labeled, same
#     reduction as the weizmann semisup/partial grids; the 500-ep
#     pipeline phase was stamped SKIPPED),
#   - running the torch b-mask basin seeds at 120 epochs — decider (a)
#     only counts basin entry, and both stacks declare the basin well
#     before epoch 100 (RESULTS S20: torch dips to ~0.6 by ep 30; stuck
#     seeds never dip below 1.4),
#   - deadline-gating every phase so the chip and the CPU are free
#     before the driver's round-end bench.
#
# Priority order if time runs short: perf benches (BENCH_r05 decision)
# > w500 cell A (epoch-starvation decider, RESULTS S22) > vidtimit
# suite train+analyze (VERDICT item 6) > w500 cells B/C > torch seeds.
#
# Usage: setsid bash scripts/tail_r5b.sh & echo $! > /tmp/tpu_perf.pid
#        (reuses the perf pid file so the watchdog keeps covering us)
set -u
cd /root/repo
STAMP_DIR=results/tail_r5b
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# Hard deadlines (UTC epoch). Round ends ~14:08.
TPU_STOP=$(date -u -d '13:20' +%s)    # last moment a TPU phase may run
VT_TRAIN_STOP=$(date -u -d '12:58' +%s)  # reserve analyze room
CPU_STOP=$(date -u -d '13:54' +%s)    # torch must be gone before bench

# Wait for the science pipeline to release the chip.
if [ -f /tmp/tpu_pipe.pid ]; then
    p=$(cat /tmp/tpu_pipe.pid)
    while kill -0 "$p" 2>/dev/null; do
        say "science pipeline (pid $p) still running; waiting 120s"
        sleep 120
    done
fi
say "chip free"

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

wait_tunnel() {
    local deadline=$(( $(date +%s) + 1800 ))
    until probe; do
        [ "$(date +%s)" -gt "$deadline" ] && return 1
        say "tunnel down; retrying in 120s"
        sleep 120
    done
    say "tunnel OK"
}

# phase NAME MAX_TMO STOP_EPOCH GATE CMD... — run once, stamp on rc=0.
# Timeout is clipped to the deadline; skipped entirely when less than
# 300 s remain before STOP_EPOCH.
phase() {
    local name=$1 tmo=$2 stop=$3 gate=$4; shift 4
    if [ -f "$STAMP_DIR/$name.done" ]; then
        say "skip $name (stamped done)"
        return 0
    fi
    local now rem
    now=$(date +%s)
    rem=$(( stop - now ))
    if [ "$rem" -lt 300 ]; then
        say "skip $name (past deadline, rem=${rem}s)"
        return 1
    fi
    [ "$tmo" -gt "$rem" ] && tmo=$rem
    if [ "$gate" = tpu ]; then wait_tunnel || return 1; fi
    say "=== $name START (tmo=${tmo}s): $*"
    timeout "$tmo" "$@" > "$STAMP_DIR/$name.log" 2>&1
    local rc=$?
    say "=== $name END rc=$rc"
    [ "$rc" -eq 0 ] && touch "$STAMP_DIR/$name.done"
    return "$rc"
}

export MDMM_BENCH_WAIT_S=600

# 1. Perf benches: the ragged-scan decision pair + warm-cache check.
phase bench_ragged       3600 "$TPU_STOP" tpu python bench.py --ragged
phase bench_default      2400 "$TPU_STOP" tpu python bench.py
phase bench_default_warm 1200 "$TPU_STOP" tpu python bench.py

# 2. weizmann 500-epoch decider cell A (seed 0 @ 30%, collapsed at 200
# ep): does the extra epoch budget lift it out of the bad basin?
phase w500_s0_l03 3600 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.3 --local_dir results \
    --exp_name weizmann_partial_500_s0_l03 \
    --config '{epochs: 500, seed: 0}' --resume

# 3. VidTIMIT 5-method suite at the reduced 200-epoch protocol
# (labeled; same reduction as the weizmann grids). Trials land
# incrementally, so analyze runs even if train hits its deadline.
phase vidtimit_train 7200 "$VT_TRAIN_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --n_repeats 1 --local_dir results --exp_name vidtimit_suite_r5 \
    --config '{epochs: 200}' --resume
phase vidtimit_analyze 2400 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --analyze --local_dir results --exp_name vidtimit_suite_r5

# 4. Remaining w500 cells if time allows.
phase w500_s2_l03 3600 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.3 --local_dir results \
    --exp_name weizmann_partial_500_s2_l03 \
    --config '{epochs: 500, seed: 2}' --resume
phase w500_s1_l06 3600 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 1 --levels 0.6 --local_dir results \
    --exp_name weizmann_partial_500_s1_l06 \
    --config '{epochs: 500, seed: 1}' --resume

# 5. Torch b-mask basin seeds 4-6 at 120 epochs (basin classification
# only — both stacks declare by ep 100; task rows are NOT comparable to
# the 500-ep n=3 table). CPU-only; runs last so it can never starve
# TPU dispatch, and stops before the driver's round-end bench.
phase ref_h2h_basin_s456 7200 "$CPU_STOP" cpu \
    python benchmarks/ref_spirals_h2h.py \
    --ref_dir /tmp/ref_patched --data_dir /tmp/ref_spirals_data \
    --out_dir results/ref_h2h_basin --epochs 120 \
    --jobs b-mask:4 b-mask:5 b-mask:6

say "tail queue complete"
