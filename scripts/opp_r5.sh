#!/bin/bash
# Opportunistic round-5 extras — the scheduled queue ran ~3x faster
# than budgeted (persistent compile cache + fast trials), so the freed
# chip/CPU time goes to hardening the two weakest sample sizes in the
# DKS basin story (RESULTS S20):
#   1. bfvi basin statistics at 8 TPU seeds, 200-ep protocol
#      (decider (d) our-side: the S14 bfvi dominance claim rests on
#      n=3 per side).
#   2. bench --rbg now composed with the new ragged default.
#   3. torch basin seeds at 120 ep — b-mask 4-6 (decider (a): is
#      torch's clean record luck?) AND bfvi 4-6 (decider (d) torch
#      side). Basin entry declares well before ep 100 in both stacks;
#      120-ep task rows are NOT protocol-comparable and are only used
#      for basin counting. Replaces the tail's ref_h2h_basin_s456
#      phase (stamped SKIPPED->handled here with the bfvi jobs added).
#
# Usage: setsid bash scripts/opp_r5.sh & echo $! > /tmp/opp_r5.pid
set -u
cd /root/repo
STAMP_DIR=results/opp_r5
mkdir -p "$STAMP_DIR"

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

TPU_STOP=$(date -u -d '13:20' +%s)
CPU_STOP=$(date -u -d '13:52' +%s)

# Wait for the tail queue to finish (it owns chip then CPU).
if [ -f /tmp/tpu_perf.pid ]; then
    p=$(cat /tmp/tpu_perf.pid)
    while kill -0 "$p" 2>/dev/null; do
        say "tail queue (pid $p) still running; waiting 60s"
        sleep 60
    done
fi
say "queue free"

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

wait_tunnel() {
    local deadline=$(( $(date +%s) + 1200 ))
    until probe; do
        [ "$(date +%s)" -gt "$deadline" ] && return 1
        say "tunnel down; retrying in 120s"
        sleep 120
    done
    say "tunnel OK"
}

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

# 1. bfvi basin arm: 8 TPU seeds at the 200-ep equal-budget protocol
# (same design as the dks_prec arms; battery lands in analyze).
phase bfvi_tpu 5400 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --n_repeats 8 --local_dir results --exp_name dks_bfvi_tpu_r5 \
    --config '{method: bfvi, epochs: 200}' --resume
phase bfvi_tpu_analyze 2400 "$TPU_STOP" tpu \
    python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --analyze --local_dir results --exp_name dks_bfvi_tpu_r5

# 2. ragged + hardware RNG composition (ragged is the default now).
phase bench_ragged_rbg 1800 "$TPU_STOP" tpu python bench.py --rbg

# 3. Torch basin seeds, both methods, 120 ep (basin counting only).
phase ref_h2h_basin 9000 "$CPU_STOP" cpu \
    python benchmarks/ref_spirals_h2h.py \
    --ref_dir /tmp/ref_patched --data_dir /tmp/ref_spirals_data \
    --out_dir results/ref_h2h_basin --epochs 120 \
    --jobs b-mask:4 b-mask:5 b-mask:6 bfvi:4 bfvi:5 bfvi:6

say "opportunistic queue complete"
