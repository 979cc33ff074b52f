#!/bin/bash
# Durable TPU work queue (round 4). The axon tunnel goes down for hours
# at a time (see CLAUDE.md / memory): this script waits for it, then
# runs the queued TPU phases in priority order, stamping each completed
# phase under results/tpu_pipeline_r4/ so a re-run (same session or a
# later one) skips finished work. Logs live next to the stamps.
#
# CPU-contention contract (CLAUDE.md: never run a CPU-heavy job next to
# a TPU suite): any long CPU job must register its PROCESS GROUP id,
# one per line, in /tmp/cpu_jobs.pgids (launch with setsid so pgid ==
# pid). This script SIGSTOPs those groups for the duration of the TPU
# phases and SIGCONTs them on exit.
#
# Usage: setsid bash scripts/tpu_pipeline.sh & echo $! > /tmp/tpu_pipe.pid
set -u
cd /root/repo
STAMP_DIR=results/tpu_pipeline_r4
mkdir -p "$STAMP_DIR"
PGID_FILE=/tmp/cpu_jobs.pgids

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((8,8)) @ jnp.ones((8,8)))
print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}

wait_tunnel() {
    local deadline=$(( $(date +%s) + ${TUNNEL_WAIT_S:-36000} ))
    until probe; do
        if [ "$(date +%s)" -gt "$deadline" ]; then
            say "tunnel never recovered within TUNNEL_WAIT_S"
            return 1
        fi
        say "tunnel down; retrying in 120s"
        sleep 120
    done
    say "tunnel OK"
}

pause_cpu() {
    [ -f "$PGID_FILE" ] || return 0
    while read -r pg; do
        [ -n "$pg" ] && kill -STOP -- "-$pg" 2>/dev/null \
            && say "SIGSTOP pgid $pg"
    done < "$PGID_FILE"
}
resume_cpu() {
    [ -f "$PGID_FILE" ] || return 0
    while read -r pg; do
        [ -n "$pg" ] && kill -CONT -- "-$pg" 2>/dev/null \
            && say "SIGCONT pgid $pg"
    done < "$PGID_FILE"
}
trap resume_cpu EXIT

# phase NAME TIMEOUT_S CMD... — run once, stamp on success.
phase() {
    local name=$1 tmo=$2; shift 2
    if [ -f "$STAMP_DIR/$name.done" ]; then
        say "skip $name (stamped done)"
        return 0
    fi
    wait_tunnel || return 1
    say "=== $name START: $*"
    timeout "$tmo" "$@" > "$STAMP_DIR/$name.log" 2>&1
    local rc=$?
    say "=== $name END rc=$rc"
    if [ "$rc" -eq 0 ]; then
        touch "$STAMP_DIR/$name.done"
    fi
    return "$rc"
}

# Don't freeze CPU work while the tunnel is still down — gate once
# here, then pause CPU jobs only for the actual TPU phases.
wait_tunnel || exit 1
pause_cpu

# 1. TPU lane tests (real-chip Pallas/bf16/fused-step checks).
MDMM_TPU=1 phase lane 2400 python -m pytest tests/ -m tpu -q

# 2. Benches. The default config exercises this round's unbenched
# levers (native layout, custom-VJP BCE, pre-flipped deconv); the arms
# quantify edge-layout cost, hardware RNG, and the DKS precision-fix
# candidate. MDMM_BENCH_WAIT_S small — the tunnel gate already ran.
export MDMM_BENCH_WAIT_S=120
phase bench_default 3600 python bench.py
phase bench_edge    3600 python bench.py --edge
phase bench_rbg     3600 python bench.py --rbg
phase bench_prec_hi 3600 python bench.py --precision highest

# 3. Finish the weizmann_partial grid (VERDICT r3 missing item 1).
# Trial 4 was cut mid-run by the tunnel outage and left no epoch
# checkpoint: a --resume would restart it while KEEPING its old
# progress rows (duplicate epochs in analysis) — delete the dir so it
# reruns clean.
if [ ! -f "$STAMP_DIR/weizmann_partial.done" ]; then
    t4="results/weizmann_partial_r4/weizmann_tune_4_seed=1,corrupt=uniform-0.0"
    if [ -d "$t4" ] && [ ! -f "$t4/last_result.json" ]; then
        rm -rf "$t4"
        say "deleted checkpoint-less interrupted trial dir: $t4"
    fi
fi
phase weizmann_partial 10800 python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 2 --levels 0 0.3 0.6 0.9 --local_dir results \
    --exp_name weizmann_partial_r4 --config '{epochs: 200}' --resume
phase weizmann_partial_analyze 600 python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --analyze --local_dir results --exp_name weizmann_partial_r4

# 4. Widen spirals_partial to the 8-level curve (VERDICT r3 missing
# item 3): r3 ran levels {0, .3, .6, .9} x seeds 0-3 x 200 epochs; run
# the 4 interleaving levels at the same protocol, then merge + analyze
# the union as one experiment.
phase spirals_partial_widen 14400 python -m multimodal_dmm_tpu.experiments.spirals_partial \
    --n_repeats 4 --levels 0.1 0.2 0.45 0.75 --local_dir results \
    --exp_name spirals_partial_r4 --config '{epochs: 200}' --resume
if [ ! -f "$STAMP_DIR/spirals_partial_merge.done" ]; then
    mkdir -p results/spirals_partial_merged_r4
fi
phase spirals_partial_merge 300 python -m multimodal_dmm_tpu.experiments.analysis \
    --merge results/spirals_partial_r3 results/spirals_partial_r4 \
    --out results/spirals_partial_merged_r4
phase spirals_partial_analyze 600 python -m multimodal_dmm_tpu.experiments.spirals_partial \
    --analyze --local_dir results --exp_name spirals_partial_merged_r4

# 5. DKS decider: b-mask on TPU at matmul_precision=highest, 3 seeds at
# the suite protocol — does CPU-equivalent contraction precision change
# the stuck-basin rate vs the r2 default-precision TPU trials?
phase dks_tpu_prec_hi 14400 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --n_repeats 3 --local_dir results --exp_name dks_tpu_prec_hi_r4 \
    --config '{method: b-mask, matmul_precision: highest}' --resume
phase dks_tpu_prec_hi_analyze 600 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --analyze --local_dir results --exp_name dks_tpu_prec_hi_r4

# 6. Stretch: VidTIMIT 6-task suite (beyond-reference; lowest
# priority). Suite defaults are the full protocol (500 epochs, anneal
# 250, 5 methods).
phase vidtimit_suite 21600 python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --n_repeats 1 --local_dir results --exp_name vidtimit_suite_r4 --resume
phase vidtimit_suite_analyze 600 python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --analyze --local_dir results --exp_name vidtimit_suite_r4

resume_cpu
say "pipeline complete"
