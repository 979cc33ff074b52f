#!/bin/bash
# Durable TPU work queue (round 5). Same contract as the r4 script
# (tunnel gating, phase stamps, CPU-job SIGSTOP contract) with two
# fixes from VERDICT r4:
#   1. Fixtures are regenerated up front (the r4 weizmann_partial grid
#      half-crashed because data/weizmann vanished with the VM image —
#      data/ is gitignored and gen_synthetic is seeded/deterministic,
#      so regeneration reproduces the identical corpus).
#   2. Sweeps now exit non-zero when any trial errored
#      (tune.exit_on_errors), so a half-failed grid can no longer be
#      stamped .done, and its analyze phase (chained with &&) never
#      runs on partial data.
#
# Priority order (VERDICT r5 items): weizmann_partial completion with
# seeds 1-3 -> DKS matmul-precision basin A/B (8 seeds default vs 8
# highest, 200-epoch protocol) -> vidTIMIT 6-task suite.
#
# Usage: setsid bash scripts/tpu_pipeline_r5.sh & echo $! > /tmp/tpu_pipe.pid
set -u
cd /root/repo
STAMP_DIR=results/tpu_pipeline_r5
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

# phase NAME TIMEOUT_S CMD... — run once, stamp on success (rc=0 only).
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

# host_phase NAME TIMEOUT_S CMD... — same, but no tunnel gate (pure
# host-side work, e.g. fixture generation).
host_phase() {
    local name=$1 tmo=$2; shift 2
    if [ -f "$STAMP_DIR/$name.done" ]; then
        say "skip $name (stamped done)"
        return 0
    fi
    say "=== $name START: $*"
    JAX_PLATFORMS=cpu timeout "$tmo" "$@" > "$STAMP_DIR/$name.log" 2>&1
    local rc=$?
    say "=== $name END rc=$rc"
    if [ "$rc" -eq 0 ]; then
        touch "$STAMP_DIR/$name.done"
    fi
    return "$rc"
}

# 0. Fixtures (deterministic seeded generators; data/ is gitignored and
# does not survive VM recycling — regenerate before anything needs it).
host_phase fixture_weizmann 600 python -m multimodal_dmm_tpu.data.weizmann \
    --synthetic --data_dir data/weizmann
host_phase fixture_vidtimit 600 python -m multimodal_dmm_tpu.data.vidtimit \
    --synthetic --data_dir data/vidTIMIT

wait_tunnel || exit 1
pause_cpu

# 1. Finish the weizmann_partial grid at n=4 seeds (VERDICT r5 item 1):
# seed 0 x 4 levels completed in r4 and resumes as done; seeds 1-3 run
# fresh (the crashed seed-1 stubs have last_result.json={} and no
# progress.csv, so --resume reruns them cleanly).
phase weizmann_partial 16000 python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --n_repeats 4 --levels 0 0.3 0.6 0.9 --local_dir results \
    --exp_name weizmann_partial_r4 --config '{epochs: 200}' --resume \
&& phase weizmann_partial_analyze 600 python -m multimodal_dmm_tpu.experiments.weizmann_partial \
    --analyze --local_dir results --exp_name weizmann_partial_r4

# 2. DKS basin decider (b), as VERDICT r5 item 4 specifies: 8 seeds at
# default matmul precision vs 8 at highest, 200-epoch suite protocol
# (the basin declares itself by then — RESULTS S20). Task-battery
# analysis included: fwd extrapolation is the basin-sensitive metric.
phase dks_prec_default 12000 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --n_repeats 8 --local_dir results --exp_name dks_prec_default_r5 \
    --config '{method: b-mask, epochs: 200}' --resume \
&& phase dks_prec_default_analyze 3600 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --analyze --local_dir results --exp_name dks_prec_default_r5
phase dks_prec_highest 12000 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --n_repeats 8 --local_dir results --exp_name dks_prec_highest_r5 \
    --config '{method: b-mask, epochs: 200, matmul_precision: highest}' --resume \
&& phase dks_prec_highest_analyze 3600 python -m multimodal_dmm_tpu.experiments.spirals_suite \
    --analyze --local_dir results --exp_name dks_prec_highest_r5

# 3. VidTIMIT suite (VERDICT r5 item 6): 1 seed x 5 methods at the full
# protocol on the synthetic corpus, then the 6-task analysis.
phase vidtimit_suite 21600 python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --n_repeats 1 --local_dir results --exp_name vidtimit_suite_r5 --resume \
&& phase vidtimit_suite_analyze 3600 python -m multimodal_dmm_tpu.experiments.vidtimit_suite \
    --analyze --local_dir results --exp_name vidtimit_suite_r5

resume_cpu
say "pipeline complete"
