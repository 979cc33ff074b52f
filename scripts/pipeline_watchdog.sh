#!/bin/bash
# Watchdog: if any descendant of the round's pipeline scripts sits in a
# stopped (T) state, SIGCONT its process group. Round 5 incident: the
# weizmann_partial sweep subtree was SIGSTOPped at 06:37 by a dying
# session and sat frozen 43 min until manually resumed. This guards the
# unattended queue against a recurrence.
#
# Only touches descendants of the pids in /tmp/tpu_pipe.pid and
# /tmp/tpu_perf.pid — never pattern-matches, never resumes the CPU jobs
# the pipeline itself deliberately pauses via /tmp/cpu_jobs.pgids.
#
# Usage: setsid bash scripts/pipeline_watchdog.sh & echo $! > /tmp/watchdog.pid
set -u

descendants() {  # echo all descendant pids of $1
    local kids
    kids=$(ps -o pid= --ppid "$1" 2>/dev/null)
    for k in $kids; do
        echo "$k"
        descendants "$k"
    done
}

paused_pgids() {  # pgids the pipeline paused on purpose
    [ -f /tmp/cpu_jobs.pgids ] && cat /tmp/cpu_jobs.pgids || true
}

while :; do
    alive=0
    for f in /tmp/tpu_pipe.pid /tmp/tpu_perf.pid /tmp/tpu_add.pid; do
        [ -f "$f" ] || continue
        root=$(cat "$f")
        kill -0 "$root" 2>/dev/null || continue
        alive=1
        skip=$(paused_pgids)
        for pid in $(descendants "$root"); do
            st=$(ps -o stat= -p "$pid" 2>/dev/null)
            case "$st" in
            T*)
                pg=$(ps -o pgid= -p "$pid" 2>/dev/null | tr -d ' ')
                [ -n "$pg" ] || continue
                if ! grep -qx "$pg" <<< "$skip"; then
                    kill -CONT -- "-$pg" 2>/dev/null \
                        && echo "[$(date -u +%H:%M:%S)] CONT pgid $pg (pid $pid was $st)"
                fi
                ;;
            esac
        done
    done
    [ "$alive" -eq 0 ] && { echo "[$(date -u +%H:%M:%S)] no pipelines left; exiting"; exit 0; }
    sleep 120
done
