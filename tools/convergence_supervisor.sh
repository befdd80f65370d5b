#!/bin/bash
# Round-3 convergence-evidence supervisor (VERDICT item 4).
#
# Waits for the axon TPU tunnel, then drives the two sustained full-scale
# runs back to back, resume-safe (both trainers continue from
# training_progress.json on relaunch):
#   1. nerf_convergence  — full 480x640 NeRF, fusion='without'
#   2. goal_convergence  — grasp EBM on the frozen converged backbone
# Retries each run up to MAX_RETRY times on crash (the axon tunnel is the
# usual culprit; a retry resumes, it does not restart).
#
# Cooperative preemption: a fresh /tmp/tcnerf_chip_lock (written by a
# running bench.py — e.g. the round driver's round-end bench) makes the
# supervisor kill its trainer within ~30 s and stand down until the lock
# clears, so the bench gets the exclusive chip and the shared remote
# compile service to itself. Runs resume afterwards.
#
# Usage: setsid nohup bash tools/convergence_supervisor.sh <workdir> \
#          > <workdir>/supervisor.log 2>&1 &
set -u
WS=${1:-/tmp/conv}
MAX_RETRY=${MAX_RETRY:-6}
cd "$(dirname "$0")/.."
mkdir -p "$WS"

tunnel_up() {
  python3 - << 'EOF'
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", 8113)); sys.exit(0)
except Exception:
    sys.exit(1)
finally:
    s.close()
EOF
}

lock_fresh() {
  [ -f /tmp/tcnerf_chip_lock ] && \
    [ $(( $(date +%s) - $(stat -c %Y /tmp/tcnerf_chip_lock) )) -lt 1800 ]
}

wait_tunnel() {
  # /tmp/conv_hold gates the supervisor off the (exclusive) TPU while the
  # tpu_checklist runs its benches; the checklist releases it via EXIT trap
  while ! tunnel_up || [ -e /tmp/conv_hold ] || lock_fresh; do
    echo "$(date -u +%T) tunnel down / conv_hold / chip lock; waiting 60s"
    sleep 60
  done
  echo "$(date -u +%T) tunnel up, chip free"
}

run_with_retry() {
  local name=$1; shift
  local n=0
  until [ "$n" -ge "$MAX_RETRY" ]; do
    # optional DEADLINE_TS (unix seconds) still honored when exported
    local budget=14400
    if [ -n "${DEADLINE_TS:-}" ]; then
      budget=$(( DEADLINE_TS - $(date +%s) ))
      [ "$budget" -gt 14400 ] && budget=14400
      if [ "$budget" -lt 900 ]; then
        echo "$(date -u +%T) [$name] deadline reached; leaving resume point"
        return 1
      fi
    fi
    wait_tunnel
    echo "$(date -u +%T) [$name] attempt $((n+1))/$MAX_RETRY (budget ${budget}s)"
    timeout "$budget" "$@" >> "$WS/$name.log" 2>&1 &
    local tpid=$!
    local preempted=0
    while kill -0 "$tpid" 2>/dev/null; do
      if lock_fresh; then
        echo "$(date -u +%T) [$name] chip lock appeared — preempting (resume-safe)"
        kill "$tpid" 2>/dev/null
        preempted=1
      fi
      sleep 30
    done
    wait "$tpid"
    rc=$?
    if [ "$preempted" -eq 1 ]; then
      # not a failure: stand down, then resume without burning a retry
      sleep 60
      continue
    fi
    if [ $rc -eq 0 ]; then
      echo "$(date -u +%T) [$name] done"
      return 0
    fi
    echo "$(date -u +%T) [$name] rc=$rc; retrying (resume-safe)"
    n=$((n+1))
    sleep 120
  done
  echo "$(date -u +%T) [$name] FAILED after $MAX_RETRY attempts"
  return 1
}

run_with_retry nerf python -m tcnerf.train.train_nerf \
  --config-name=nerf_convergence data_dir="$WS" ws_dir="$WS" || exit 1

run_with_retry goal python -m tcnerf.train.train_goal \
  --config-name=goal_convergence data_dir="$WS" ws_dir="$WS" || exit 1

echo "$(date -u +%T) all convergence runs complete"
