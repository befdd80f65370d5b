#!/bin/bash
# Round-3 convergence-evidence supervisor (VERDICT item 4).
#
# Waits for the axon TPU tunnel, then drives the two sustained full-scale
# runs back to back, resume-safe (both trainers continue from
# training_progress.json on relaunch):
#   1. nerf_convergence  — full 480x640 NeRF, fusion='without', 2048 epochs
#   2. goal_convergence  — grasp EBM on the frozen converged backbone
# Retries each run up to MAX_RETRY times on crash (the axon tunnel is the
# usual culprit; a retry resumes, it does not restart).
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

wait_tunnel() {
  # /tmp/conv_hold gates the supervisor off the (exclusive) TPU while a
  # human/agent session runs its own checks; remove the file to release
  while ! tunnel_up || [ -e /tmp/conv_hold ]; do
    echo "$(date -u +%T) tunnel down or /tmp/conv_hold present; waiting 60s"
    sleep 60
  done
  echo "$(date -u +%T) tunnel up"
}

run_with_retry() {
  local name=$1; shift
  local n=0
  until [ "$n" -ge "$MAX_RETRY" ]; do
    # DEADLINE_TS (unix seconds): stop using the exclusive chip before the
    # round driver needs it for the final bench; runs are resume-safe so a
    # later round can continue them
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
    timeout "$budget" "$@" >> "$WS/$name.log" 2>&1
    rc=$?
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
