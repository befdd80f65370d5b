#!/bin/bash
# Round-4 convergence-evidence supervisor (r3 VERDICT items 5 + 8).
#
# Waits for the axon TPU tunnel, then drives the sustained full-scale runs
# back to back, resume-safe (all trainers continue from
# training_progress.json on relaunch):
#   1. nerf_convergence     — full 480x640 NeRF, fusion='without' (backbone)
#   2. language_convergence — language EBM on the frozen backbone,
#                             multi-object scenes + text target selection
#   3. goal_convergence     — goal EBM on the same backbone (if time)
# Each run gets a wall-clock BUDGET; hitting it (rc=124) is SUCCESS for the
# round (the run is resumable) and hands the chip to the next run. Retries
# on crash (the axon tunnel is the usual culprit; a retry resumes).
#
# Cooperative preemption: a fresh /tmp/tcnerf_chip_lock (written by a
# running bench.py — e.g. the round driver's round-end bench) makes the
# supervisor kill its trainer within ~30 s and stand down until the lock
# clears, so the bench gets the exclusive chip and the shared remote
# compile service to itself. Runs resume afterwards.
#
# Usage: setsid nohup bash tools/convergence_supervisor.sh <workdir> \
#          > <workdir>/supervisor.log 2>&1 &
#   env: DEADLINE_TS (unix secs) — hard stop for everything;
#        NERF_BUDGET / LANG_BUDGET / GOAL_BUDGET (secs per run)
set -u
WS=${1:-/root/repo/convruns}
MAX_RETRY=${MAX_RETRY:-6}
NERF_BUDGET=${NERF_BUDGET:-8400}
LANG_BUDGET=${LANG_BUDGET:-7200}
GOAL_BUDGET=${GOAL_BUDGET:-14400}
# host-RAM fence (round-5, VERDICT item 6): the axon client leaks ~30 MB of
# host RAM per transferred batch; instead of a fixed 85-min slice horizon,
# the monitor loop watches the trainer's actual RSS and TERMs it at
# RSS_CAP_KB (resume-safe slice boundary) — slices auto-size to the
# measured leak rate and a slow-leak run gets its full budget in one piece.
RSS_CAP_KB=${RSS_CAP_KB:-62000000}
TRAINER_PID_FILE=/tmp/tcnerf_trainer.pid
cd "$(dirname "$0")/.."
mkdir -p "$WS"

# no training process may outlive the supervisor (round-4 postmortem: a
# SIGKILLed trainer's server-side HBM starved the round-end bench)
CURRENT_TPID=""
cleanup() {
  if [ -n "$CURRENT_TPID" ] && kill -0 "$CURRENT_TPID" 2>/dev/null; then
    echo "$(date -u +%T) supervisor exiting: draining trainer $CURRENT_TPID"
    kill "$CURRENT_TPID" 2>/dev/null
    for _ in $(seq 30); do
      kill -0 "$CURRENT_TPID" 2>/dev/null || break
      sleep 2
    done
    kill -9 "$CURRENT_TPID" 2>/dev/null
  fi
  rm -f "$TRAINER_PID_FILE"
}
trap cleanup EXIT TERM INT

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
  while ! tunnel_up || [ -e /tmp/conv_hold ] || lock_fresh; do
    echo "$(date -u +%T) tunnel down / conv_hold / chip lock; waiting 60s"
    sleep 60
  done
  echo "$(date -u +%T) tunnel up, chip free"
}

run_with_retry() {
  local name=$1; shift
  local run_budget=$1; shift
  local spent=0
  local n=0
  until [ "$n" -ge "$MAX_RETRY" ]; do
    local budget=$(( run_budget - spent ))
    # run-budget exhaustion FIRST (resumable success -> next run). The
    # deadline branch must only fire on the GLOBAL deadline — round-4 bug:
    # a spent run budget fell into the deadline branch's return 1 and took
    # the whole supervisor down before the later runs started.
    if [ "$budget" -lt 300 ]; then
      echo "$(date -u +%T) [$name] run budget exhausted; next run"
      return 0
    fi
    if [ -n "${DEADLINE_TS:-}" ]; then
      local to_deadline=$(( DEADLINE_TS - $(date +%s) ))
      if [ "$to_deadline" -lt 900 ]; then
        echo "$(date -u +%T) [$name] deadline reached; leaving resume point"
        return 1
      fi
      [ "$budget" -gt "$to_deadline" ] && budget=$to_deadline
    fi
    wait_tunnel
    echo "$(date -u +%T) [$name] attempt $((n+1))/$MAX_RETRY (budget ${budget}s)"
    local t0=$(date +%s)
    timeout "$budget" "$@" >> "$WS/$name.log" 2>&1 &
    local tpid=$!
    CURRENT_TPID=$tpid
    local preempted=0
    local sliced=0
    while kill -0 "$tpid" 2>/dev/null; do
      if lock_fresh; then
        echo "$(date -u +%T) [$name] chip lock appeared — preempting (resume-safe)"
        kill "$tpid" 2>/dev/null
        preempted=1
      fi
      # RSS fence: TERM (not KILL) the trainer BEFORE the host OOM-killer
      # does — the python process under timeout is the leaky one
      local pypid rss
      pypid=$(cat "$TRAINER_PID_FILE" 2>/dev/null | cut -d' ' -f1)
      if [ -n "${pypid:-}" ] && [ -r "/proc/$pypid/status" ]; then
        rss=$(awk '/VmRSS/{print $2}' "/proc/$pypid/status")
        if [ -n "${rss:-}" ] && [ "$rss" -gt "$RSS_CAP_KB" ]; then
          echo "$(date -u +%T) [$name] RSS ${rss}kB > cap — slicing (resume-safe)"
          kill "$tpid" 2>/dev/null
          sliced=1
        fi
      fi
      sleep 30
    done
    wait "$tpid"
    rc=$?
    CURRENT_TPID=""
    # a TERM we sent for the RSS fence surfaces as rc=143: slice boundary
    [ "$sliced" -eq 1 ] && [ $rc -eq 143 ] && rc=124
    spent=$(( spent + $(date +%s) - t0 ))
    if [ "$preempted" -eq 1 ]; then
      # not a failure: stand down, then resume without burning a retry
      sleep 60
      continue
    fi
    if [ $rc -eq 0 ]; then
      echo "$(date -u +%T) [$name] done"
      return 0
    fi
    if [ $rc -eq 124 ]; then
      # slice boundary: resume the SAME run (budget accounting decides when
      # to move on); a fresh process also resets the leaked host RAM
      echo "$(date -u +%T) [$name] slice done (${spent}s spent); resuming"
      continue
    fi
    if [ $rc -eq 137 ]; then
      # OOM-killed (host RAM leak): resume in a fresh process without
      # burning a retry — this is the environment, not the trainer
      echo "$(date -u +%T) [$name] OOM-killed; resuming in a fresh process"
      sleep 30
      continue
    fi
    echo "$(date -u +%T) [$name] rc=$rc; retrying (resume-safe)"
    n=$((n+1))
    sleep 120
  done
  echo "$(date -u +%T) [$name] FAILED after $MAX_RETRY attempts"
  return 1
}

run_with_retry nerf "$NERF_BUDGET" python -m tcnerf.train.train_nerf \
  --config-name=nerf_convergence data_dir="$WS" ws_dir="$WS" || exit 1

run_with_retry language "$LANG_BUDGET" python -m tcnerf.train.train_language \
  --config-name=language_convergence data_dir="$WS" ws_dir="$WS" || exit 1

run_with_retry goal "$GOAL_BUDGET" python -m tcnerf.train.train_goal \
  --config-name=goal_convergence data_dir="$WS" ws_dir="$WS" || exit 1

echo "$(date -u +%T) all convergence runs complete"
