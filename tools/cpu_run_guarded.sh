#!/bin/bash
# Tunnel-aware guarded CPU trainer: keeps a (resume-safe) training command
# running on the host CPU while the axon TPU tunnel is DOWN, pauses it the
# moment the tunnel returns or a fresh /tmp/tcnerf_chip_lock appears (a
# bench run wants a quiet host / the exclusive compile service), and
# resumes when they clear. This is how the round-3 CPU convergence evidence
# was produced while the tunnel was dead (docs/convergence.md).
#
# Usage:
#   setsid nohup bash tools/cpu_run_guarded.sh <logfile> <done-regex> \
#       <python -m module> [args...] > /dev/null 2>&1 &
# Example:
#   setsid nohup bash tools/cpu_run_guarded.sh /tmp/c/train.log 'epoch 1536' \
#       python -m tcnerf.train.train_nerf --config-name=nerf_convergence_cpu \
#       data_dir=/tmp/c ws_dir=/tmp/c &
set -u
LOG=$1; shift
DONE_RE=$1; shift
HARD_END=${HARD_END:-$(( $(date +%s) + 6 * 3600 ))}
PIDFILE="${LOG}.pid"
cd "$(dirname "$0")/.."

tunnel_up() { timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8113' 2>/dev/null; }
lock_fresh() {
  [ -f /tmp/tcnerf_chip_lock ] && \
    [ $(( $(date +%s) - $(stat -c %Y /tmp/tcnerf_chip_lock) )) -lt 1800 ]
}
trainer_alive() { [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; }
kill_trainer() {
  if [ -f "$PIDFILE" ]; then
    kill "$(cat $PIDFILE)" 2>/dev/null; sleep 3
    kill -9 "$(cat $PIDFILE)" 2>/dev/null; rm -f "$PIDFILE"
  fi
}

while [ "$(date +%s)" -lt "$HARD_END" ]; do
  if tunnel_up || lock_fresh; then
    trainer_alive && { echo "$(date -u +%T) guarded: chip needed -> pause" >> "$LOG"; kill_trainer; }
  else
    if ! trainer_alive; then
      if grep -q "$DONE_RE" "$LOG" 2>/dev/null; then
        echo "$(date -u +%T) guarded: done marker found" >> "$LOG"; break
      fi
      setsid nohup env PYTHONPATH= JAX_PLATFORMS=cpu "$@" \
        >> "$LOG" 2>&1 < /dev/null &
      echo $! > "$PIDFILE"
      echo "$(date -u +%T) guarded: (re)started pid $(cat $PIDFILE)" >> "$LOG"
    fi
  fi
  sleep 60
done
kill_trainer
echo "$(date -u +%T) guarded: end" >> "$LOG"
