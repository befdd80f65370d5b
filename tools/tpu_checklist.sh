#!/bin/bash
# Session-end TPU checklist (r3 VERDICT item 1): run as the LAST chip act of
# any session that touched kernels, knobs, or bench phases.
#   1. pre-warm .jax_cache for the EXACT committed default-knob bench
#      configuration (headline + every secondary phase) so the round
#      driver's bench runs all-warm and lands within its timeout;
#   2. run the TPU-only kernel/renderer parity tests on the real chip (the
#      default CPU-mesh suite skips them — without this a real-chip
#      regression is invisible);
#   3. release the convergence supervisor (EXIT trap: whatever happens, it
#      must not stay blocked).
# A fresh /tmp/tcnerf_chip_lock (another bench running) pauses each step.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/checklist
trap 'rm -f /tmp/conv_hold' EXIT

lock_fresh() {
  [ -f /tmp/tcnerf_chip_lock ] && \
    [ $(( $(date +%s) - $(stat -c %Y /tmp/tcnerf_chip_lock) )) -lt 1800 ]
}
wait_clear() { while lock_fresh; do sleep 30; done; }

touch /tmp/conv_hold   # hold the supervisor off the chip for the duration

# 1. full-phase bench at committed defaults (+.bench_knobs.json) — warms
# every program the driver's round-end bench will request
wait_clear
TCNERF_BENCH_BUDGET_S=5400 timeout 5600 python bench.py \
  > /tmp/checklist/bench.log 2>&1
echo "$(date -u +%T) prewarm bench rc=$? $(tail -1 /tmp/checklist/bench.log \
  | head -c 300)" | tee -a /tmp/checklist/status

# 2. real-chip parity tests
wait_clear
timeout 5400 env TCNERF_TPU_TESTS=1 python -m pytest \
  tests/test_kernels.py tests/test_renderer.py -q \
  > /tmp/checklist/tpu_tests.log 2>&1
echo "$(date -u +%T) TPU test run rc=$? $(tail -1 /tmp/checklist/tpu_tests.log \
  | head -c 200)" | tee -a /tmp/checklist/status

# 3. no training/bench process may outlive the session (r4 postmortem: a
# SIGKILLed trainer's server-side HBM starved the round-end driver bench).
# Pid files are the only match mechanism — never pattern-match cmdlines.
for pidfile in /tmp/tcnerf_trainer.pid /tmp/tcnerf_bench_phase.pid; do
  pid=$(cut -d' ' -f1 "$pidfile" 2>/dev/null || true)
  if [ -n "${pid:-}" ] && kill -0 "$pid" 2>/dev/null; then
    echo "$(date -u +%T) sweeping stale pid $pid ($pidfile)" \
      | tee -a /tmp/checklist/status
    kill "$pid" 2>/dev/null
    for _ in $(seq 30); do kill -0 "$pid" 2>/dev/null || break; sleep 2; done
    kill -9 "$pid" 2>/dev/null
  fi
  rm -f "$pidfile"
done
rm -f /tmp/tcnerf_chip_lock

rm -f /tmp/conv_hold
echo "$(date -u +%T) checklist done — supervisor released, chip swept" \
  >> /tmp/checklist/status
