#!/bin/bash
# Warm the persistent compile cache for EVERY bench phase, phase by phase,
# each as its own process (the driver-bench convention: bench.py --phase).
#
# Run after the LAST commit that touches traced code and before the round
# ends: the driver's cold `python bench.py` has a 3300 s budget that only
# fits ~4 of the 8 phases when .jax_cache is empty (measured rounds 4-5),
# but lands all of them warm in minutes. Results land in
# /tmp/warm_<phase>.json and the combined log in /tmp/warm_bench.log.
#
# Ordering: tail-first. The driver bench runs its phases in PHASE_TABLE
# priority order and can land the head phases even cold, so if this sweep
# is interrupted the phases most at risk of being skipped (sharded,
# hashgrid, train_b1, 3view) must already be cached.
set -u
cd "$(dirname "$0")/.."
PHASES=${1:-"sharded hashgrid train_b1 3view dngf_b8 clip train_b8 render"}
for ph in $PHASES; do
  echo "=== $(date -u +%T) phase $ph start" | tee -a /tmp/warm_bench.log
  timeout 3000 python bench.py --phase "$ph" --out "/tmp/warm_${ph}.json" \
    >> /tmp/warm_bench.log 2>&1
  rc=$?
  echo "=== $(date -u +%T) phase $ph rc=$rc $(cat /tmp/warm_${ph}.json 2>/dev/null)" \
    | tee -a /tmp/warm_bench.log
done
