#!/bin/bash
# Fires once when the axon tunnel returns: (1) measure the batch-8 chunked
# train step + dngf step, (2) sweep coarse-stage window knobs, (3) if a sweep
# point cleanly beats the committed defaults, adopt it via .bench_knobs.json
# (bench.py reads it; env vars still win), (4) release the convergence
# supervisor hold. Logs under /tmp/r3/.
#
# The hold release is an EXIT trap: whatever happens to the benches, the
# supervisor must not stay blocked forever. A fresh /tmp/tcnerf_chip_lock
# (written by a running bench.py — e.g. the round driver's) pauses each step
# so an external bench gets the chip and compile service to itself.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3
trap 'rm -f /tmp/conv_hold' EXIT

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

wait_clear() { while lock_fresh; do sleep 30; done; }

while ! tunnel_up; do sleep 60; done
echo "$(date -u +%T) tunnel is back" | tee -a /tmp/r3/status

# 1. the unverified train benches (b8 chunked + dngf second-order)
wait_clear
timeout 4800 python -c "
import bench
print('train_step_ms_b8', bench.bench_train_step(batch=8), flush=True)
print('dngf_train_step_ms_b8', bench.bench_dngf_step(batch=8), flush=True)
" > /tmp/r3/train_b8.log 2>&1
echo "$(date -u +%T) train benches rc=$? (see /tmp/r3/train_b8.log)" >> /tmp/r3/status

# 2. coarse-window sweep: ka_c narrow + big patch capacity vs default
for KAC in 8 6; do
  for CAP in 32768; do
    wait_clear
    TCNERF_BENCH_CLIP=0 TCNERF_BENCH_TRAIN=0 TCNERF_BENCH_3VIEW=0 \
    TCNERF_BENCH_KA_C=$KAC TCNERF_BENCH_PATCH_CAP=$CAP \
    timeout 3000 python bench.py > "/tmp/r3/sweep_kac${KAC}_cap${CAP}.log" 2>&1
    echo "$(date -u +%T) sweep ka_c=$KAC cap=$CAP rc=$? $(tail -1 \
      "/tmp/r3/sweep_kac${KAC}_cap${CAP}.log" | head -c 200)" >> /tmp/r3/status
    # our own sweep wrote the chip lock (bench.py main); a timeout-kill can
    # leave it behind — clear it so wait_clear doesn't stall on ourselves
    rm -f /tmp/tcnerf_chip_lock
  done
done

# 3. adopt the best clean sweep point if it beats the committed defaults
# (258.7k rays/s) by >=3% with zero overflowing chunks
python3 - >> /tmp/r3/status 2>&1 << 'EOF'
import glob, json, re, subprocess
best = None
for p in glob.glob("/tmp/r3/sweep_kac*_cap*.log"):
    try:
        row = json.loads(open(p).read().strip().splitlines()[-1])
    except Exception:
        continue
    if row.get("swg_overflow_chunks", 1) != 0:
        continue
    m = re.search(r"kac(\d+)_cap(\d+)", p)
    if best is None or row["value"] > best[0]:
        best = (row["value"], int(m.group(1)), int(m.group(2)))
if best and best[0] >= 258700 * 1.03:
    knobs = {"TCNERF_BENCH_KA_C": best[1], "TCNERF_BENCH_PATCH_CAP": best[2]}
    with open(".bench_knobs.json", "w") as f:
        json.dump(knobs, f)
    subprocess.run(["git", "add", ".bench_knobs.json"])
    subprocess.run(["git", "commit", "-m",
                    f"Adopt swept bench knobs ka_c={best[1]} patch_cap={best[2]}"
                    f" ({best[0]:.0f} rays/s, zero overflow)"])
    print(f"adopted knobs {knobs} at {best[0]:.0f} rays/s")
else:
    print(f"no knob adoption (best clean sweep: {best})")
EOF

# 4. run the TPU-only kernel/renderer parity tests on the real chip — the
# default CPU-mesh suite skips them, so without this run a real-chip
# regression is invisible (round-2 verdict, "What's weak")
wait_clear
timeout 5400 env TCNERF_TPU_TESTS=1 python -m pytest \
  tests/test_kernels.py tests/test_renderer.py -q \
  > /tmp/r3/tpu_tests.log 2>&1
echo "$(date -u +%T) TPU test run rc=$? $(tail -1 /tmp/r3/tpu_tests.log | head -c 200)" >> /tmp/r3/status

# 5. hand the chip to the convergence supervisor (also done by the EXIT trap)
rm -f /tmp/conv_hold
echo "$(date -u +%T) released /tmp/conv_hold — convergence runs start" >> /tmp/r3/status
