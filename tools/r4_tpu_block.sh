#!/usr/bin/env bash
# Round-4 TPU block: quiet-host measurements in sequence.
# 1. tiered-on-uniform-flagship A/B (VERDICT r3 item 5's second half):
#    does lane right-sizing pay at kcap=160 on the uniform flagship?
# 2. N=4e7 point for the single-chip memory ceiling (2e7 ok, 1e8 OOM).
# 3. Clean-host flagship bench confirm (bench.py).
set -u
cd "$(dirname "$0")/.."

{
  echo "# tiered-on-uniform-flagship A/B (N=1e6 ncside=100, 101 steps)"
  echo "== resident/dense xla (default route)"
  timeout 1200 python tools/tpu_stepbench.py 1000000 100 101 xla 2>&1 | tail -4
  echo "== tiered (census-planned occupancy classes)"
  timeout 1200 python tools/tpu_stepbench.py 1000000 100 101 tiered 2>&1 | tail -6
  echo "exit=$?"
} > verification/tiered_flagship_ab_r4.log 2>&1
echo "[tpu-block] tiered A/B done $(date +%H:%M)"

{
  echo "# N=4e7 memory-ceiling probe (auto route; 2e7 ran, 1e8 ResourceExhausted)"
  timeout 1800 python tools/tpu_stepbench.py 40000000 632 21 auto 2>&1 | tail -6
  echo "exit=$?"
} > verification/n4e7_probe_r4.log 2>&1
echo "[tpu-block] 4e7 probe done $(date +%H:%M)"

{
  echo "# clean-host flagship confirm"
  timeout 1200 python bench.py 2>&1 | tail -3
  echo "exit=$?"
} > verification/bench_confirm_r4.log 2>&1
echo "[tpu-block] bench confirm done $(date +%H:%M)"
