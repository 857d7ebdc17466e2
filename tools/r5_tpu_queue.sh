#!/bin/bash
# Round-5 TPU queue: runs after the fused A/B releases the chip.
# Item 5 (VERDICT r4): demonstrate N=1e8 end-to-end on one chip.
# Config keeps the benchmark family's ~100 particles/cell (1e6: nc=100,
# 1e7: nc=316, 1e8: nc=1000). Attempt order: banded streaming (uniform
# 100-row bands, kcap pinned 192 like the 1e7 config) -> sweep fallback
# (the low-footprint impl r4 named but never ran).
set -u -o pipefail
cd /root/repo
while kill -0 "$(cat /tmp/ab_r5.pid)" 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ==="
  timeout 2400 "$@" 2>&1 | tail -8
  echo "exit=${PIPESTATUS[0]}"
}
run env PSIM_BAND_ROWS=100 PSIM_KCAP=192 python tools/tpu_stepbench.py 100000000 1000 6 banded
run python tools/tpu_stepbench.py 100000000 1000 6 sweep
