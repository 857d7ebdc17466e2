#!/usr/bin/env bash
# Round-4c TPU block: attribute the 1e7 residual INSIDE the adopted
# banded-streaming route (round-4 adopted 32-row bands at 72.4 ms/step;
# the ≤55 ms target needs to know which phase still runs over linear).
# Protocol: one client at a time, timeout-bounded, scalar-fenced
# per-step estimates (tools/tpu_stepbench.py). PSIM_KCAP=160 pins K for
# apples-to-apples with the resident ablations (round 3).
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "== $tag  [$(date +%H:%M:%S)]"
  "$@" 2>&1 | tail -5
  echo "exit=${PIPESTATUS[0]}"
}

{
  export PSIM_BAND_ROWS=32 PSIM_KCAP=160
  run "banded-32 full (control)" \
    timeout 1800 python tools/tpu_stepbench.py 10000000 316 21 banded
  run "banded-32 ABLATE=pairs" \
    timeout 1800 env PSIM_ABLATE=pairs python tools/tpu_stepbench.py 10000000 316 21 banded
  run "banded-32 ABLATE=rebin" \
    timeout 1800 env PSIM_ABLATE=rebin python tools/tpu_stepbench.py 10000000 316 21 banded
} > verification/banded_ablate_1e7_r4.log 2>&1
echo "[r4c] banded ablations done $(date +%H:%M)"

{
  echo "# N=4e7 memory-ceiling probe (auto route; 2e7 ran 184.8 ms, 1e8 ResourceExhausted)"
  timeout 2400 python tools/tpu_stepbench.py 40000000 632 21 auto 2>&1 | tail -6
  echo "exit=$?"
} > verification/n4e7_probe_r4.log 2>&1
echo "[r4c] 4e7 probe done $(date +%H:%M)"
