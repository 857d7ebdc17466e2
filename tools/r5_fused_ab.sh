#!/bin/bash
# Round-5 fused-vs-general banded A/B at N=1e7 on the real TPU.
# Method matches r4's banded-32 study (tools/r4c_tpu_ablate.sh):
# PSIM_BAND_ROWS=32 uniform streaming bands, auto kcap (192 for this
# state on both legs — printed), same state, legs back-to-back in one
# session so the ~12% cross-session variance can't masquerade as a win.
set -u -o pipefail
cd /root/repo
export PSIM_BAND_ROWS=32
run() {
  local tag="$1"; shift
  echo "== $tag  [$(date +%H:%M:%S)]"
  timeout 1800 "$@" 2>&1 | tail -6
  echo "exit=${PIPESTATUS[0]}"
}
run "banded-32 GENERAL (PSIM_BANDED_FUSED=0)" \
  env PSIM_BANDED_FUSED=0 python tools/tpu_stepbench.py 10000000 316 21 banded
run "banded-32 FUSED" \
  env PSIM_BANDED_FUSED=1 python tools/tpu_stepbench.py 10000000 316 21 banded
run "banded-32 FUSED no-barrier" \
  env PSIM_BANDED_FUSED=1 PSIM_BANDED_FUSED_BARRIER=0 python tools/tpu_stepbench.py 10000000 316 21 banded
