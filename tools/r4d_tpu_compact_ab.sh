#!/usr/bin/env bash
# Round-4d TPU block: compact collision resolution A/B
# (PSIM_COLLIDE=compact vs block) at the two scales whose economics
# differ — the collision-dense N=1e7 banded route (~156 collisions/step,
# ~80% of blocks enter the blocked rank branch) and the collision-sparse
# N=1e6 flagship (1-2 hit blocks/step). Protocol: one client at a time,
# timeout-bounded, scalar-fenced per-step estimates, same-session pairs.
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
  run "banded-32 1e7 COMPACT" \
    timeout 1800 env PSIM_COLLIDE=compact python tools/tpu_stepbench.py 10000000 316 21 banded
  run "banded-32 1e7 BLOCK (same-session control)" \
    timeout 1800 env PSIM_COLLIDE=block python tools/tpu_stepbench.py 10000000 316 21 banded
  unset PSIM_BAND_ROWS PSIM_KCAP
  run "resident 1e6 flagship BLOCK" \
    timeout 1800 env PSIM_COLLIDE=block python tools/tpu_stepbench.py 1000000 100 101 resident
  run "resident 1e6 flagship COMPACT" \
    timeout 1800 env PSIM_COLLIDE=compact python tools/tpu_stepbench.py 1000000 100 101 resident
} > verification/compact_ab_r4.log 2>&1
echo "[r4d] compact A/B done $(date +%H:%M)"
