#!/usr/bin/env bash
# Round-5 CPU measurement queue: waits for the heavy sharded-banded golden
# to release the (single) core, then runs the composition studies that
# need clean host timings. Logs land in verification/.
set -u -o pipefail
cd "$(dirname "$0")/.."

HLOG=verification/heavy_banded_mesh_r5.log
echo "[queue] waiting for heavy banded-mesh golden to finish..."
while ! grep -qE '^(PASS|FAIL)$' "$HLOG" 2>/dev/null; do sleep 60; done
echo "[queue] heavy golden done; starting measurements $(date +%H:%M)"

ENV8="PYTHONPATH=$PWD JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8"

# --- item 4: phase-ablated banded D=8 composition (measure, not attribute)
{
  echo "# Phase-ablated UNEVEN banded composition, D=8 virtual mesh."
  echo "# full = all phases; noship = PSIM_ABLATE=rebin (skip ship/rebin);"
  echo "# nopairs = PSIM_ABLATE=pairs (skip pair pass). pairs-only cost ="
  echo "# full - nopairs per leg; its sharded/single ratio is the gate."
  for ab in "" rebin pairs; do
    echo "== PSIM_ABLATE='${ab}'"
    env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PSIM_ABLATE="$ab" PSIM_BANDED_FUSED=0 \
        timeout 3600 python tools/uneven_compose_bench.py 1000000 100 11 -23 8
    echo "exit=$?"
  done
} > verification/compose_ablate_r5.log 2>&1

# --- item 3 gate: SMALL-shaped supercell composition, D=8 ---
{
  echo "# SMALL-shaped sparse composition: sharded supercell vs single chip"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 3600 python tools/supercell_compose_bench.py 50000 408 11 50 8
  echo "exit=$?"
} > verification/supercell_compose_r5.log 2>&1

echo "[queue] done $(date +%H:%M)"
