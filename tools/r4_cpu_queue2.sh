#!/usr/bin/env bash
# Round-4 CPU measurement queue, take 2: the original queue waited on a
# slow-mesh harness that died with its session. This one starts
# immediately and runs the three virtual-mesh studies in value order.
set -u
cd "$(dirname "$0")/.."

echo "[queue2] start $(date +%H:%M)"

# --- item 1: 2D-resident virtual-mesh A/B at D=8 ---
{
  echo "# D=8 virtual A/B: 1D resident vs 2D(2x4) resident vs 2D(2x4) sweep"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu PSIM_DENSE=1 \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 3600 python tools/mesh2d_ab_bench.py
  echo "exit=$?"
} > verification/mesh2d_ab_r4.log 2>&1
echo "[queue2] mesh2d A/B done $(date +%H:%M)"

# --- item 3: UNEVEN composition at --mesh 8 (banded vs single chip) ---
{
  echo "# UNEVEN-shaped composition: single-chip banded vs sharded banded D=8"
  echo "# (1 physical core: ideal composition = equal total work = equal time)"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu PSIM_DENSE=1 \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 3600 python tools/uneven_compose_bench.py
  echo "exit=$?"
} > verification/uneven_compose_r4.log 2>&1
echo "[queue2] uneven compose done $(date +%H:%M)"

# --- item 7: D=8 weak-scaling outlier sweep (per-device N at fixed D) ---
{
  echo "# D=8 weak-scaling sweep: per-device N vs composition factor"
  for np in 15625 31250 62500 125000; do
    for d in 1 8; do
      n=$((np * d))
      nc=$(python -c "print(max(8, round(($n/96)**0.5)))")
      echo "== n_per=$np D=$d N=$n ncside=$nc"
      env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          timeout 1800 python tools/scaling_bench.py "$np" "$nc" "$d" 11 fast
    done
  done
  echo "exit=$?"
} > verification/weak_scaling_d8_sweep_r4.log 2>&1
echo "[queue2] weak-scaling sweep done $(date +%H:%M)"

echo "[queue2] all measurements done $(date +%H:%M)"
