#!/usr/bin/env bash
# Round-4 column-sharded banded composition measurements (VERDICT item 3
# gate retry): the block-cyclic variant measured 2.18x over the same-plan
# control at D=8; parallel/sharded_banded_cols.py is the structural fix.
# On this 1-core host ideal composition = equal total work = equal time.
set -u
cd "$(dirname "$0")/.."

LOG=verification/uneven_compose_cols_r4.log
{
  echo "# Column-sharded banded (PSIM_BANDED_SHARD=cols, the new default)"
  echo "# vs single-chip banded; same unquantized band plan on both sides."
  echo
  echo "## D=8 at the tool's default config (N=2e5, nc=100, seed=-23)"
  echo "## (block-cyclic planner DECLINED here and fell back to resident"
  echo "##  at 3.04x; cols uses the single-chip plan so it engages)"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu PSIM_DENSE=1 \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 3600 python tools/uneven_compose_bench.py
  echo "exit=$?"
  echo
  echo "## D=8 at the REAL workload scale (N=1e6, nc=100, seed=-23)"
  echo "## (block-cyclic measured 2.01x vs single / 2.18x vs same-plan"
  echo "##  control here)"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu PSIM_DENSE=1 \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 7200 python tools/uneven_compose_bench.py 1000000 100 11 -23
  echo "exit=$?"
  echo
  echo "## D=2 at N=2e5 (block-cyclic passed 0.90x here; parity check)"
  env PYTHONPATH="$PWD" JAX_PLATFORMS=cpu PSIM_DENSE=1 \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 3600 python tools/uneven_compose_bench.py 200000 100 11 -23 2
  echo "exit=$?"
} > "$LOG" 2>&1
echo "[cols-queue] done $(date +%H:%M)"
