#!/usr/bin/env bash
# Round-4 slow-mesh completion queue: the remaining heavy-vector × mesh
# combos (vec1 at --mesh 2 already archived: PASS 575.878 370.663 / 1203,
# 4196s). Appends to the same archived log. Each run is 0.5-2h on this
# 1-core host; whatever completes before round end is archived.
set -u
cd "$(dirname "$0")/.."
LOG=verification/slow_mesh_r4.log

run_vec() {
  local args="$1" exp_xy="$2" exp_cols="$3" mesh="$4"
  local start out rc took gx gy
  start=$(date +%s)
  out=$(python -m particlesimulation_tpu $args --mesh "$mesh" 2>/dev/null)
  rc=$?
  took=$(( $(date +%s) - start ))
  gx=$(echo "$out" | sed -n 1p | awk '{print $1}')
  gy=$(echo "$out" | sed -n 1p | awk '{print $2}')
  local gc
  gc=$(echo "$out" | sed -n 2p)
  read -r ex ey <<<"$exp_xy"
  local ok=1
  [ $rc -ne 0 ] && ok=0
  if [ $ok -eq 1 ]; then
    ok=$(python -c "print(1 if abs($gx-($ex))<=0.001 and abs($gy-($ey))<=0.001 else 0)")
    [ "$gc" = "$exp_cols" ] || ok=0
  fi
  if [ "$ok" = "1" ]; then
    echo "PASS  [$args --mesh $mesh] -> $gx $gy / $gc (${took}s)" >> "$LOG"
  else
    echo "FAIL  [$args --mesh $mesh] got '$gx $gy / $gc' want '$exp_xy / $exp_cols' (${took}s)" >> "$LOG"
  fi
}

# Second heavy vector through the 1D mesh (completes "≥2 heavy vectors").
run_vec "12 100 5 10000 10000" "76.732 61.943" "2209" "2"
# First heavy vector through the 2D rectangle (the "one 2D aspect in f64").
run_vec "-1 1000 30 100000 1000" "575.878 370.663" "1203" "2x2"
# Second heavy vector through the rectangle (completionist; may not finish).
run_vec "12 100 5 10000 10000" "76.732 61.943" "2209" "2x2"
echo "[slow-mesh queue] done $(date +%H:%M)" >> "$LOG"
