#!/bin/bash
# Poll-and-run silicon measurement queue for the axon tunnel.
#
# The tunnel can go fully down for hours (DEVNOTES "The tunnel can go
# fully down"); this wrapper keeps a measurement session productive:
# it probes `jax.devices()` on a bounded timeout until the backend
# initializes, then runs each command in the queue file sequentially,
# logging per-command results.
#
# Usage:  tools/tpu_queue.sh <queue-file> [log-file]
#   queue-file: one shell command per line (comments/# and blanks ok)
#   log-file:   default /tmp/tpu_queue.log
#
# Example queue file:
#   python tools/tpu_stepbench.py 1000000 100 101 resident
#   env PSIM_REBIN_DIRS=4 python tools/tpu_stepbench.py 1000000 100 101 resident

set -u
queue=${1:?usage: tpu_queue.sh <queue-file> [log-file]}
log=${2:-/tmp/tpu_queue.log}
cd "$(dirname "$0")/.."

echo "=== queue $queue start $(date)" >> "$log"
up=0
for i in $(seq 1 120); do
  if timeout 150 python -c "import jax; print('TPU_OK', jax.devices())" >> "$log" 2>&1; then
    echo "TPU up at $(date)" >> "$log"
    up=1
    break
  fi
  echo "poll $i failed $(date)" >> "$log"
  sleep 120
done
if [ "$up" != 1 ]; then
  echo "=== queue abandoned: tunnel never came up $(date)" >> "$log"
  exit 1
fi

n=0
while IFS= read -r cmd; do
  case "$cmd" in ''|'#'*) continue;; esac
  n=$((n + 1))
  out=/tmp/q_item$n.log
  echo "=== item $n start $(date): $cmd" >> "$log"
  timeout 3600 bash -c "$cmd" > "$out" 2>&1
  echo "=== item $n rc=$? $(date) (full output: $out)" >> "$log"
  grep -E "per-step|rate|band plan|tier plan|first run" "$out" | tail -8 >> "$log"
done < "$queue"
echo "=== queue done $(date)" >> "$log"
