#!/usr/bin/env python
"""Benchmark: particle-steps/sec at N=1e6 on the fast engine (one TPU chip).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology notes (the device is reached through a remote tunnel):
* initial conditions are generated on device — same distributions as the
  reference initializer; the host-exact stream is for parity runs, not
  throughput runs (reference times only simulate(), serial/parsim.cpp:475);
* per-step time = (t(run K) - t(run 1)) / (K - 1), with scalar-readback
  fences (block_until_ready can be dispatch-only through the tunnel);
* workload = golden vector #5's configuration (seed 1, side 5000,
  ncside 100, N=1e6). Baseline: the reference serial binary at the same
  configuration on this machine's CPU, 1.29e6 particle-steps/s (BASELINE.md).
"""

import json
import sys
import time

SERIAL_BASELINE = 1.29e6  # particle*steps/s, reference serial, this machine


def main() -> int:
    import numpy as np

    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine

    sys.path.insert(0, ".")
    from tools.tpu_stepbench import device_init_state

    n = 1_000_000
    cfg = SimConfig(seed=1, side=5000.0, ncside=100, n_particles=n,
                    precision=Precision.FAST)
    eng = Engine(cfg)
    state = device_init_state(cfg, eng)

    steps = 101
    eng.run(state, 1)          # compile + warm (includes capacity retries)
    eng.run(state, steps)      # absorb the tunnel's one-time executable
    #                            re-preparation stall (~90 s, observed on
    #                            later calls; see tools/tpu_stepbench.py)
    per_step = None
    for _rep in range(2):      # best-of-2 vs residual transients
        t0 = time.perf_counter()
        eng.run(state, 1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = eng.run(state, steps)
        tk = time.perf_counter() - t0
        per = max((tk - t1) / (steps - 1), 1e-9)
        if per_step is None or per < per_step:
            per_step = per
    rate = n / per_step
    print(json.dumps({
        "metric": "particle_steps_per_sec_n1e6",
        "value": rate,
        "unit": "particle*steps/s",
        "vs_baseline": rate / SERIAL_BASELINE,
    }))
    print(f"# per-step {per_step*1000:.2f} ms (run1 {t1*1000:.1f} ms, "
          f"run{steps} {tk*1000:.1f} ms); dense={eng.use_dense} "
          f"kcap={eng.kcap}; collisions={int(np.asarray(out.collisions))}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
