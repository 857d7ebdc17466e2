#!/usr/bin/env python
"""Benchmark: particle-steps/sec at N=1e6 on the fast engine (one TPU chip).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference serial binary on this machine's CPU for the same
simulation parameters (seed 1, side 5000, ncside 100, N=1e6 — golden vector
#5's configuration) measured at 1.29e6 particle-steps/s (BASELINE.md).
"""

import json
import sys
import time

SERIAL_BASELINE = 1.29e6  # particle*steps/s, reference serial, this machine


def main() -> int:
    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine

    n = 1_000_000
    cfg = SimConfig(seed=1, side=5000.0, ncside=100, n_particles=n,
                    precision=Precision.FAST)
    eng = Engine(cfg)
    state = eng.init_state()

    # Warm-up: compile + a few steps to reach steady-state occupancy.
    state = eng.run(state, 3)

    steps = 200
    t0 = time.perf_counter()
    state = eng.run(state, steps)
    elapsed = time.perf_counter() - t0

    rate = n * steps / elapsed
    print(json.dumps({
        "metric": "particle_steps_per_sec_n1e6",
        "value": rate,
        "unit": "particle*steps/s",
        "vs_baseline": rate / SERIAL_BASELINE,
    }))
    print(f"# {steps} steps in {elapsed:.3f}s; collisions={int(state.collisions)}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
