"""Heavy clustered golden through the SHARDED banded path (VERDICT r4 #6).

Runs reference vector #11 (``-1 1000 30 100000 1000 -> 575.878 370.663 /
1203``, reference serial/run_tests.sh) at FULL horizon through the
column-sharded banded engine on a 2-shard virtual mesh, and gates:

* sharded-vs-single-chip banded: collision count EXACT, dead set EXACT
  (the framework's own sharded contract — the decomposition changes
  communication, not collision semantics);
* single-chip banded vs the f64 golden collision count: the statistical
  band of tests/test_fast_statistical.py (max(3, 15%) — f32 vs f64
  trajectories decorrelate over 1000 chaotic steps, so near-threshold
  pairs resolve differently; macro-event counts must still agree).

STATED PLAINLY (the verdict asked which gate): the banded engine is
f32-only — f64 banded-parity does not exist; the bitwise/±0.001 claim
for meshes stays with the f64 sweep path (tools/run_golden.sh
slow-mesh). This tool is the banded engine's full-workload equivalent
of the reference MPI harness running UNEVEN end-to-end under mpirun
(reference mpi/run_tests.sh:41-53).

Usage: heavy_banded_mesh.py [steps] [d]      (defaults: 1000, 2)
Needs the parity env (tests/bootstrap_env or r4_cpu_queue.sh-style
invocation with 8 virtual CPU devices).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_C = 1203  # f64 parity collision count (reference serial/run_tests.sh)


def main():
    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine
    from particlesimulation_tpu.parallel.sharded import ShardedEngine

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    base = dict(seed=-1, side=1000.0, ncside=30, n_particles=100_000,
                precision=Precision.FAST)

    t0 = time.time()
    se = Engine(SimConfig(**base), impl="banded", dense_backend="xla")
    ss = se.run(se.init_state(), steps)
    cs = int(np.asarray(ss.collisions))
    print(f"single-chip banded: collisions={cs} "
          f"plan={se._band_plan} overflow={int(np.asarray(ss.overflow))} "
          f"({time.time()-t0:.0f}s)", flush=True)

    t1 = time.time()
    me = ShardedEngine(SimConfig(**base, n_shards=d), impl="banded")
    ms = me.run(me.init_state(), steps)
    cm = int(np.asarray(ms.collisions))
    print(f"sharded banded D={d} ({me.banded_variant}): collisions={cm} "
          f"overflow={int(np.asarray(ms.overflow))} "
          f"({time.time()-t1:.0f}s)", flush=True)

    ok = True
    if cm != cs:
        ok = False
        print(f"FAIL sharded collision count {cm} != single-chip {cs}")
    g = me.gather(ms)
    order = np.argsort(np.asarray(ss.pid))
    if not (np.unique(g["pid"]) == np.arange(base["n_particles"])).all():
        ok = False
        print("FAIL particle set not preserved through the mesh")
    if not (g["alive"] == np.asarray(ss.alive)[order]).all():
        ok = False
        nd = int((g["alive"] != np.asarray(ss.alive)[order]).sum())
        print(f"FAIL dead set differs from single-chip in {nd} particles")
    band = max(3, int(0.15 * GOLDEN_C))
    if abs(cs - GOLDEN_C) > band:
        ok = False
        print(f"FAIL single-chip banded {cs} outside golden band "
              f"{GOLDEN_C}±{band}")
    else:
        print(f"golden band: single-chip {cs} vs f64 golden {GOLDEN_C} "
              f"(±{band}) OK")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
