"""Chunked, checkpointed golden-vector verification runner.

For the multi-hour high-occupancy vectors (reference serial/run_tests.sh's
ncside=50 × 500-step and ncside=5 × 10⁴-step entries): runs the f64 parity
engine in fixed-size chunks, checkpointing after each so progress survives
interruption and a kill resumes bit-identically (the step function is pure).

Usage:
    python tools/verify_golden.py SEED SIDE NCSIDE N STEPS EXP_X EXP_Y EXP_C \
        [--chunk 25] [--tag name]

Prints one progress line per chunk (steps done, wall time, collisions so
far) and a final PASS/FAIL verdict against the reference harness tolerances
(coords ±0.001, collision count exact).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particlesimulation_tpu.utils import runtime  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seed", type=int)
    ap.add_argument("side", type=float)
    ap.add_argument("ncside", type=int)
    ap.add_argument("n", type=int)
    ap.add_argument("steps", type=int)
    ap.add_argument("exp_x", type=float)
    ap.add_argument("exp_y", type=float)
    ap.add_argument("exp_c", type=int)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    runtime.ensure_parity_runtime("tools.verify_golden", sys.argv[1:])

    import numpy as np

    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine
    from particlesimulation_tpu.utils import checkpointing as ckpt

    tag = args.tag or (f"g{args.seed}_{args.ncside}_{args.n}_{args.steps}"
                       .replace("-", "m"))
    ck_path = f"/tmp/psim_ckpt_{tag}.npz"
    done_path = ck_path + ".steps"

    cfg = SimConfig(seed=args.seed, side=args.side, ncside=args.ncside,
                    n_particles=args.n, precision=Precision.PARITY)
    eng = Engine(cfg)

    t0 = time.time()
    if os.path.exists(ck_path) and os.path.exists(done_path):
        with open(done_path) as f:
            done = int(f.read().strip())
        state = ckpt.load_state(ck_path)
        print(f"[{tag}] resumed at step {done} from {ck_path}", flush=True)
    else:
        state = eng.init_state()
        done = 0
        print(f"[{tag}] initialized ({time.time()-t0:.1f}s)", flush=True)

    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        state = eng.run(state, n)
        done += n
        ckpt.save_state(ck_path, state)
        with open(done_path, "w") as f:
            f.write(str(done))
        el = time.time() - t0
        print(f"[{tag}] step {done}/{args.steps}  "
              f"({el:.0f}s, {el/max(1,done):.2f}s/step, "
              f"collisions={int(np.asarray(state.collisions))})", flush=True)

    x, y, c = eng.result(state)
    ok = (abs(x - args.exp_x) <= 0.001 and abs(y - args.exp_y) <= 0.001
          and c == args.exp_c)
    print(f"[{tag}] result: x={x:.3f} y={y:.3f} c={c}  "
          f"expected: x={args.exp_x:.3f} y={args.exp_y:.3f} c={args.exp_c}",
          flush=True)
    print(f"[{tag}] {'PASS' if ok else 'FAIL'} "
          f"({time.time()-t0:.0f}s total)", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
