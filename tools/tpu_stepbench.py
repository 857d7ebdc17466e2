"""Per-step cost of the fast engine, measured inside one device call.

The remote TPU tunnel has a ~30ms per-call roundtrip floor and very slow
host→device bulk transfers, so: (1) initial conditions are generated
*on device* (same distributions as the reference initializer — throughput
benchmarking needs the workload shape, not the exact bits); (2) per-step
time = (t(run K) - t(run 1)) / (K - 1) with scalar-readback fences.

Usage: python tools/tpu_stepbench.py [N] [ncside] [steps] [sweep|dense]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_init_state(config, engine):
    """Reference-shaped initial conditions generated on device (f32)."""
    from particlesimulation_tpu.config import EPSILON2, G
    from particlesimulation_tpu.ops import binning
    from particlesimulation_tpu.state import SimState

    n, side, g = config.n_particles, config.side, config.ncside
    k = jax.random.PRNGKey(abs(config.seed))
    ks = jax.random.split(k, 5)
    u = [jax.random.uniform(kk, (n,), jnp.float32) for kk in ks]
    if config.seed < 0:
        # Normal mode (reference: negative seed -> Box-Muller N(0.5, 0.15)
        # with rejection): clustered positions for UNEVEN-shaped loads.
        u[0] = jnp.clip(jax.random.normal(ks[0], (n,)) * 0.15 + 0.5,
                        1e-6, 1 - 1e-6)
        u[1] = jnp.clip(jax.random.normal(ks[1], (n,)) * 0.15 + 0.5,
                        1e-6, 1 - 1e-6)
    x = u[0] * side
    y = u[1] * side
    vx = (u[2] - 0.5) * side / g / 5.0
    vy = (u[3] - 0.5) * side / g / 5.0
    m = u[4] * 0.01 * (g * g) / n / G * EPSILON2
    state = SimState(
        x=x, y=y, vx=vx, vy=vy, m=m,
        alive=jnp.ones(n, dtype=bool),
        pid=jnp.arange(n, dtype=jnp.int32),
        collisions=jnp.zeros((), jnp.int32),
        panics=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
    )
    key, _ = binning.cell_keys(state.x, state.y, side, g)
    key, pid, xx, yy, vvx, vvy, mm, al = binning.sort_by_cell(
        key, state.pid, state.x, state.y, state.vx, state.vy,
        state.m, state.alive)
    return state._replace(x=xx, y=yy, vx=vvx, vy=vvy, m=mm, alive=al,
                          pid=pid)


def main():
    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncside = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 51
    impl = sys.argv[4] if len(sys.argv) > 4 else "dense"
    side = float(sys.argv[5]) if len(sys.argv) > 5 else 5000.0
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    cfg = SimConfig(seed=seed, side=side, ncside=ncside, n_particles=n,
                    precision=Precision.FAST)
    if impl == "sweep":
        eng = Engine(cfg, impl="sweep")
    elif impl in ("dense", "pallas"):
        eng = Engine(cfg, impl="dense", dense_backend="pallas")
    elif impl == "xla":
        eng = Engine(cfg, impl="dense", dense_backend="xla")
    elif impl == "supercell":
        eng = Engine(cfg, impl="supercell")
        print(f"supercell S={eng._supercell_factor()}", flush=True)
    elif impl == "resident-pallas":
        eng = Engine(cfg, impl="resident", dense_backend="pallas")
    elif impl == "tiered":
        eng = Engine(cfg, impl="tiered", dense_backend="xla")
    elif impl == "banded":
        eng = Engine(cfg, impl="banded", dense_backend="xla")
    elif impl == "auto":
        eng = Engine(cfg)
    else:
        eng = Engine(cfg, impl="resident", dense_backend="xla")
    state = device_init_state(cfg, eng)
    if impl == "banded":
        from particlesimulation_tpu.ops.banded import (
            plan_bands, uniform_band_plan)
        w = cfg.side / cfg.ncside
        cx = np.clip((np.asarray(state.x) / w).astype(np.int64), 0,
                     cfg.ncside - 1)
        cy = np.clip((np.asarray(state.y) / w).astype(np.int64), 0,
                     cfg.ncside - 1)
        hist = np.bincount(cy * cfg.ncside + cx, minlength=cfg.ncells)
        band_rows = int(os.environ.get("PSIM_BAND_ROWS", "0"))
        if band_rows:
            # Forced equal-rows split (HBM-streaming A/B on uniform loads);
            # PSIM_KCAP pins K for apples-to-apples vs the resident impl
            # (whose Poisson heuristic may sit below the census max —
            # overflow retries are lossless either way).
            kc = int(os.environ.get("PSIM_KCAP", "0")) or max(
                32, (int(hist.max() * 1.1 + 4) + 31) // 32 * 32)
            eng._band_plan = uniform_band_plan(cfg.ncside, band_rows, kc)
        else:
            bp = plan_bands(hist, cfg.ncside, eng._max_kcap())
            if bp:
                eng._band_plan = tuple(tuple(p) for p in bp)
        print(f"band plan (row0, rows, kcap) = {eng._band_plan}",
              flush=True)
    if impl == "tiered":
        # Device-side states bypass init_state's occupancy census; plan
        # the tiers from this state so the first compile is right-sized.
        from particlesimulation_tpu.ops.tiered import plan_tiers
        w = cfg.side / cfg.ncside
        cx = np.clip((np.asarray(state.x) / w).astype(np.int64), 0,
                     cfg.ncside - 1)
        cy = np.clip((np.asarray(state.y) / w).astype(np.int64), 0,
                     cfg.ncside - 1)
        hist = np.bincount(cy * cfg.ncside + cx, minlength=cfg.ncells)
        eng._tier_plan = (plan_tiers(hist, cfg.ncells, eng._max_kcap())
                          or eng._default_tier_plan())
        print(f"tier plan (cap, rows) per class = {eng._tier_plan}",
              flush=True)

    if os.environ.get("PSIM_BENCH_CHUNK1"):
        # Memory-ceiling mode, chunked: at N=1e8 any device call running
        # more than ~1 step dies UNAVAILABLE through the tunnel (run(1)
        # succeeds whether first or not; run(3)/run(6) fault even as the
        # FIRST call — verification/n1e8_r5.log), consistent with a
        # per-call execution deadline, not memory. So drive the step
        # loop from the host: s = run(s, 1) x steps — end-to-end multi-
        # step evolution with one fori_loop iteration per device call.
        s = state
        del state  # 3 live states OOM; keep only the evolving one + output
        t0 = time.time()
        w = eng.run(s, 0)  # compile in its own device-call budget
        del w
        print(f"warm run(0) compile: {time.time()-t0:.1f}s", flush=True)
        # Steps per device call (default 1). The 1-step calls pay the
        # engine prologue/epilogue (slab sort <-> tiles) every call;
        # raising this amortizes them and separates per-step compute
        # from per-call overhead: per-step = t(chunk=k) - t(chunk=1)
        # over k-1 extra steps.
        chunk = int(os.environ.get("PSIM_BENCH_CHUNK1", "1") or "1")
        calls = []  # (steps_in_call, seconds)
        done = 0
        while done < steps:
            k = min(chunk, steps - done)
            t0 = time.time()
            s = eng.run(s, k)
            calls.append((k, time.time() - t0))
            done += k
            print(f"steps {done}/{steps} (call of {k}): "
                  f"{calls[-1][1]:.1f}s", flush=True)
        warm = calls[1:] if len(calls) > 1 else calls
        print(f"collisions={int(np.asarray(s.collisions))} "
              f"overflow={int(np.asarray(s.overflow))} "
              f"panics={int(np.asarray(s.panics))}", flush=True)
        alive_frac = float(np.asarray((s.m > 0).sum())) / n
        print(f"alive fraction={alive_frac:.6f}", flush=True)
        if warm:
            rates = sorted(t / k for k, t in warm)
            per = rates[len(rates) // 2]
            print(f"median warm per-step (call time / steps in call, "
                  f"includes amortized prologue/epilogue + tunnel "
                  f"dispatch) {per:.2f}s -> rate >= "
                  f"{n/per/1e6:.1f} M particle*steps/s", flush=True)
        return

    if os.environ.get("PSIM_BENCH_SINGLE"):
        # Memory-ceiling mode (N=1e8): through the axon tunnel the
        # runtime re-prepares the executable on a LATER call, and at
        # ~3 GB of live state that re-preparation faults the device
        # (verification/n1e8_r5.log: run(1) always succeeds, the second
        # call always dies — ResourceExhausted once, then UNAVAILABLE).
        # So make the full multi-step run the FIRST and primary call and
        # only then attempt the 1-step baseline for per-step math.
        t0 = time.time()
        sk = eng.run(state, steps)
        tk = time.time() - t0
        print(f"first run({steps}): {tk:.1f}s (compile+exec) "
              f"kcap={eng.kcap} dense={eng.use_dense}", flush=True)
        print(f"collisions={int(np.asarray(sk.collisions))} "
              f"overflow={int(np.asarray(sk.overflow))} "
              f"panics={int(np.asarray(sk.panics))}", flush=True)
        del sk
        try:
            t0 = time.time()
            s1 = eng.run(state, 1)
            t1 = time.time() - t0
            del s1
            per = (tk - t1) / (steps - 1)
            print(f"run(1): {t1*1000:.1f} ms -> per-step {per*1000:.2f} ms; "
                  f"rate {n/per/1e6:.1f} M particle*steps/s", flush=True)
        except Exception as e:  # noqa: BLE001 — record, don't lose the run
            print(f"baseline run(1) unavailable ({type(e).__name__}); "
                  f"upper bound per-step <= {tk/steps*1000:.1f} ms "
                  f"(compile included)", flush=True)
        return

    t0 = time.time()
    s1 = eng.run(state, 1)
    print(f"first run(1): {time.time()-t0:.1f}s (compile+exec) "
          f"kcap={eng.kcap} dense={eng.use_dense}", flush=True)
    # Free the probe output before the next dispatch: at N=1e8 each live
    # SimState is ~3 GB of HBM and three copies (input + probe + run
    # output) is the difference between fitting and ResourceExhausted
    # (measured: sweep-1e8 run(1) succeeded, run(steps) with the probe
    # still live OOMed — verification/n1e8_r5.log first attempt).
    del s1
    # Warm pass at the full step count: the tunnel runtime occasionally
    # re-prepares the executable on a later call (~90 s one-time stall,
    # observed 2026-08-17 — run(64) fast, run(80) 87 s, run(101) fast
    # again); absorbing it unmeasured keeps the steady-state numbers
    # honest. Best-of-2 guards against residual transients.
    t0 = time.time()
    eng.run(state, steps)
    print(f"warm run({steps}): {time.time()-t0:.1f}s", flush=True)
    best = None
    sk = None
    for _rep in range(2):
        t0 = time.time()
        s1 = eng.run(state, 1)
        t1 = time.time() - t0
        del s1
        del sk  # previous rep's output (None on the first)
        t0 = time.time()
        sk = eng.run(state, steps)
        tk = time.time() - t0
        per = (tk - t1) / (steps - 1)
        print(f"run(1): {t1*1000:.1f} ms; run({steps}): {tk*1000:.1f} ms "
              f"-> per-step {per*1000:.2f} ms", flush=True)
        if best is None or per < best:
            best = per
    per = best
    print(f"per-step {per*1000:.2f} ms; "
          f"rate {n/per/1e6:.1f} M particle*steps/s; "
          f"collisions={int(np.asarray(sk.collisions))} "
          f"overflow={int(np.asarray(sk.overflow))}", flush=True)


if __name__ == "__main__":
    main()
