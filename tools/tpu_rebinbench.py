"""Rebin cost attribution microbench (on-device, scalar-readback fenced).

The round-2 ablation put ops/resident.rebin at ~55% of the fast step
(4.2 of 7.6 ms at N=1e6). This tool isolates where those ms go:

* rebin's delivery while_loop delivers at most ONE arrival per
  (row, direction) per round, and its `left > 0` condition is global —
  a single row with r pending same-direction arrivals forces r full-grid
  rounds. At bench occupancy (~2 movers/row/step over 1e4 rows) the
  expected max over 8e4 (row, dir) Poisson draws is several, so the loop
  plausibly runs 4-6 full rounds per step.

Variants (each timed as a jitted fori_loop of `iters` bodies over a
realistic mover-generating displacement field):
  move       — displacement + wrap only (baseline for the harness itself)
  full       — displacement + rebin as shipped
  r1 / r2    — displacement + rebin capped at 1 / 2 rounds (per-round cost)
Plus a host-stepped round-count census: how many rounds the while_loop
actually needs, distribution over `census` steps.

Usage: JAX_PLATFORMS=axon python tools/tpu_rebinbench.py [iters] [census]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from particlesimulation_tpu.config import Precision, SimConfig
    from particlesimulation_tpu.engine import Engine, make_resident_run
    from particlesimulation_tpu.ops import resident as res
    from tools.tpu_stepbench import device_init_state

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    census = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    ncside = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    cfg = SimConfig(seed=1, side=5000.0, ncside=ncside, n_particles=n,
                    precision=Precision.FAST)
    eng = Engine(cfg)
    state = device_init_state(cfg, eng)
    kcap = eng.kcap or eng._heuristic_kcap()
    _, prologue, _ = make_resident_run(cfg, kcap)
    ts = jax.jit(prologue)(state)

    side, nc = cfg.side, cfg.ncside

    # Displacement field scaled like the reference's velocities
    # (|v| <= side/ncside/10, dt=0.1 => ~1% of a cell per axis per step,
    # doubled here to provoke bench-like mover counts).
    k0 = jax.random.PRNGKey(0)
    shape = ts.x.shape
    vmax = side / nc / 10.0
    dxv = jax.random.uniform(k0, shape, jnp.float32, -vmax, vmax) * 0.2
    dyv = jax.random.uniform(jax.random.PRNGKey(1), shape, jnp.float32,
                             -vmax, vmax) * 0.2

    def move(st):
        x = jnp.where(st.occ, (st.x + dxv) % side, st.x)
        y = jnp.where(st.occ, (st.y + dyv) % side, st.y)
        return st._replace(x=x, y=y)

    def bench(name, body):
        @jax.jit
        def many(st):
            def it(_, s):
                return body(s)
            return jax.lax.fori_loop(0, iters, it, st)

        out = many(ts)               # compile + warm
        np.asarray(out.x[0, 0])      # fence
        t0 = time.perf_counter()
        out = many(ts)
        np.asarray(out.x[0, 0])
        dt = time.perf_counter() - t0
        print(f"{name:12s} {dt / iters * 1000:8.3f} ms/iter", flush=True)
        return dt / iters

    t_move = bench("move", move)

    def full(st):
        st2, _ = res.rebin(move(st), side, nc, kcap)
        return st2

    t_full = bench("full", full)

    saved = res.MAX_ROUNDS
    try:
        res.MAX_ROUNDS = 1
        t_r1 = bench("rounds<=1", full)
        res.MAX_ROUNDS = 2
        t_r2 = bench("rounds<=2", full)
    finally:
        res.MAX_ROUNDS = saved

    per_round = t_r2 - t_r1
    print(f"\nderived: harness {t_move*1e3:.3f} ms; "
          f"rebin-full {(t_full-t_move)*1e3:.3f} ms; "
          f"1-round {(t_r1-t_move)*1e3:.3f} ms; "
          f"per-extra-round {per_round*1e3:.3f} ms; "
          f"implied rounds {(t_full-t_r1)/per_round + 1:.1f}", flush=True)

    # Round-count census: host-stepped single rounds until delivered.
    @jax.jit
    def step_move(st):
        return move(st)

    @jax.jit
    def one_round(st):
        saved2 = res.MAX_ROUNDS
        res.MAX_ROUNDS = 1
        try:
            return res.rebin(st, side, nc, kcap)
        finally:
            res.MAX_ROUNDS = saved2

    st = ts
    counts = []
    movers = []
    for s in range(census):
        st = step_move(st)
        rounds = 0
        left = None
        while True:
            st, l = one_round(st)
            l = int(np.asarray(l))
            if left is None:
                pass
            rounds += 1
            if l == 0 or rounds > 64:
                break
        # movers delivered this step: count via first-round entry
        counts.append(rounds)
        print(f"step {s}: rounds={rounds}", flush=True)
    print(f"census: rounds min={min(counts)} max={max(counts)} "
          f"mean={sum(counts)/len(counts):.1f}", flush=True)


if __name__ == "__main__":
    main()
