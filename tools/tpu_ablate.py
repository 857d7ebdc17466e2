"""Phase ablation of the fast step on the live device.

Measures, inside one process (per-variant per-step time via
(t(K runs) - t(1 run)) / (K-1) wrapped in fori_loop):
  sort8      — the per-step lexicographic sort alone
  segments   — segment positions + occupancy
  com        — segment-sum COM + stencil tables
  forces     — the pairwise sweep + monopole
  collide    — the two collision sweeps
  integrate  — integrator + wrap
  full       — the complete step

Usage: python tools/tpu_ablate.py [N] [ncside] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from particlesimulation_tpu.config import DELTAT, EPSILON, Precision, SimConfig
    from particlesimulation_tpu.engine import Engine, make_step
    from particlesimulation_tpu.ops import binning, collisions, com, forces, integrate, stencil
    from tools.tpu_stepbench import device_init_state

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncside = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    cfg = SimConfig(seed=1, side=5000.0, ncside=ncside, n_particles=n,
                    precision=Precision.FAST)
    eng = Engine(cfg, use_dense=False)
    state = device_init_state(cfg, eng)
    side, nc, ncells = cfg.side, cfg.ncside, cfg.ncells

    x, y, vx, vy, m, alive, pid = (state.x, state.y, state.vx, state.vy,
                                   state.m, state.alive, state.pid)

    def variant_sort(c, _):
        key, _v = binning.cell_keys(x + c, y, side, nc)
        out = binning.sort_by_cell(key, pid, x, y, vx, vy, m, alive)
        return c + out[2][0] * 0, None

    def variant_segments(c, _):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        return c + kmax.astype(x.dtype) * 0, None

    def variant_com(c, _):
        key, _v = binning.cell_keys(x + c, y, side, nc)
        M, MX, MY = com.com_fast(key, x, y, m, ncells)
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        return c + ml[0, 0] * 0, None

    def variant_forces(c, _):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        M, MX, MY = com.com_fast(key, x, y, m, ncells)
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        fx, fy = forces.pairwise_forces_fast(x, y, m, alive, key, kmax, ncells)
        fx, fy = forces.monopole_forces(x, y, m, alive, key, fx, fy,
                                        ml, mxl, myl, ncells, False)
        return c + fx[0] * 0, None

    def variant_collide(c, _):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        count, died = collisions.detect_collisions(
            x, y, alive, key, pos, kmax, EPSILON, ncells)
        return c + count.astype(x.dtype) * 0, None

    def variant_integrate(c, _):
        nx, ny, nvx, nvy = integrate.integrate(x + c, y, vx, vy, m, x * 0,
                                               y * 0, side, DELTAT)
        return c + nx[0] * 0, None

    step = make_step(cfg)

    def variant_full(c, _):
        st = state._replace(x=x + c)
        out = step(st)
        return c + out.x[0] * 0, None

    variants = [
        ("sort8", variant_sort),
        ("segments", variant_segments),
        ("com+stencil", variant_com),
        ("forces(sweep)", variant_forces),
        ("collide(sweep)", variant_collide),
        ("integrate", variant_integrate),
        ("full-step", variant_full),
    ]

    for name, fn in variants:
        @jax.jit
        def runk(k, fn=fn):
            def body(i, cc):
                c2, _ = fn(cc, None)
                return c2
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        t0 = time.time()
        float(np.asarray(runk(1)))
        tc = time.time() - t0
        t0 = time.time()
        float(np.asarray(runk(1)))
        t1 = time.time() - t0
        t0 = time.time()
        float(np.asarray(runk(reps + 1)))
        tk = time.time() - t0
        per = (tk - t1) / reps
        print(f"{name:>16s}: {per*1000:8.2f} ms/iter "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
