"""Isolated pair-pass lane-rate study (the 1e7 sublinearity attribution).

PERF.md's roofline measured the fused pair pass at HALF its 1e6 lane
rate at N=1e7 inside the full step, and prior A/Bs ruled out prefetch
(Pallas double-buffering), banding depth, N3L, re-classing, and global
collision resolution as fixes. This tool separates the two remaining
hypotheses with the pass run ALONE, outside any step machinery:

* ``pairs @ 10000 cells``  — flagship 1e6 shape (10 cb=1024 blocks).
* ``pairs @ 99856 cells``  — 1e7 shape (98 blocks, ~640 MB operands).
  If the isolated pass runs at the 1e6 lane rate here, the in-step
  slowdown is PHASE INTERACTION (rebin/integrate evicting the tile
  state between passes); if it is ~2x slower here too, the pass itself
  degrades once its own operands exceed VMEM.
* ``pairs+evict @ 10000``  — flagship shape, but a 400 MB dummy-buffer
  traversal between pair passes flushes VMEM each iteration (the
  in-step eviction emulated at the small shape); ``evict-only`` is the
  subtraction control.

Occupancy, kcap, eps, coordinate scales match the bench configs
(Poisson(~mean) occupancy capped at kcap, cells of width side/ncside,
reference mass scale), so hit density — and with it the collision
branch's gating behavior — matches the real step. The pair pass is
iterated inside ONE jitted fori_loop with a dependency chain
(x += fx*1e-20: forces evaluation, numerically a no-op at f32) and a
scalar readback fence; per-iteration = (t(S) - t(1)) / (S - 1) as in
tpu_stepbench (tunnel dispatch floor).

Usage: python tools/tpu_pairbench.py [mean_occ] [kcap]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particlesimulation_tpu.config import EPSILON, G  # noqa: E402
from particlesimulation_tpu.ops import dense_xla  # noqa: E402


def make_tiles(ncells, kcap, mean_occ, ncside, side, seed=7):
    """Reference-shaped (ncells, kcap) tiles, generated on device."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    occ = jnp.minimum(
        jax.random.poisson(k1, mean_occ, (ncells, 1)), kcap
    ).astype(jnp.int32)
    lane = jnp.arange(kcap, dtype=jnp.int32)[None, :]
    used = lane < occ
    w = side / ncside
    cell = jnp.arange(ncells, dtype=jnp.int32) % (ncside * ncside)
    cx0 = (cell % ncside).astype(jnp.float32) * w
    cy0 = (cell // ncside).astype(jnp.float32) * w
    ux = jax.random.uniform(k2, (ncells, kcap), jnp.float32)
    uy = jax.random.uniform(k3, (ncells, kcap), jnp.float32)
    x = cx0[:, None] + ux * w
    y = cy0[:, None] + uy * w
    um = jax.random.uniform(k4, (ncells, kcap), jnp.float32)
    n_eff = ncells * mean_occ
    m = um * 0.01 * (ncside * ncside) / n_eff / G * (EPSILON * EPSILON)
    mf = jnp.where(used, m, 0.0)
    alive = used.astype(jnp.int32)
    pid = (jnp.arange(ncells, dtype=jnp.int32)[:, None] * kcap + lane)
    return (jnp.where(used, x, 0.0), jnp.where(used, y, 0.0), mf, alive,
            pid)


def fence(r):
    return float(np.asarray(r))


def timed_loop(name, build, steps):
    """build(S) -> jitted zero-arg fn returning a scalar; prints per-iter."""
    f1 = build(1)
    fS = build(steps)
    t0 = time.time()
    fence(f1())
    print(f"  first run(1): {time.time() - t0:.1f}s (compile+exec)",
          flush=True)
    t0 = time.time()
    fence(fS())
    print(f"  warm run({steps}): {time.time() - t0:.1f}s", flush=True)
    best = None
    for _ in range(2):
        t0 = time.time()
        fence(f1())
        t1 = time.time() - t0
        t0 = time.time()
        fence(fS())
        tS = time.time() - t0
        per = (tS - t1) / (steps - 1) * 1000.0
        print(f"  run(1): {t1 * 1000:.1f} ms; run({steps}): {tS * 1000:.1f}"
              f" ms -> per-iter {per:.2f} ms", flush=True)
        best = per if best is None else min(best, per)
    return best


def pair_loop(tiles, ncells, kcap, evict_mb=0, pairs_on=True):
    """Jitted builder: S pair passes with a dependency chain.

    Tiles are passed as jit ARGUMENTS (device buffers), never closure
    constants — at the 1e7 shape the operands are ~640 MB, and constants
    baked into the HLO exceed the axon tunnel's remote-compile request
    limit (HTTP 413, observed 2026-08-20).
    """
    x0, y0, mf, alive, pid = tiles
    impl = dense_xla.resolve_pair_impl(None, side=5000.0)

    def build(S):
        def body_with(mf_, alive_, pid_):
            def body(_, carry):
                x, y, acc, dummy = carry
                if pairs_on:
                    fx, fy, cnt, ft = impl(x, y, mf_, alive_, ncells, kcap,
                                           EPSILON, collide=True, pid=pid_)
                    # Dependency chain; fx*1e-20 underflows vs x's ulp (no
                    # numeric drift) but XLA must still evaluate the pass.
                    x = x + fx * jnp.float32(1e-20)
                    y = y + fy * jnp.float32(1e-20)
                    acc = acc + cnt + jnp.sum(ft, dtype=jnp.int32)
                if dummy is not None:
                    # One full HBM traversal of a VMEM-many-times buffer.
                    dummy = dummy * jnp.float32(1.0000001) + jnp.float32(1.0)
                    acc = acc + dummy[0].astype(jnp.int32)
                return x, y, acc, dummy

            return body

        @jax.jit
        def run_inner(x0_, y0_, mf_, alive_, pid_):
            dummy0 = (jnp.zeros((evict_mb * 1024 * 1024 // 4,),
                                jnp.float32) if evict_mb else None)
            x, y, acc, dummy = jax.lax.fori_loop(
                0, S, body_with(mf_, alive_, pid_),
                (x0_, y0_, jnp.int32(0), dummy0))
            out = acc.astype(jnp.float32) + x[0, 0] + y[0, 0]
            if dummy is not None:
                out = out + dummy[1]
            return out

        return lambda: run_inner(x0, y0, mf, alive, pid)

    return build


def main():
    mean_occ = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    kcap = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    print(f"backend={jax.default_backend()} mean_occ={mean_occ} "
          f"kcap={kcap} cb={dense_xla.CELL_BLOCK} "
          f"impl={os.environ.get('PSIM_PAIR_IMPL', '(auto)')}", flush=True)

    if os.environ.get("PSIM_PAIRBENCH_SMOKE"):
        # CPU correctness smoke: tiny shapes, same code paths.
        configs = [
            ("pairs-only 1e6-shape (10 blocks)", 64, 8, 3, 0, True),
            ("pairs-only 1e7-shape (98 blocks)", 128, 12, 3, 0, True),
            ("evict-only 400MB control", 64, 8, 3, 1, False),
            ("pairs+evict 1e6-shape", 64, 8, 3, 1, True),
        ]
    else:
        configs = [
            # (label, ncells, ncside, steps, evict_mb, pairs_on)
            ("pairs-only 1e6-shape (10 blocks)", 10000, 100, 41, 0, True),
            ("pairs-only 1e7-shape (98 blocks)", 99856, 316, 11, 0, True),
            ("evict-only 400MB control", 10000, 100, 41, 400, False),
            ("pairs+evict 1e6-shape", 10000, 100, 41, 400, True),
        ]
    only = os.environ.get("PSIM_PAIRBENCH_ONLY")
    if only:
        configs = [c for c in configs if only in c[0]]
    results = {}
    for label, ncells, ncside, steps, evict_mb, pairs_on in configs:
        print(f"== {label}", flush=True)
        tiles = make_tiles(ncells, kcap, mean_occ, ncside, 5000.0)
        jax.block_until_ready(tiles)
        build = pair_loop(tiles, ncells, kcap, evict_mb=evict_mb,
                          pairs_on=pairs_on)
        per = timed_loop(label, build, steps)
        lanes = ncells * kcap * kcap
        if pairs_on:
            print(f"  -> {per:.2f} ms/pass; lane rate "
                  f"{lanes / per * 1e3 / 1e9:.1f} G lanes/s", flush=True)
        results[label] = per
    po = results.get("pairs-only 1e6-shape (10 blocks)")
    pe = results.get("pairs+evict 1e6-shape")
    ev = results.get("evict-only 400MB control")
    if po and pe and ev:
        print(f"eviction-adjusted pairs @1e6-shape: {pe - ev:.2f} ms "
              f"(pairs-only {po:.2f})", flush=True)
    print("PAIRBENCH DONE", flush=True)


if __name__ == "__main__":
    main()
