"""Microbenchmarks of the primitive ops the step is built from.

Timings use a scalar readback fence — on remote-tunneled backends
``block_until_ready`` can return at dispatch, so wall-clocking without a
readback measures nothing (see utils/runtime.py notes).

Usage: python tools/tpu_microbench.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync_scalar(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def timed(name, f, *a, reps=2):
    f_ = jax.jit(f)
    t0 = time.time()
    r = f_(*a)
    sync_scalar(r)
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = f_(*a)
        sync_scalar(r)
        ts.append(time.time() - t0)
    print(f"{name}: first(compile+exec) {tc:.2f}s steady {min(ts)*1000:.1f} ms",
          flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 10000, n), jnp.int32)
    pid = jnp.arange(n, dtype=jnp.int32)
    x = jnp.asarray(rng.uniform(0, 5000, n), jnp.float32)

    timed("noop", lambda k: (k[0] + 1).astype(jnp.float32), key)
    timed("sort2", lambda k, p: jax.lax.sort((k, p), num_keys=2)[0], key, pid)
    timed("sort8",
          lambda k, p, v: jax.lax.sort((k, p, v, v, v, v, v, v),
                                       num_keys=2)[0], key, pid, x)
    timed("scatter_set",
          lambda k, v: jnp.zeros(10000 * 256, jnp.float32)
          .at[k * 256 + (pid % 256)].set(v), key, x)
    timed("gather", lambda k, v: v[k], key, x)
    timed("segsum",
          lambda k, v: jax.ops.segment_sum(v, k, num_segments=10001), key, x)

    x2 = jnp.concatenate([x, x])

    def sweep(iters):
        def f(xx2):
            def body(t_, acc):
                xp = jax.lax.dynamic_slice_in_dim(xx2, t_ + 1, n)
                return acc + xp * 0.5
            return jax.lax.fori_loop(0, iters, body, jnp.zeros(n, jnp.float32))
        return f

    timed("sweep10_dynslice", sweep(10), x2)
    timed("sweep50_dynslice", sweep(50), x2)
    timed("cummax", lambda k: jax.lax.cummax(k), key)
    print("MICROBENCH DONE", flush=True)


if __name__ == "__main__":
    main()
