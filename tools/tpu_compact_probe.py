"""Probe: cost of the mover-compaction primitives on silicon.

The rebin straggler plan replaces full-grid delivery rounds 2..R with
one compaction: nonzero(size=MCAP) over the (C, K) mover mask, an 8k
sort, small gathers, and one scatter. Viability hinges on the cost of
nonzero / small gathers / small scatters at flagship shapes
(C=10000, K=160). Measures each primitive and the full chain.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:50s} {dt:8.3f} ms", flush=True)


def main():
    C, K = 10000, 160
    MCAP = 8192
    n = C * K
    key = jax.random.PRNGKey(0)
    # ~2k stragglers scattered over the grid
    mask = jax.random.uniform(key, (n,)) < (2000.0 / n)
    vals = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)
    dest = jax.random.randint(jax.random.PRNGKey(2), (MCAP,), 0, C)

    bench("sum(mask)", lambda m: jnp.sum(m, dtype=jnp.int32), mask)
    bench("nonzero(size=8192)",
          lambda m: jnp.nonzero(m, size=MCAP, fill_value=n - 1)[0], mask)

    idx = jnp.nonzero(mask, size=MCAP, fill_value=n - 1)[0]
    bench("gather 8192 of 1.6M", lambda v, i: v[i], vals, idx)
    bench("scatter 8192 into 1.6M",
          lambda v, i: v.at[i].set(0.0), vals, idx)
    bench("sort 8192 pairs",
          lambda d: jax.lax.sort((d, jnp.arange(MCAP, dtype=jnp.int32)),
                                 num_keys=1), dest)
    bench("bincount 8192 -> 10k",
          lambda d: jnp.zeros(C, jnp.int32).at[d].add(1), dest)

    def chain(mask, vals):
        idx = jnp.nonzero(mask, size=MCAP, fill_value=n - 1)[0]
        mv = vals[idx]
        row = (idx // K).astype(jnp.int32)
        row_s, idx_s = jax.lax.sort((row, idx.astype(jnp.int32)),
                                    num_keys=1)
        a_r = jnp.zeros(C, jnp.int32).at[row_s].add(
            jnp.where(row_s < C, 1, 0), mode="drop")
        occ = mask.reshape(C, K)
        fr = jnp.cumsum((~occ).astype(jnp.int32), axis=1)
        tgt = (~occ) & (fr <= a_r[:, None])
        tgt_idx = jnp.nonzero(tgt.reshape(-1), size=MCAP,
                              fill_value=n - 1)[0]
        out = vals.at[tgt_idx].set(mv, mode="drop")
        return out.at[idx].set(0.0, mode="drop")

    bench("full compact chain (2 nonzero + sort + 2 scatter)",
          chain, mask, vals)


if __name__ == "__main__" and "--transpose" not in sys.argv:
    main()


def transpose_probe():
    """Cost of (C, K) <-> (K, C) transposes (Pallas v2 I/O layout)."""
    C, K = 10000, 160
    a = jax.random.uniform(jax.random.PRNGKey(0), (C, K), jnp.float32)
    at = jnp.transpose(a)
    bench("transpose (10000,160)->(160,10000)", jnp.transpose, a)
    bench("transpose back", jnp.transpose, at)


if __name__ == "__main__" and "--transpose" in sys.argv:
    transpose_probe()
