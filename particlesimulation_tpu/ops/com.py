"""Per-cell center-of-mass computation.

Two formulations over the sorted representation:

* :func:`com_parity` — replicates the reference's *incremental running
  weighted mean* (``Cell::addParticle``, reference serial/parsim.cpp:93-106)
  bit for bit, including its quirks: a zero-mass cell adopts the position of
  whatever particle is added next (even a dead, massless one), and adding a
  dead particle to a massive cell performs a rounding-perturbing
  ``(mx*m)/m`` update. Non-associative, so it runs as one ``lax.scan`` over
  the sorted particles.
* :func:`com_fast` — order-free ``segment_sum(m*x)/segment_sum(m)``; same
  math, different rounding; used by the fast engine.

Both return flat ``(ncells,)`` arrays indexed by ``cy*ncside + cx``; empty
cells hold zeros (the reference's freshly-assigned ``Cell{}``,
serial/parsim.cpp:263-264).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_ends(key_sorted):
    n = key_sorted.shape[0]
    return jnp.concatenate(
        [key_sorted[1:] != key_sorted[:-1], jnp.ones((1,), dtype=bool)]
    )


def com_parity(key_sorted, x, y, m, ncells: int):
    """Exact-order COM. Returns (M, MX, MY) each (ncells,) in x's dtype."""
    dt = x.dtype

    def body(carry, inp):
        ck, cm, cmx, cmy = carry
        k, xi, yi, mi = inp
        fresh = k != ck
        m0 = jnp.where(fresh, jnp.asarray(0.0, dt), cm)
        mx0 = jnp.where(fresh, jnp.asarray(0.0, dt), cmx)
        my0 = jnp.where(fresh, jnp.asarray(0.0, dt), cmy)
        empty = m0 == 0
        # Guard the division when empty (would be 0/0); selected away by where.
        denom = jnp.where(empty, jnp.asarray(1.0, dt), m0 + mi)
        nmx = jnp.where(empty, xi, (mx0 * m0 + mi * xi) / denom)
        nmy = jnp.where(empty, yi, (my0 * m0 + mi * yi) / denom)
        nm = m0 + mi
        return (k, nm, nmx, nmy), (nm, nmx, nmy)

    # Derive the init carry from the inputs so its varying-axes type matches
    # the loop carry under shard_map (a literal would be replicated).
    zero_k = key_sorted[0] * 0
    zero_v = x[0] * 0
    init = (zero_k - 1, zero_v, zero_v, zero_v)
    _, (ms, mxs, mys) = jax.lax.scan(body, init, (key_sorted, x, y, m))

    is_end = _segment_ends(key_sorted)
    # Sentinel-key (out-of-range) segments and non-end rows all write to the
    # discard slot ncells.
    tgt = jnp.where(is_end & (key_sorted < ncells), key_sorted,
                    jnp.int32(ncells))
    zero = jnp.zeros((ncells + 1,), dtype=dt)
    M = zero.at[tgt].set(ms, mode="drop")[:ncells]
    MX = zero.at[tgt].set(mxs, mode="drop")[:ncells]
    MY = zero.at[tgt].set(mys, mode="drop")[:ncells]
    return M, MX, MY


def com_fast(key_sorted, x, y, m, ncells: int):
    """Order-free COM via segment sums (fast engine)."""
    dt = x.dtype
    num = ncells + 1  # sentinel slot for out-of-range keys
    M = jax.ops.segment_sum(m, key_sorted, num_segments=num)
    SX = jax.ops.segment_sum(m * x, key_sorted, num_segments=num)
    SY = jax.ops.segment_sum(m * y, key_sorted, num_segments=num)
    safe = jnp.where(M > 0, M, jnp.asarray(1.0, dt))
    MX = jnp.where(M > 0, SX / safe, jnp.asarray(0.0, dt))
    MY = jnp.where(M > 0, SY / safe, jnp.asarray(0.0, dt))
    return M[:ncells], MX[:ncells], MY[:ncells]
