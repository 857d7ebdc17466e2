"""Collision detection and merge with the reference's set-counting rule.

Reference semantics (serial/parsim.cpp:388-420): per cell, scan pairs (j, k)
with j < k in bucket order; a pair closer than EPSILON is a collision; the
counter increments only when *neither* endpoint is already in the cell's
per-step collision set; every set member then dies (alive=false, m=0).

Key observation making this vectorizable without a sequential pair scan:
``in_set[p]`` at the time pair (j,k) is visited ⇔ some colliding pair
lexicographically earlier involves p. Hence a pair (j,k) increments the
counter iff it is the lexicographically-first colliding pair for BOTH
endpoints. With ``first_rank[p] = min(rank of colliding pairs involving p)``:

    count = #{ colliding (j,k) : rank(j,k) == first_rank[j] == first_rank[k] }
    dies(p) = first_rank[p] < INF

This is exact — not an approximation — and needs only two masked offset
sweeps (min-accumulate, then count) over the sorted representation.

Distances use post-move positions on freshly rebuilt buckets. The reference
uses its incrementally-repaired buckets here (serial/parsim.cpp:234-259,
whose erase-while-iterating is buggy); SURVEY §2.2 C9 verified that a clean
rebuild reproduces every golden vector, so the rebuild is the spec here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particlesimulation_tpu.ops.forces import _doubled, _shift_down, _shift_up


def detect_collisions(x, y, alive, key, pos_in_cell, kmax, epsilon: float,
                      ncells: int):
    """Returns (count int32, died bool array).

    Pair ranks are uint32 ``pos_j*(kmax+1) + pos_k``; exact while
    ``kmax < 65535`` (guarded by the engine's occupancy telemetry).
    """
    n = x.shape[0]
    dt = x.dtype
    eps = jnp.asarray(epsilon, dt)
    INF = jnp.uint32(0xFFFFFFFF)
    base = (kmax + 1).astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    real = key < ncells
    x2, y2 = _doubled(x), _doubled(y)
    a2, k2 = _doubled(alive), _doubled(key)
    p2 = _doubled(pos_in_cell.astype(jnp.uint32))

    def pair_data(o):
        xp = _shift_up(x2, o, n)
        yp = _shift_up(y2, o, n)
        ap = _shift_up(a2, o, n)
        kp = _shift_up(k2, o, n)
        pp = _shift_up(p2, o, n)
        mask = (idx < n - o) & (key == kp) & real & alive & ap
        dx = x - xp   # getDistance from the outer (lower-index) particle
        dy = y - yp
        dist = jnp.sqrt(dx * dx + dy * dy)
        mask = mask & (dist < eps)
        rank = pos_in_cell.astype(jnp.uint32) * base + pp
        return mask, rank

    def min_body(t, ft):
        o = t + 1
        mask, rank = pair_data(o)
        cand = jnp.where(mask, rank, INF)
        ft = jnp.minimum(ft, cand)
        cand_dn = _shift_down(_doubled(cand), o, n)
        ft = jnp.minimum(ft, jnp.where(idx >= o, cand_dn, INF))
        return ft

    nsweep = jnp.maximum(kmax - 1, 0)
    # Data-derived inits keep varying-axes types aligned under shard_map.
    ft0 = (key * 0).astype(jnp.uint32) + INF
    ft = jax.lax.fori_loop(0, nsweep, min_body, ft0)

    def count_body(t, cnt):
        o = t + 1
        mask, rank = pair_data(o)
        ftp = _shift_up(_doubled(ft), o, n)
        hit = mask & (ft == rank) & (ftp == rank)
        return cnt + jnp.sum(hit, dtype=jnp.int32)

    count = jax.lax.fori_loop(0, nsweep, count_body, key[0] * 0)
    died = ft != INF
    return count, died


def apply_deaths(m, alive, died):
    """Kill merged particles: alive=false, m=0 (serial/parsim.cpp:414-418)."""
    zero = jnp.asarray(0.0, m.dtype)
    return jnp.where(died, zero, m), alive & ~died
