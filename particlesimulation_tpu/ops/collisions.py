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


# uint32 pair ranks are exact while (kmax+1)² ≤ 2³² ⇔ kmax < RANK_LIMIT.
RANK_LIMIT = 65535


def rank_overflow(kmax):
    """In-graph flag: uint32 pair ranks ``pos_j*(kmax+1)+pos_k`` would wrap.

    The engine folds this into its ``overflow`` telemetry so a pathological
    configuration fails loudly instead of silently corrupting the collision
    set rule (the reference has no analog — its sequential scan has no rank
    domain). When the flag is up the detection sweeps below short-circuit
    to zero trips: their output is unusable either way, and the caller
    raises without first paying an O(N·kmax) sweep.
    """
    return (kmax >= RANK_LIMIT).astype(jnp.int32)


def detect_collisions(x, y, alive, key, pos_in_cell, kmax, epsilon: float,
                      ncells: int):
    """Returns (count int32, died bool array).

    Pair ranks are uint32 ``pos_j*(kmax+1) + pos_k``; exact while
    ``kmax < 65535`` (flagged in-graph by :func:`rank_overflow`, folded
    into the engine's ``overflow`` telemetry).
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

    nsweep = jnp.where(rank_overflow(kmax) > 0, 0, jnp.maximum(kmax - 1, 0))
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


def detect_collisions_blocked(x, y, alive, key, pos_in_cell, kmax,
                              epsilon: float, ncells: int,
                              block: int = 2048):
    """Occupancy-tiered :func:`detect_collisions` (exact, order-free).

    Same blocking as ``forces.pairwise_forces_parity_blocked``: each block
    of lanes sweeps offsets only to its own max cell occupancy, cutting
    ``N·kmax`` to ``Σ_blocks B·kmax_block``. Unlike the force pass no FP
    ordering argument is needed — the min-accumulate is an exact integer
    lattice operation and the count is an integer sum. Cross-block
    endpoint updates are avoided by having every lane scan *both*
    directions for its own min (each pair's distance is computed twice);
    the count phase then reads the finished global ``ft`` array.
    """
    n = x.shape[0]
    dt = x.dtype
    eps = jnp.asarray(epsilon, dt)
    INF = jnp.uint32(0xFFFFFFFF)
    base = (kmax + 1).astype(jnp.uint32)
    from particlesimulation_tpu.ops.forces import cell_occupancy_per_lane

    b = int(min(block, max(128, n)))
    n_pad = -(-n // b) * b
    pad = n_pad - n

    occ = cell_occupancy_per_lane(key)
    pos_u = pos_in_cell.astype(jnp.uint32)
    if pad:
        key_p = jnp.concatenate([key, jnp.full((pad,), ncells, key.dtype)])
        occ_p = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
        x_p = jnp.concatenate([x, jnp.zeros((pad,), dt)])
        y_p = jnp.concatenate([y, jnp.zeros((pad,), dt)])
        a_p = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
        pos_p = jnp.concatenate([pos_u, jnp.zeros((pad,), jnp.uint32)])
    else:
        key_p, occ_p, x_p, y_p, a_p, pos_p = key, occ, x, y, alive, pos_u

    nb = n_pad // b
    kmax_b = occ_p.reshape(nb, b).max(axis=1)
    ovf = rank_overflow(kmax)

    x2, y2 = _doubled(x_p), _doubled(y_p)
    a2, k2 = _doubled(a_p), _doubled(key_p)
    p2 = _doubled(pos_p)
    bidx = jnp.arange(b, dtype=jnp.int32)
    npad32 = jnp.int32(n_pad)
    blocks = jnp.arange(nb, dtype=jnp.int32)

    def local(bi):
        s0 = bi * b
        return (kmax_b[bi], s0.astype(jnp.int32) + bidx,
                jax.lax.dynamic_slice_in_dim(x_p, s0, b),
                jax.lax.dynamic_slice_in_dim(y_p, s0, b),
                jax.lax.dynamic_slice_in_dim(a_p, s0, b),
                jax.lax.dynamic_slice_in_dim(key_p, s0, b),
                jax.lax.dynamic_slice_in_dim(pos_p, s0, b))

    def partner(st):
        return (jax.lax.dynamic_slice_in_dim(x2, st, b),
                jax.lax.dynamic_slice_in_dim(y2, st, b),
                jax.lax.dynamic_slice_in_dim(a2, st, b),
                jax.lax.dynamic_slice_in_dim(k2, st, b),
                jax.lax.dynamic_slice_in_dim(p2, st, b))

    def min_block(bi):
        kb, idx, xb, yb, ab, keyb, posb = local(bi)
        s0 = bi * b
        real = keyb < ncells

        def body(t, ft):
            o = t + 1
            # Self as the lower endpoint: partner at i+o.
            xp, yp, ap, kp, pp = partner(s0 + o)
            mask = (idx < n - o) & (keyb == kp) & real & ab & ap
            dx = xb - xp
            dy = yb - yp
            hit_up = mask & (jnp.sqrt(dx * dx + dy * dy) < eps)
            rank_up = posb * base + pp
            ft = jnp.minimum(ft, jnp.where(hit_up, rank_up, INF))
            # Self as the upper endpoint: partner at i-o.
            xp, yp, ap, kp, pp = partner(s0 + npad32 - o)
            mask = (idx >= o) & (keyb == kp) & real & ab & ap
            dx = xp - xb
            dy = yp - yb
            hit_dn = mask & (jnp.sqrt(dx * dx + dy * dy) < eps)
            rank_dn = pp * base + posb
            ft = jnp.minimum(ft, jnp.where(hit_dn, rank_dn, INF))
            return ft

        ft0 = (keyb * 0).astype(jnp.uint32) + INF
        trips = jnp.where(ovf > 0, 0, jnp.maximum(kb - 1, 0))
        return jax.lax.fori_loop(0, trips, body, ft0)

    ft = jax.lax.map(min_block, blocks).reshape(-1)
    ft2 = _doubled(ft)

    def count_block(bi):
        kb, idx, xb, yb, ab, keyb, posb = local(bi)
        s0 = bi * b
        real = keyb < ncells
        ftb = jax.lax.dynamic_slice_in_dim(ft, s0, b)

        def body(t, cnt):
            o = t + 1
            xp, yp, ap, kp, pp = partner(s0 + o)
            mask = (idx < n - o) & (keyb == kp) & real & ab & ap
            dx = xb - xp
            dy = yb - yp
            mask = mask & (jnp.sqrt(dx * dx + dy * dy) < eps)
            rank = posb * base + pp
            ftp = jax.lax.dynamic_slice_in_dim(ft2, s0 + o, b)
            hit = mask & (ftb == rank) & (ftp == rank)
            return cnt + jnp.sum(hit, dtype=jnp.int32)

        trips = jnp.where(ovf > 0, 0, jnp.maximum(kb - 1, 0))
        return jax.lax.fori_loop(0, trips, body, jnp.int32(0))

    count = jnp.sum(jax.lax.map(count_block, blocks), dtype=jnp.int32)
    died = ft[:n] != INF
    return count, died


def apply_deaths(m, alive, died):
    """Kill merged particles: alive=false, m=0 (serial/parsim.cpp:414-418)."""
    zero = jnp.asarray(0.0, m.dtype)
    return jnp.where(died, zero, m), alive & ~died
