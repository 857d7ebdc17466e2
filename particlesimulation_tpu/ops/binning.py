"""Cell binning: particle -> cell keys, stable sort, segment geometry.

The reference rebuilds pointer buckets every step in ascending particle-index
order (reference serial/parsim.cpp:261-290). Here binning is a lexicographic
sort by (cell key, particle id): within a cell, particles appear in ascending
original index — the same in-bucket order, which the parity path's FP
accumulation order depends on (SURVEY §2.4 P3).

Out-of-range cells (the reference's ``[PANIC2]`` skip-and-continue,
serial/parsim.cpp:276-280) map to a sentinel key ``ncells`` that sorts last
and is masked out of COM, forces and collisions — faithfully reproducing the
"skipped particle integrates ballistically" behavior while never dropping a
particle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cell_keys(x, y, side: float, ncside: int):
    """Cell key per particle; sentinel ``ncside**2`` for out-of-range.

    Matches ``int(coord / (side/ncside))`` with C truncation-toward-zero
    (reference serial/parsim.cpp:268-272).
    """
    w = jnp.asarray(side / ncside, dtype=x.dtype)
    cx = (x / w).astype(jnp.int32)
    cy = (y / w).astype(jnp.int32)
    nc = jnp.int32(ncside)
    valid = (cx >= 0) & (cx < nc) & (cy >= 0) & (cy < nc)
    key = jnp.where(valid, cy * nc + cx, jnp.int32(ncside * ncside))
    return key, valid


def sort_by_cell(key, pid, *arrays):
    """Lexicographic sort by (key, pid); returns (key, pid, *arrays) sorted."""
    return jax.lax.sort((key, pid) + tuple(arrays), num_keys=2)


def segment_positions(key_sorted):
    """Per-particle position within its cell segment, for sorted keys.

    Returns (pos_in_cell, is_segment_start). pos_in_cell matches the
    reference's in-bucket index j (buckets are filled in ascending particle
    order, serial/parsim.cpp:265-289).
    """
    n = key_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), key_sorted[1:] != key_sorted[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(first, idx, jnp.int32(0)))
    return idx - seg_start, first


def max_occupancy(pos_in_cell, valid):
    """Max particles in any real (non-sentinel) cell; dynamic scalar."""
    return jnp.max(jnp.where(valid, pos_in_cell, jnp.int32(-1))) + 1
