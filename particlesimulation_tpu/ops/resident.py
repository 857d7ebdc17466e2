"""Slot-resident rebinning: move particles between cell tiles without a sort.

The sorted-particle representation pays ~10ms-per-1e6-element scatter/gather
and a lexicographic sort every step on TPU. The resident representation
keeps the *state itself* in (ncells, K) slot tiles and re-bins by moving the
few particles that changed cell ("movers") directly between rows:

1. per slot, the destination cell from the post-move position; a mover's
   next hop is one of the 8 neighbor directions (sign of the minimal-image
   cell delta — diagonal moves allowed);
2. for each direction, departing-slot tiles roll across the periodic cell
   grid (``jnp.roll`` — a reindex copy, no gathers);
3. arrivals keep their slot index (rotated by the round number) and land
   only in slots that were free at round start; slot contention between
   directions resolves by fixed direction priority, losers simply remain
   movers for the next round. Everything is rolls and masked selects —
   no gathers, no scatters, no matmuls, bit-exact f32 data movement;
4. multi-cell movers (rare: post-slingshot speeds) hop once per round of a
   ``while_loop`` that runs until delivery (normally one or two rounds —
   the slot-index rotation guarantees contenders eventually find free
   slots when any exist).

A round cap plus an overflow flag lets the engine retry losslessly with
bigger tiles, mirroring the dense-capacity protocol.

Fragmentation is free: force/collision kernels do full K² masked work
regardless of which slots are occupied, so rows are never compacted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlesimulation_tpu.ops.stencil import STENCIL

MAX_ROUNDS = 16


class TileState(NamedTuple):
    """Slot-resident simulation state. Tile arrays are (ncells, K)."""

    x: jnp.ndarray
    y: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    m: jnp.ndarray
    occ: jnp.ndarray     # bool: slot holds a particle (alive or dead)
    pid: jnp.ndarray     # int32
    collisions: jnp.ndarray
    panics: jnp.ndarray
    overflow: jnp.ndarray


def cell_of(x, y, side: float, ncside: int):
    """Per-slot destination cell and validity (C truncation semantics)."""
    w = jnp.asarray(side / ncside, dtype=x.dtype)
    cx = (x / w).astype(jnp.int32)
    cy = (y / w).astype(jnp.int32)
    nc = jnp.int32(ncside)
    valid = (cx >= 0) & (cx < nc) & (cy >= 0) & (cy < nc)
    return cx, cy, valid


def _wrap_delta(d, ncside: int):
    """Minimal-image cell delta in [-nc/2, nc/2)."""
    nc = jnp.int32(ncside)
    half = nc // 2
    return ((d + half) % nc) - half


def _roll_grid(a, dx: int, dy: int, ncside: int):
    """grid[c] -> grid[c - (dx,dy)] over the periodic (nc, nc) cell grid."""
    g = a.reshape(ncside, ncside, *a.shape[1:])
    g = jnp.roll(g, (dy, dx), axis=(0, 1))
    return g.reshape(a.shape)


def rebin(ts: TileState, side: float, ncside: int, kcap: int):
    """Deliver all movers to their destination rows. Returns (ts', overflow).

    overflow is 0 when everything was delivered within MAX_ROUNDS and no
    row ran out of free slots; otherwise the number of undelivered movers
    (the engine retries the run with larger tiles).
    """
    ncells = ncside * ncside
    rowid = jnp.arange(ncells, dtype=jnp.int32)[:, None]  # (ncells, 1)
    row_cy = rowid // ncside
    row_cx = rowid % ncside

    def mover_info(st: TileState):
        cx, cy, valid = cell_of(st.x, st.y, side, ncside)
        dest = cy * ncside + cx
        moving = st.occ & valid & (dest != rowid)
        sx = jnp.sign(_wrap_delta(cx - row_cx, ncside))
        sy = jnp.sign(_wrap_delta(cy - row_cy, ncside))
        return moving, sx, sy

    FIELDS = ("x", "y", "vx", "vy", "m")

    def one_round(st: TileState, shift: int):
        """One delivery round with a *static* probe shift (dynamic-shift
        rolls on the slot axis lower to gather-class ops on TPU)."""
        moving, sx, sy = mover_info(st)

        free = ~st.occ  # slots free at round start; arrivals only land here
        taken = jnp.zeros(st.occ.shape, dtype=bool)
        departed = jnp.zeros(st.occ.shape, dtype=bool)
        data = {f: getattr(st, f) for f in FIELDS}
        pid = st.pid

        for dx, dy in STENCIL:
            going = moving & (sx == dx) & (sy == dy)
            # Arrivals at row c, slot (s + shift) % K come from row
            # c-(dx,dy), slot s: a grid roll plus a slot-axis roll. The
            # per-round shift makes contenders probe different slots.
            def ship(a):
                return jnp.roll(_roll_grid(a, dx, dy, ncside), shift,
                                axis=1)
            claim = ship(going)
            take = claim & free & ~taken
            for f in FIELDS:
                data[f] = jnp.where(take, ship(getattr(st, f)), data[f])
            pid = jnp.where(take, ship(st.pid), pid)
            taken = taken | take
            # Tell the source its particle landed (inverse rolls).
            landed = _roll_grid(jnp.roll(take, -shift, axis=1),
                                -dx, -dy, ncside)
            departed = departed | (landed & going)

        occ = (st.occ & ~departed) | taken
        st = st._replace(occ=occ, pid=pid, **data)
        st = st._replace(m=jnp.where(occ, st.m, jnp.asarray(0.0, st.m.dtype)))
        still, _, _ = mover_info(st)
        left = jnp.sum(still, dtype=jnp.int32)
        return st, left

    moving0, _, _ = mover_info(ts)
    left0 = jnp.sum(moving0, dtype=jnp.int32)

    # Probe stride: odd (coprime with the power-of-two K) so successive
    # probes spread across the whole slot ring — linear probing would crawl
    # along front-packed occupied prefixes.
    stride = (kcap // 8) | 1

    # Common case: two statically-unrolled rounds (compile-time shifts →
    # rolls are slice+concat). Nearly every step delivers all movers here.
    st, left = ts, left0
    for r in range(2):
        shift = (r * stride) % kcap

        def do_round(args, shift=shift):
            s, _ = args
            return one_round(s, shift)

        st, left = jax.lax.cond(left > 0, do_round, lambda a: a, (st, left))

    # Rare stragglers (multi-cell hops, heavy contention): a compact
    # while_loop with traced shifts — slow per round (dynamic slot rolls
    # lower to gathers) but almost never executed.
    def cond(carry):
        _, l, r = carry
        return (l > 0) & (r < MAX_ROUNDS)

    def body(carry):
        s, _, r = carry
        s, l = one_round(s, (r * stride) % kcap)
        return s, l, r + 1

    st, left, _ = jax.lax.while_loop(cond, body, (st, left, jnp.int32(2)))
    return st, left


def binned_mask(ts: TileState, side: float, ncside: int):
    """Occupied slots whose position is in range (the reference PANIC2 skip
    leaves out-of-range particles unbinned but integrating; here they stay
    in their last row, masked out of COM/forces/collisions)."""
    cx, cy, valid = cell_of(ts.x, ts.y, side, ncside)
    return ts.occ & valid, jnp.sum(ts.occ & ~valid, dtype=jnp.int32)
