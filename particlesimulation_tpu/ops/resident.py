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
3. arrivals land in free slots via *rank matching*: the r-th arrival of a
   row takes the row's r-th free slot. The data transfer is a one-hot
   (K×K) batched matmul built from cumsum-rank equality — MXU work, no
   gathers or scatters anywhere;
4. multi-cell movers (rare: post-slingshot speeds) hop once per round of a
   ``while_loop`` that runs until delivery (normally one round).

Particle ids ride the matmul as two f32 halves (each < 2^12·2^7, exact).
A round cap plus an overflow flag (largest unplaced demand) lets the engine
retry losslessly with bigger tiles, mirroring the dense-capacity protocol.

Fragmentation is free: force/collision kernels do full K² masked work
regardless of which slots are occupied, so rows are never compacted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlesimulation_tpu.ops.stencil import STENCIL

MAX_ROUNDS = 8
_PID_BASE = 4096.0


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

    def pack_fields(st: TileState):
        pid_hi = jnp.floor_divide(st.pid, 4096).astype(st.x.dtype)
        pid_lo = jnp.remainder(st.pid, 4096).astype(st.x.dtype)
        return jnp.stack([st.x, st.y, st.vx, st.vy, st.m, pid_hi, pid_lo],
                         axis=-1)  # (ncells, K, 7)

    def unpack_fields(f, st: TileState, taken):
        def sel(new, old):
            return jnp.where(taken, new, old)
        pid_new = (f[..., 5] * _PID_BASE + f[..., 6]).astype(jnp.int32)
        return st._replace(
            x=sel(f[..., 0], st.x), y=sel(f[..., 1], st.y),
            vx=sel(f[..., 2], st.vx), vy=sel(f[..., 3], st.vy),
            m=sel(f[..., 4], st.m), pid=jnp.where(taken, pid_new, st.pid))

    def one_round(carry):
        st, _prev_left, rounds = carry
        moving, sx, sy = mover_info(st)
        fields = pack_fields(st)

        free = ~st.occ
        ins_data = jnp.zeros(fields.shape, fields.dtype)
        ins_mask = jnp.zeros(st.occ.shape, dtype=bool)
        departed = jnp.zeros(st.occ.shape, dtype=bool)

        for dx, dy in STENCIL:
            going = moving & (sx == dx) & (sy == dy)
            # Arrivals at row c come from row c-(dx,dy).
            arr_mask = _roll_grid(going, dx, dy, ncside)
            arr_data = _roll_grid(fields, dx, dy, ncside)
            n_free = jnp.sum(free, axis=1, keepdims=True)
            ar = jnp.cumsum(arr_mask.astype(jnp.int32), axis=1) - 1
            fr = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
            placed_j = arr_mask & (ar < n_free)
            n_placed = jnp.sum(placed_j, axis=1, keepdims=True)
            take_s = free & (fr < n_placed)
            # One-hot rank match: slot s takes the arrival with ar == fr[s].
            P = (take_s[:, :, None] & placed_j[:, None, :] &
                 (fr[:, :, None] == ar[:, None, :])).astype(fields.dtype)
            moved = jax.lax.dot_general(
                P, arr_data, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=fields.dtype)  # (ncells, K, 7)
            ins_data = jnp.where(take_s[:, :, None], moved, ins_data)
            ins_mask = ins_mask | take_s
            free = free & ~take_s
            # Clear the sources whose arrival was placed.
            departed = departed | (_roll_grid(placed_j, -dx, -dy, ncside)
                                   & going)

        occ = (st.occ & ~departed) | ins_mask
        st = unpack_fields(ins_data, st, ins_mask)
        st = st._replace(occ=occ,
                         m=jnp.where(occ, st.m, jnp.asarray(0.0, st.m.dtype)))
        still, _, _ = mover_info(st)
        left = jnp.sum(still, dtype=jnp.int32)
        return st, left, rounds + 1

    moving0, _, _ = mover_info(ts)
    left0 = jnp.sum(moving0, dtype=jnp.int32)

    def cond(carry):
        _, left, rounds = carry
        return (left > 0) & (rounds < MAX_ROUNDS)

    st, left, _ = jax.lax.while_loop(
        cond, lambda c: one_round(c), (ts, left0, jnp.int32(0)))
    return st, left


def binned_mask(ts: TileState, side: float, ncside: int):
    """Occupied slots whose position is in range (the reference PANIC2 skip
    leaves out-of-range particles unbinned but integrating; here they stay
    in their last row, masked out of COM/forces/collisions)."""
    cx, cy, valid = cell_of(ts.x, ts.y, side, ncside)
    return ts.occ & valid, jnp.sum(ts.occ & ~valid, dtype=jnp.int32)
