"""Pallas rebin kernel: slot-tile mover delivery with VMEM-resident transport.

STATUS (round 2): compiles and runs correctly on the v5e (collision
counts exact through this path) but measured 28.8 ms/step vs the XLA
round's 7.55 at the N=1e6 bench — one kernel round converges, yet it
performs the same ~8 dirs × RCAP ranks × 6 fields term enumeration as
the XLA formulation, VPU/VMEM-bound instead of HBM-bound. Kept as an
opt-in backend (PSIM_REBIN_BACKEND=pallas) and as the recorded map of
Mosaic's portability walls (below); the XLA round stays the default.
Beating it needs an indexed per-element VMEM move (a gather Mosaic does
not expose) or a different state layout — PERF.md "Pallas rebin kernel".

Why it was built: the XLA rebin round (ops/resident.py) is at its fusion
floor — every masked reduce-to-column + select term costs a constant
~0.015-0.018 ms at N=1e6 regardless of formulation, and the global
while_loop runs 5-8 single-delivery rounds per step (4.2 ms, 55% of the
fast step; PERF.md "Rebin cost attribution"). In VMEM the same
per-(direction, rank) reductions are VPU-local, so one kernel round
delivers up to ``RCAP`` arrivals per (row, direction), converging in one
round at bench mover rates, for one HBM read+write of the tiles.

Shape of the kernel:

* grid over blocks of ``rb`` grid-rows; every array is passed three times
  — the self block plus its ring neighbors via modular index maps
  ``(i-1) % nb`` and ``(i+1) % nb`` (the Pallas analog of the reference's
  ghost-row halo exchange, mpi/parsim-mpi.cpp:670-815). Whole-block halos
  keep every BlockSpec sublane-aligned (Mosaic requires the trailing
  block dims divisible by (8, 128) or equal to the array's); ``rb`` is
  the smallest even divisor of the row count with ``rb*ncside % 8 == 0``.
* the kernel assembles the extended 3-block tile and runs the same
  roll/cumsum logic as the XLA round. With rb ≥ 2 the ext tile carries ≥2
  rows beyond the self block on each side: a boundary mover's departure
  is decided by its *destination* row's acceptance, which depends on that
  row's other sources — one row beyond the destination. Ring-row
  acceptance is recomputed redundantly by both neighboring blocks from
  identical data, keeping every decision deterministic without
  cross-program communication.
* rank-matched placement: arrival r of direction d (ranked by a lane
  cumsum over the rolled mover mask) lands in the destination row's free
  slot ranked ``acc_d + r`` (acc_d = arrivals accepted by earlier
  directions), so free slots are consumed compactly — strictly better
  than the XLA round's per-direction reserved ranks (a near-full row can
  accept from any direction). Slot *placement* therefore differs;
  physics is slot-order independent — collision tie-breaks rank by pid,
  force/COM reductions are masked sums — so engine trajectories agree to
  f32 reduction-order ulps and collision outcomes exactly on the test
  vectors (tests/test_pallas_rebin.py).
* data moves by masked lane-reductions to (rows, 1) columns at the source
  + column rolls + free-rank-keyed selects — bit-exact transport, no
  gathers, no matmuls (pids ride int32 masked sums). Each (direction,
  rank) win mask is consumed across all six fields immediately so the
  Mosaic scoped-VMEM stack holds one mask at a time, not 8*RCAP of them
  (the round-2 collision-kernel lesson, DEVNOTES.md).

Single-chip layout only (square grid, default mover predicate); the
sharded engine's halo-extended grids keep the XLA round. Occupancy is
int32 at the kernel boundary (Mosaic-friendly; bool tiles stay internal).
On non-TPU backends the kernel runs in interpreter mode (the CPU test
suite validates it against ops/resident.rebin).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particlesimulation_tpu.ops.resident import MAX_ROUNDS, TileState
from particlesimulation_tpu.ops.stencil import STENCIL

# Deliveries per (row, direction) per kernel round. VMEM reductions make
# extra ranks nearly free; 8 covers the Poisson-tail bursts seen at bench
# occupancy so the outer while_loop almost always runs one round.
RCAP = int(os.environ.get("PSIM_PALLAS_REBIN_RCAP", "8"))

_FIELDS = ("x", "y", "vx", "vy", "m", "pid")


def _pick_rb(nrows: int, ncside: int) -> int | None:
    """Smallest even divisor rb of nrows with rb*ncside sublane-aligned."""
    for rb in range(2, nrows + 1, 2):
        if nrows % rb == 0 and (rb * ncside) % 8 == 0:
            return rb
    return None


def supported(ncside: int, nrows: int | None, mover_fn) -> bool:
    """Kernel preconditions: single-chip square grid, default movers, an
    aligned block factoring."""
    if mover_fn is not None or (nrows is not None and nrows != ncside):
        return False
    return _pick_rb(ncside, ncside) is not None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cumsum_lanes(a):
    """Inclusive prefix sum along lanes. Mosaic implements neither the
    `cumsum` primitive nor `associative_scan`'s interior padding, so this
    is a hand-rolled Hillis-Steele scan: log2(K) zero-filled lane shifts
    (concat + slice, both supported) and adds — exact for int32."""
    k = a.shape[1]
    z = jnp.zeros_like(a)
    s = 1
    while s < k:
        shifted = jnp.concatenate([z[:, :s], a[:, :-s]], axis=1)
        a = a + shifted
        s *= 2
    return a


def _roll_ext(a, dx: int, dy: int, ncside: int, re_rows: int):
    """grid[c] -> grid[c - (dx,dy)] over the (re_rows, ncside) ext tile.

    y wraps circularly over the ext rows; edge-row results are garbage and
    masked off by the caller (dest rows are interior by construction).
    Rolls are spelled as two-slice concats with zero shifts skipped —
    `jnp.roll` emits a zero-length slice for a 0 shift, which Mosaic
    rejects ("vector types must have positive constant sizes").
    """
    g = a.reshape(re_rows, ncside, *a.shape[1:])
    ky = dy % re_rows
    if ky:
        g = jnp.concatenate([g[-ky:], g[:-ky]], axis=0)
    kx = dx % ncside
    if kx:
        g = jnp.concatenate([g[:, -kx:], g[:, :-kx]], axis=1)
    return g.reshape(a.shape)


def _round_kernel(*refs, side, ncside, nrows, rb):
    """One delivery round for the block's rb rows (3-block ext context).

    ``refs`` = 21 input refs (top/self/bottom views of x, y, vx, vy, m,
    pid, occ) followed by 8 output refs (self rows of the 7 arrays + the
    block's pending-mover count after the round).
    """
    re_rows = 3 * rb
    ins, outs = refs[:21], refs[21:]

    def ext(k):
        return jnp.concatenate([ins[3 * k][:], ins[3 * k + 1][:],
                                ins[3 * k + 2][:]], axis=0)

    # One ext copy per field, used BOTH as transport source and as the
    # updated output: placements only write originally-free slots and
    # sources are only occupied slots, so the partially-updated tensors
    # read identical source values — and the scoped-VMEM stack drops by
    # six ext tensors (the first silicon compile measured 23.8M).
    out = {f: ext(k) for k, f in enumerate(_FIELDS)}
    occ = ext(6) != 0

    i = pl.program_id(0)
    base = (i - 1) * rb  # global grid-row of ext row 0 (mod nrows)
    ncells = re_rows * ncside

    cell0 = jax.lax.broadcasted_iota(jnp.int32, (ncells, 1), 0)
    row_cx = cell0 % ncside
    erow = cell0 // ncside
    row_cy = (base + erow) % nrows
    # Interior dest rows: self ± 1 ring. Rows further out exist only as
    # arrival sources for the ring (whose acceptance decides departures).
    dest_row_ok = (erow >= rb - 1) & (erow <= 2 * rb)
    self_row = (erow >= rb) & (erow <= 2 * rb - 1)

    nc32 = jnp.int32(ncside)
    half = nc32 // 2
    w = jnp.float32(side / ncside)

    def mover_info(xv, yv, occv):
        cx = (xv / w).astype(jnp.int32)
        cy = (yv / w).astype(jnp.int32)
        valid = (cx >= 0) & (cx < nc32) & (cy >= 0) & (cy < nc32)
        dest = cy * nc32 + cx
        cur = row_cy * nc32 + row_cx
        moving = occv & valid & (dest != cur)
        sx = jnp.sign(((cx - row_cx + half) % nc32) - half)
        sy = jnp.sign(((cy - row_cy + half) % nc32) - half)
        return moving, sx, sy

    moving, sx, sy = mover_info(out["x"], out["y"], occ)

    # Rank-matched acceptance + immediate transport: each (d, r) win mask
    # is folded into all six fields before the next one is built.
    # Masks that travel through _roll_ext are int32 (0/1), not bool:
    # Mosaic rejects slicing/concatenating i1 vectors (the rolls lower to
    # an i1->i32 "Invalid vector register cast"), and bool->int astype
    # hits the same bitcast — so ranks come from where-selects on int
    # masks, and bools appear only in elementwise select conditions (the
    # discipline the proven cell_pairs kernels follow).
    one = jnp.ones((), jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    fr = _cumsum_lanes(jnp.where(occ, zero, one))  # 1-based free rank
    n_free = fr[:, -1:]
    free = ~occ
    acc = jnp.zeros_like(n_free)
    departed = jnp.zeros(occ.shape, dtype=bool)
    arrive = jnp.zeros(occ.shape, dtype=bool)
    # Direction loop static (roll shifts must be constants); the rank
    # loop is a lax.fori_loop so the kernel body stays ~RCAP× smaller —
    # the fully unrolled 8×RCAP×6 form got the remote compile helper
    # OOM-killed (SIGKILL) on the full-program compile.
    for d, (dx, dy) in enumerate(STENCIL):
        going = moving & (sx == dx) & (sy == dy)
        going_i = jnp.where(going, one, zero)
        arr_i = jnp.where(dest_row_ok,
                          _roll_ext(going_i, dx, dy, ncside, re_rows), zero)
        rnk = _cumsum_lanes(arr_i)
        take = jnp.minimum(jnp.minimum(rnk[:, -1:], RCAP),
                           jnp.maximum(n_free - acc, 0))

        going_src_i = going_i  # int mask at source coords (0/1)

        def rank_body(r0, carry, arr_i=arr_i, rnk=rnk, take=take, acc=acc,
                      dx=dx, dy=dy, going_src_i=going_src_i):
            # Flat all-int32/f32 carry: i1 tensors in an scf.for carry
            # fail Mosaic legalization, so departure/arrival masks ride
            # as 0/1 int32 and bools stay loop-local.
            xv, yv, vxv, vyv, mv, pv, dep_i, arr_acc_i = carry
            r = r0 + 1
            ok = r <= take
            win_i = jnp.where((arr_i > 0) & (rnk == r) & ok, one, zero)
            src_hit = (_roll_ext(win_i, -dx, -dy, ncside, re_rows)
                       * going_src_i)
            src_win = src_hit > 0
            land = jnp.where(ok, acc + r, 0)
            tgt = free & (fr == land)
            vals = [xv, yv, vxv, vyv, mv, pv]
            new_vals = []
            for f, val in zip(_FIELDS, vals):
                # val doubles as transport source: placements only touch
                # originally-free slots, sources only occupied ones.
                if f == "pid":
                    wcol = jnp.sum(jnp.where(src_win, val, 0), axis=1,
                                   keepdims=True, dtype=val.dtype)
                else:
                    wcol = jnp.sum(jnp.where(src_win, val,
                                             jnp.zeros((), val.dtype)),
                                   axis=1, keepdims=True)
                w_dst = _roll_ext(wcol, dx, dy, ncside, re_rows)
                new_vals.append(jnp.where(tgt, w_dst, val))
            dep_i = jnp.maximum(dep_i, src_hit)
            arr_acc_i = jnp.maximum(arr_acc_i, jnp.where(tgt, one, zero))
            return (*new_vals, dep_i, arr_acc_i)

        dep_i0 = jnp.where(departed, one, zero)
        arr_i0 = jnp.where(arrive, one, zero)
        carry = jax.lax.fori_loop(
            0, RCAP, rank_body,
            (out["x"], out["y"], out["vx"], out["vy"], out["m"],
             out["pid"], dep_i0, arr_i0))
        out = dict(zip(_FIELDS, carry[:6]))
        departed = carry[6] > 0
        arrive = carry[7] > 0
        acc = acc + take

    occ_new = (occ | arrive) & ~departed
    out["m"] = jnp.where(occ_new, out["m"], jnp.float32(0.0))

    s0 = rb * ncside
    s1 = 2 * rb * ncside
    for k, f in enumerate(_FIELDS):
        outs[k][:] = out[f][s0:s1]
    occ_i = jnp.where(occ_new, one, zero)   # select before slicing: i1
    outs[6][:] = occ_i[s0:s1]               # slices hit the vreg bitcast

    # Pending movers now resident in the self rows (exact: every grid row
    # is exactly one block's self row, so the sum over blocks is the
    # global pending count). mover_info runs ext-wide (its row-coordinate
    # columns are ext-shaped); only the self slice is counted. The count
    # rides slot 0 of an (8, 1) block — Mosaic needs 8-divisible sublanes.
    still, _, _ = mover_info(out["x"], out["y"], occ_new)
    cnt = jnp.sum(jnp.where(still & self_row, one, zero), dtype=jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    outs[7][:] = jnp.where(slot == 0, cnt, 0)


def _round_call(arrays, side: float, ncside: int, kcap: int, rb: int):
    """One kernel round over the whole grid. ``arrays``: dict of tiles
    (occ as int32). Returns (updated arrays, left)."""
    nrows = ncside
    nb = nrows // rb

    blk = (rb * ncside, kcap)
    top = pl.BlockSpec(blk, lambda i: ((i - 1) % nb, 0),
                       memory_space=pltpu.VMEM)
    mid = pl.BlockSpec(blk, lambda i: (i, 0), memory_space=pltpu.VMEM)
    bot = pl.BlockSpec(blk, lambda i: ((i + 1) % nb, 0),
                       memory_space=pltpu.VMEM)
    left_spec = pl.BlockSpec((8, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    names = _FIELDS + ("occ",)
    ins = []
    in_specs = []
    for n in names:
        ins.extend([arrays[n]] * 3)
        in_specs.extend([top, mid, bot])

    shp = arrays["x"].shape
    f32 = jnp.float32
    call = pl.pallas_call(
        functools.partial(_round_kernel, side=side, ncside=ncside,
                          nrows=nrows, rb=rb),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple([mid] * 7 + [left_spec]),
        out_shape=(
            jax.ShapeDtypeStruct(shp, f32),            # x
            jax.ShapeDtypeStruct(shp, f32),            # y
            jax.ShapeDtypeStruct(shp, f32),            # vx
            jax.ShapeDtypeStruct(shp, f32),            # vy
            jax.ShapeDtypeStruct(shp, f32),            # m
            jax.ShapeDtypeStruct(shp, jnp.int32),      # pid
            jax.ShapeDtypeStruct(shp, jnp.int32),      # occ
            # pending per block: count in slot 0 of each 8-row stripe
            jax.ShapeDtypeStruct((nb * 8, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )
    x, y, vx, vy, m, pid, occ, lefts = call(*ins)
    return ({"x": x, "y": y, "vx": vx, "vy": vy, "m": m,
             "occ": occ, "pid": pid},
            jnp.sum(lefts, dtype=jnp.int32))


def rebin(ts: TileState, side: float, ncside: int, kcap: int):
    """Drop-in twin of ops/resident.rebin for the single-chip layout.

    Same contract: delivers all movers (while_loop over kernel rounds,
    typically one) and returns (ts', undelivered) where undelivered > 0
    after MAX_ROUNDS triggers the engine's lossless capacity retry.
    """
    rb = _pick_rb(ncside, ncside)
    assert rb is not None, "caller must check supported()"
    arrays0 = {"x": ts.x, "y": ts.y, "vx": ts.vx, "vy": ts.vy, "m": ts.m,
               "occ": ts.occ.astype(jnp.int32), "pid": ts.pid}

    def count_movers(arrays):
        w = jnp.asarray(side / ncside, dtype=arrays["x"].dtype)
        cx = (arrays["x"] / w).astype(jnp.int32)
        cy = (arrays["y"] / w).astype(jnp.int32)
        nc = jnp.int32(ncside)
        valid = (cx >= 0) & (cx < nc) & (cy >= 0) & (cy < nc)
        dest = cy * nc + cx
        rowid = jnp.arange(ncside * ncside, dtype=jnp.int32)[:, None]
        moving = (arrays["occ"] != 0) & valid & (dest != rowid)
        return jnp.sum(moving, dtype=jnp.int32)

    left0 = count_movers(arrays0)

    def cond(carry):
        _, left, rounds = carry
        return (left > 0) & (rounds < MAX_ROUNDS)

    def body(carry):
        arrays, _, rounds = carry
        arrays, left = _round_call(arrays, side, ncside, kcap, rb)
        return arrays, left, rounds + 1

    arrays, left, _ = jax.lax.while_loop(
        cond, body, (arrays0, left0, jnp.int32(0)))
    out = ts._replace(x=arrays["x"], y=arrays["y"], vx=arrays["vx"],
                      vy=arrays["vy"], m=arrays["m"],
                      occ=arrays["occ"] != 0, pid=arrays["pid"])
    return out, left
