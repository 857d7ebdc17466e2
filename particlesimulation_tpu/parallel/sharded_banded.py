"""Block-cyclic sharded banded engine: clustered loads on a 1D ring mesh.

Round 3's banded engine (ops/banded.py) won the clustered regime on one
chip by giving each contiguous row band its own tile capacity (the UNEVEN
blob's occupancy spans orders of magnitude). Sharding it is not a matter
of cutting the grid into D contiguous blocks: under ``shard_map`` every
shard runs the same program with the same static shapes, while a
census-balanced block decomposition gives the hot shard few fat rows and
the fringe shards many thin ones — per-shard band structures that cannot
agree. The fix is a **block-cyclic** decomposition:

* plan bands whose row counts are multiples of D
  (ops/banded.plan_bands_cyclic);
* every shard owns exactly rows_b/D *contiguous* rows of every band,
  chunks assigned in ring order: global rows
  ``[B0S0 B0S1 … B0S(D-1) B1S0 …]``.

Consequences, all by construction:

* static shapes are identical across shards (each shard holds one chunk
  of every band at that band's K) — shard_map-compatible K right-sizing;
* load balance is automatic for any spatially coherent occupancy
  profile (each shard samples 1/D of every band) — no census-weighted
  boundary planning, no rebalancing;
* every chunk boundary lies between ring-neighbor shards (chunk (b, s)'s
  lower neighbor is chunk (b, s+1), wrapping to chunk (b+1, 0) at
  s = D-1), so both the COM halo and particle shipping are one
  ``lax.ppermute`` ring hop per direction — the reference's ghost
  exchange and migration (mpi/parsim-mpi.cpp:670-815,512-600) with the
  band structure riding along.

The only new wrinkle is the **edge-shard band shift**: shard 0's
received halo for band c comes from band c (its upper neighbor is chunk
(c, D-1)… wait, no —) shard s>0 receives band-c payloads that belong to
its band-c chunk, while shard 0's upper neighbor for band c is chunk
(c-1, D-1) and shard D-1's lower neighbor for band c is chunk (c+1, 0).
Halo payloads are stacked per band into uniform-width buffers, so the
edge shards just roll the band axis by one before consuming — a traced
2-way select, no extra communication.

Capacity overflow anywhere (tile occupancy, halo-lane budget, merge
free slots, ship-round cap) raises the replicated ``overflow`` counter
and the engine retries losslessly with a grown plan; the reference
PANIC-skips in the analogous situation (serial/parsim.cpp:276-280).

The f64 sweep impl remains the bitwise-parity claim; this is the
clustered throughput path (f32, order-free reductions): collision counts
and dead sets match the single-chip banded engine exactly on the test
configs, trajectories statistically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from particlesimulation_tpu.config import DELTAT, EPSILON, SimConfig
from particlesimulation_tpu.ops import binning, integrate
from particlesimulation_tpu.ops import dense_xla as dmod
from particlesimulation_tpu.ops import resident as res
from particlesimulation_tpu.ops.banded import HALO_W
from particlesimulation_tpu.parallel.sharded import (
    AXIS, CAP_OVF, STRAY_OVF, _ring_perm, stencil_tables_halo)
from particlesimulation_tpu.state import ShardedState

INF = jnp.int32(0x7FFFFFFF)
_FIELDS = ("x", "y", "vx", "vy", "m")
SHIP_SLACK = 4


def cyclic_owner_of_rows(plan, n_shards: int, rows):
    """Owning shard per global grid row under the block-cyclic chunk map.

    Host-side (numpy): row r in band (r0, rw, _) belongs to the shard
    whose balanced-uneven chunk of that band contains it. The analog of
    the reference's ``cell_y / rows_per_proc`` ownership rule
    (mpi/parsim-mpi.cpp:396-403), with chunks interleaved across bands.
    """
    import numpy as np
    rows = np.asarray(rows)
    out = np.zeros(rows.shape, dtype=np.int64)
    for r0, rw, _ in plan:
        base, rem = rw // n_shards, rw % n_shards
        sel = (rows >= r0) & (rows < r0 + rw)
        off = rows[sel] - r0
        split = rem * (base + 1)
        own = np.where(off < split, off // (base + 1),
                       rem + (off - split) // max(1, base))
        out[sel] = own
    return out


def make_sharded_banded_run(config: SimConfig, mesh, plan, cap: int):
    """Build ``run(slab_state, n_steps) -> slab_state`` (shard_map + jit).

    ``plan``: [(row0, rows, kcap), ...] contiguous over the grid rows,
    every ``rows`` >= n_shards (plan_bands_cyclic guarantees multiples of
    n_shards except a ragged tail on the last band).
    """
    side = config.side
    nc = config.ncside
    ncells = config.ncells
    d = config.n_shards
    bands = [(int(r0), int(rw), int(k)) for r0, rw, k in plan]
    B = len(bands)
    assert bands[0][0] == 0 and sum(b[1] for b in bands) == nc
    for (r0, rw, _), (r0n, _, _) in zip(bands, bands[1:]):
        assert r0 + rw == r0n
    assert all(rw >= d for _, rw, _ in bands), "bands need >= 1 row/shard"
    fused_fn = dmod.resolve_pair_impl(side=config.side)
    halo_w = int(os.environ.get("PSIM_BAND_HALO_W", str(HALO_W)))

    # Per-band chunk geometry: shard s owns rows
    # [g0_b(s), g0_b(s) + cnt_b(s)) of band b, balanced-uneven.
    BASE = [rw // d for _, rw, _ in bands]
    REM = [rw % d for _, rw, _ in bands]
    CMAX = [BASE[b] + (1 if REM[b] else 0) for b in range(B)]
    NROWS = [CMAX[b] + 2 for b in range(B)]          # + 2 halo rows
    NCT = [nr * nc for nr in NROWS]
    KS = [k for _, _, k in bands]
    LROW = [jnp.arange(nct, dtype=jnp.int32)[:, None] // nc for nct in NCT]
    COL = [jnp.arange(nct, dtype=jnp.int32)[:, None] % nc for nct in NCT]
    W = min(halo_w, max(KS))

    def g0_of(b, s):
        """First global row of shard ``s``'s chunk of band ``b`` (traced)."""
        return (bands[b][0] + s * BASE[b]
                + jnp.minimum(s, REM[b])).astype(jnp.int32)

    def cnt_of(b, s):
        return (BASE[b] + (s < REM[b])).astype(jnp.int32)

    def grid3(a, b):
        return a.reshape(NROWS[b], nc, KS[b])

    def local_run(slab: ShardedState, n_steps):
        me = jax.lax.axis_index(AXIS)
        G0 = [g0_of(b, me) for b in range(B)]
        CNT = [cnt_of(b, me) for b in range(B)]
        OWNED = [(LROW[b] >= 1) & (LROW[b] <= CNT[b]) for b in range(B)]

        # ---- prologue: sorted slab -> per-band chunk tiles -----------------
        def prologue(st: ShardedState):
            key, valid = binning.cell_keys(st.x, st.y, side, nc)
            gy = key // nc
            gx = key - gy * nc
            mine_any = jnp.zeros_like(valid)
            bl = []
            ovf = jnp.int32(0)
            for b in range(B):
                k = KS[b]
                mine = valid & (gy >= G0[b]) & (gy < G0[b] + CNT[b])
                mine_any = mine_any | mine
                ok = st.valid & mine
                tkey = jnp.where(ok, (gy - G0[b] + 1) * nc + gx,
                                 jnp.int32(NCT[b]))
                pos, _ = binning.segment_positions(tkey)
                kmax = binning.max_occupancy(pos, tkey < NCT[b])
                ovf = jnp.maximum(ovf, jnp.where(kmax > k, kmax, 0))
                fits = pos < k
                idx = jnp.where(ok & fits, tkey * k + pos,
                                jnp.int32(NCT[b] * k))
                if b == 0:
                    # Limbo (PANIC2 out-of-range) parks in my band-0
                    # chunk's first real row, cell 0, tail slots downward
                    # (see ops/banded.py prologue).
                    limbo = st.valid & ~valid
                    lpos, _ = binning.segment_positions(
                        jnp.where(limbo, jnp.int32(0), jnp.int32(1)))
                    idx = jnp.where(
                        limbo & (lpos < k),
                        nc * k + (jnp.int32(k - 1) - lpos), idx)
                    occ0 = jnp.sum(ok & (tkey == nc), dtype=jnp.int32)
                    nlimbo = jnp.sum(limbo, dtype=jnp.int32)
                    ovf = jnp.maximum(
                        ovf, jnp.where(occ0 + nlimbo > k,
                                       occ0 + nlimbo, 0))

                def scat(a, fill=0):
                    flat = jnp.full(NCT[b] * k, fill, a.dtype)
                    return flat.at[idx].set(a, mode="drop").reshape(
                        NCT[b], k)

                z = jnp.zeros((), jnp.int32)
                bl.append(res.TileState(
                    x=scat(st.x), y=scat(st.y), vx=scat(st.vx),
                    vy=scat(st.vy), m=scat(st.m),
                    occ=scat(st.valid & fits, fill=False),
                    pid=scat(st.pid),
                    collisions=z, panics=z, overflow=z))
            stray = jnp.sum(st.valid & valid & ~mine_any, dtype=jnp.int32)
            ovf = jnp.maximum(ovf, jnp.where(stray > 0, STRAY_OVF, 0))
            return tuple(bl), jax.lax.pmax(ovf, AXIS)

        # ---- physics masks ---------------------------------------------------
        def physics_mass(ts: res.TileState, b):
            _, _, valid = res.cell_of(ts.x, ts.y, side, nc)
            binned = ts.occ & valid & OWNED[b]
            limbo = jnp.sum(ts.occ & ~valid, dtype=jnp.int32)
            return jnp.where(binned, ts.m, jnp.float32(0.0)), binned, limbo

        # ---- COM + stencil: per-chunk grids, ring halos, edge band shift ----
        def com_tables(bl, mfs):
            M2s, MX2s, MY2s = [], [], []
            for b in range(B):
                M = jnp.sum(mfs[b], axis=1)
                SX = jnp.sum(mfs[b] * bl[b].x, axis=1)
                SY = jnp.sum(mfs[b] * bl[b].y, axis=1)
                safe = jnp.where(M > 0, M, jnp.float32(1.0))
                MX = jnp.where(M > 0, SX / safe, jnp.float32(0.0))
                MY = jnp.where(M > 0, SY / safe, jnp.float32(0.0))
                M2s.append(M.reshape(NROWS[b], nc)[1:CMAX[b] + 1])
                MX2s.append(MX.reshape(NROWS[b], nc)[1:CMAX[b] + 1])
                MY2s.append(MY.reshape(NROWS[b], nc)[1:CMAX[b] + 1])

            def last_row(A, b):
                return jax.lax.dynamic_slice_in_dim(A, CNT[b] - 1, 1,
                                                    axis=0)[0]

            # Stack per-band boundary COM rows -> (B, nc) and ship once.
            lasts = tuple(
                jnp.stack([last_row(A[b], b) for b in range(B)])
                for A in (M2s, MX2s, MY2s))
            firsts = tuple(jnp.stack([A[b][0] for b in range(B)])
                           for A in (M2s, MX2s, MY2s))
            if d > 1:
                down = _ring_perm(d, 1)
                up = _ring_perm(d, -1)
                top_recv = jax.lax.ppermute(lasts, AXIS, down)
                bot_recv = jax.lax.ppermute(firsts, AXIS, up)
            else:
                top_recv, bot_recv = lasts, firsts
            # Edge band shift: shard 0's band-c upper neighbor is chunk
            # (c-1, D-1), so it consumes the received band axis rolled
            # +1; shard D-1's lower neighbor is chunk (c+1, 0) -> roll -1.
            top_halo = tuple(
                jnp.where(me == 0, jnp.roll(t, 1, axis=0), t)
                for t in top_recv)
            bot_halo = tuple(
                jnp.where(me == d - 1, jnp.roll(bo, -1, axis=0), bo)
                for bo in bot_recv)

            out = []
            zrow = jnp.zeros((1, nc), jnp.float32)
            for b in range(B):
                def padded(A, ht, hb):
                    Ap = jnp.concatenate([ht[None], A, zrow], axis=0)
                    return jax.lax.dynamic_update_slice_in_dim(
                        Ap, hb[None], CNT[b] + 1, axis=0)

                Mp = padded(M2s[b], top_halo[0][b], bot_halo[0][b])
                MXp = padded(MX2s[b], top_halo[1][b], bot_halo[1][b])
                MYp = padded(MY2s[b], top_halo[2][b], bot_halo[2][b])
                ml, mxl, myl = stencil_tables_halo(Mp, MXp, MYp, side, nc,
                                                   CMAX[b], G0[b])
                zpad = jnp.zeros((nc, 8), ml.dtype)
                out.append(tuple(
                    jnp.concatenate(
                        [zpad, t[:, :CMAX[b] * nc].T, zpad], axis=0)
                    for t in (ml, mxl, myl)))
            return out

        # ---- migration routing (per band chunk) ------------------------------
        def route_for(b):
            nrt = NROWS[b]
            lrow_of, col_of = LROW[b], COL[b]

            def _route(st: res.TileState):
                cxg, cyg, valid = res.cell_of(st.x, st.y, side, nc)
                gy_row = G0[b] + lrow_of - 1
                delta = res._wrap_delta(cyg - gy_row, nc)
                dlr = lrow_of + delta
                dest_lrow = jnp.where(
                    dlr < 1, 0,
                    jnp.where(dlr > CNT[b], jnp.int32(nrt - 1), dlr))
                dest_lrow = jnp.where(lrow_of > CNT[b],
                                      jnp.int32(nrt - 1), dest_lrow)
                movable = (lrow_of >= 1) & (lrow_of <= nrt - 2)
                moving = (st.occ & valid & movable
                          & ((dest_lrow != lrow_of) | (cxg != col_of)))
                return moving, dest_lrow, cxg

            def mover_fn(st):
                moving, dest_lrow, cxg = _route(st)
                sy = jnp.sign(dest_lrow - lrow_of)
                sx = jnp.sign(res._wrap_delta(cxg - col_of, nc))
                return moving, sx, sy

            def dest_fn(st):
                moving, dest_lrow, cxg = _route(st)
                return moving, dest_lrow * nc + jnp.clip(cxg, 0, nc - 1)

            return mover_fn, dest_fn

        ROUTE = [route_for(b) for b in range(B)]

        def rebin_all(bl):
            out, ovf = [], jnp.int32(0)
            for b in range(B):
                mover_fn, dest_fn = ROUTE[b]
                ts, und = res.rebin(bl[b], side, nc, KS[b],
                                    mover_fn=mover_fn, nrows=NROWS[b],
                                    dest_fn=dest_fn)
                out.append(ts)
                ovf = ovf + und
            return tuple(out), ovf

        def extract_row(ts, r, b):
            return {f: jax.lax.dynamic_slice_in_dim(
                        grid3(getattr(ts, f), b), r, 1, axis=0)[0]
                    for f in _FIELDS + ("occ", "pid")}

        def take_w(row, b):
            """Packed-prefix halo slice padded/cut to the uniform W lanes;
            occupants beyond the lane budget are dropped from this attempt
            and flagged (lossless retry with a grown plan)."""
            k = KS[b]
            if k >= W:
                dropped = jnp.sum(row["occ"][:, W:], dtype=jnp.int32)
                return {f: v[:, :W] for f, v in row.items()}, dropped
            pad = W - k

            def padf(v):
                return jnp.concatenate(
                    [v, jnp.zeros((nc, pad), v.dtype)], axis=1)

            return {f: padf(v) for f, v in row.items()}, jnp.int32(0)

        def clear_halos(ts, b):
            # Halo rows only — uneven tail rows (CNT < lrow <= CMAX) are
            # empty by construction, but clearing them here would turn a
            # latent routing bug into silent particle loss.
            halo = (LROW[b] == 0) | (LROW[b] == NROWS[b] - 1)
            occ = ts.occ & ~halo
            return ts._replace(occ=occ,
                               m=jnp.where(occ, ts.m, jnp.float32(0.0)))

        def merge_into_row(ts, arr, r, b):
            """Rank-match arriving (nc, W) particles into traced row ``r``'s
            free slots (cross-K: W arrival lanes into K_b destination
            slots)."""
            row = extract_row(ts, r, b)
            free = ~row["occ"]
            frank = jnp.cumsum(free.astype(jnp.int32), axis=1)
            nfree = frank[:, -1:]
            aocc = arr["occ"]
            arank = jnp.cumsum(aocc.astype(jnp.int32), axis=1)
            deliv = aocc & (arank <= nfree)
            ovf = (jnp.sum(aocc, dtype=jnp.int32)
                   - jnp.sum(deliv, dtype=jnp.int32))
            match = (free[:, :, None]
                     & (frank[:, :, None] == arank[:, None, :])
                     & deliv[:, None, :])
            placed = jnp.any(match, axis=2)

            def put(fld, afld):
                w = jnp.sum(jnp.where(match, afld[:, None, :],
                                      jnp.zeros((), afld.dtype)),
                            axis=2, dtype=afld.dtype)
                return jnp.where(placed, w, fld)

            new = {f: put(row[f], arr[f]) for f in _FIELDS + ("pid",)}
            new["occ"] = row["occ"] | placed
            upd = {}
            for f in _FIELDS + ("occ", "pid"):
                g = jax.lax.dynamic_update_slice_in_dim(
                    grid3(getattr(ts, f), b), new[f][None], r, axis=0)
                upd[f] = g.reshape(NCT[b], KS[b])
            return ts._replace(**upd), ovf

        def halo_pending(bl):
            local = sum(jnp.sum(bl[b].occ & ~OWNED[b], dtype=jnp.int32)
                        for b in range(B))
            return jax.lax.psum(local, AXIS)

        def ship_and_deliver(bl):
            bl, ovf0 = rebin_all(bl)
            pending = halo_pending(bl)
            max_rounds = B * d + SHIP_SLACK

            def cond(c):
                _, pending, rounds, _ = c
                return (pending > 0) & (rounds < max_rounds)

            def body(c):
                bl, _, rounds, ovf = c
                bl = list(bl)
                tops, bots = [], []
                for b in range(B):
                    t, d1 = take_w(extract_row(bl[b], jnp.int32(0), b), b)
                    bo, d2 = take_w(
                        extract_row(bl[b], jnp.int32(NROWS[b] - 1), b), b)
                    tops.append(t)
                    bots.append(bo)
                    ovf = ovf + d1 + d2
                bl = [clear_halos(bl[b], b) for b in range(B)]
                # Stack -> (B, nc, W) per field; one ppermute per direction.
                tops_s = {f: jnp.stack([t[f] for t in tops])
                          for f in _FIELDS + ("occ", "pid")}
                bots_s = {f: jnp.stack([bo[f] for bo in bots])
                          for f in _FIELDS + ("occ", "pid")}
                if d > 1:
                    up = _ring_perm(d, -1)
                    down = _ring_perm(d, 1)
                    top_recv = jax.lax.ppermute(tops_s, AXIS, up)
                    bot_recv = jax.lax.ppermute(bots_s, AXIS, down)
                else:
                    top_recv, bot_recv = tops_s, bots_s
                # Edge band shift (see module docstring): shard D-1
                # receives shard 0's band-c top emigrants, which belong
                # to its band c-1 -> consume the band axis rolled -1 ...
                # equivalently band c consumes received band c+1. Shard 0
                # receives shard D-1's band-c bottom emigrants for its
                # band c+1 -> band c consumes received band c-1.
                top_use = {
                    f: jnp.where(me == d - 1, jnp.roll(v, -1, axis=0), v)
                    for f, v in top_recv.items()}
                bot_use = {
                    f: jnp.where(me == 0, jnp.roll(v, 1, axis=0), v)
                    for f, v in bot_recv.items()}
                for b in range(B):
                    # A band-b top emigrant targets its sender's upper
                    # neighbor chunk's LAST owned row; a bottom emigrant
                    # the lower neighbor's FIRST row.
                    arr_t = {f: v[b] for f, v in top_use.items()}
                    arr_b = {f: v[b] for f, v in bot_use.items()}
                    bl[b], o1 = merge_into_row(bl[b], arr_t, CNT[b], b)
                    bl[b], o2 = merge_into_row(bl[b], arr_b,
                                               jnp.int32(1), b)
                    ovf = ovf + o1 + o2
                bl, und = rebin_all(tuple(bl))
                return bl, halo_pending(bl), rounds + 1, ovf + und

            bl, pending, _, ovf = jax.lax.while_loop(
                cond, body, (bl, pending, jnp.int32(0), ovf0))
            ovf = ovf + pending  # ship-round cap exceeded
            return bl, jax.lax.psum(ovf, AXIS)

        # ---- pair pass --------------------------------------------------------
        def pair_pass(ts, b, collide: bool):
            mf, binned, _ = physics_mass(ts, b)
            ad = (binned & (ts.m > 0)).astype(jnp.int32)
            fxd, fyd, count, ftd = fused_fn(
                ts.x, ts.y, mf, ad, NCT[b], KS[b], EPSILON,
                collide=collide, pid=ts.pid)
            return fxd, fyd, count, ftd != INF

        # ---- one step ---------------------------------------------------------
        def step(carry):
            bl, fxs, fys, coll, panics, ovf = carry
            bl = list(bl)
            mfs, limbo = [], jnp.int32(0)
            for b in range(B):
                mf, _, lb = physics_mass(bl[b], b)
                mfs.append(mf)
                limbo = limbo + lb
            tables = com_tables(bl, mfs)
            for b in range(B):
                ml_t, mxl_t, myl_t = tables[b]
                fxm, fym = dmod.monopole_tile_forces(
                    bl[b].x, bl[b].y, mfs[b], ml_t, mxl_t, myl_t)
                x, y, vx, vy = integrate.integrate(
                    bl[b].x, bl[b].y, bl[b].vx, bl[b].vy, bl[b].m,
                    fxs[b] + fxm, fys[b] + fym, side, DELTAT)
                bl[b] = bl[b]._replace(x=x, y=y, vx=vx, vy=vy)

            bl, mig_ovf = ship_and_deliver(tuple(bl))
            bl = list(bl)

            fxs2, fys2 = [], []
            count = jnp.int32(0)
            for b in range(B):
                fxd, fyd, cnt, died = pair_pass(bl[b], b, collide=True)
                bl[b] = bl[b]._replace(
                    m=jnp.where(died, jnp.float32(0.0), bl[b].m))
                fxs2.append(fxd)
                fys2.append(fyd)
                count = count + cnt

            coll = coll + jax.lax.psum(count, AXIS)
            panics = panics + jax.lax.psum(limbo, AXIS)
            ovf = jnp.maximum(ovf, mig_ovf)
            return (tuple(bl), tuple(fxs2), tuple(fys2), coll, panics,
                    ovf)

        # ---- epilogue: chunk tiles -> sorted slab ------------------------------
        def epilogue(bl, coll, panics, ovf,
                     st: ShardedState) -> ShardedState:
            flats = {f: [] for f in _FIELDS + ("occ", "pid")}
            for b in range(B):
                for f in _FIELDS + ("occ", "pid"):
                    g = grid3(getattr(bl[b], f), b)[1:CMAX[b] + 1]
                    flats[f].append(g.reshape(-1))
            cat = {f: jnp.concatenate(v) for f, v in flats.items()}
            nslots = cat["occ"].shape[0]
            pad = max(0, cap - nslots)
            if pad:
                for f in cat:
                    fill = (jnp.zeros(pad, cat[f].dtype) if f != "pid"
                            else jnp.full(pad, -1, jnp.int32))
                    cat[f] = jnp.concatenate([cat[f], fill])
            order = jnp.argsort(~cat["occ"], stable=True)[:cap]
            valid = cat["occ"][order]
            n_occ = jnp.sum(cat["occ"], dtype=jnp.int32)
            covf = jnp.where(n_occ > cap, CAP_OVF + (n_occ - cap), 0)

            def take(f, fill=0):
                return jnp.where(valid, cat[f][order],
                                 jnp.asarray(fill, cat[f].dtype))

            x, y, m = take("x"), take("y"), take("m")
            pid = take("pid", fill=jnp.iinfo(jnp.int32).max)
            key, _ = binning.cell_keys(x, y, side, nc)
            key = jnp.where(valid, key, jnp.int32(ncells + 1))
            key, pid, x, y, vx, vy, m, alive, valid = binning.sort_by_cell(
                key, pid, x, y, take("vx"), take("vy"), m,
                valid & (m > 0), valid)
            covf = jax.lax.pmax(covf, AXIS)
            return ShardedState(
                x=x, y=y, vx=vx, vy=vy, m=m, alive=alive, valid=valid,
                pid=pid,
                collisions=st.collisions + coll.astype(
                    st.collisions.dtype),
                panics=st.panics + panics,
                overflow=jnp.maximum(jnp.maximum(st.overflow, ovf), covf))

        bl, ovf0 = prologue(slab)
        fxs, fys = [], []
        for b in range(B):
            fxd, fyd, _, _ = pair_pass(bl[b], b, collide=False)
            fxs.append(fxd)
            fys.append(fyd)
        z = jnp.zeros((), slab.collisions.dtype)
        zi = jnp.zeros((), jnp.int32)
        carry = (bl, tuple(fxs), tuple(fys), z, zi, ovf0)
        carry = jax.lax.fori_loop(0, n_steps, lambda i, c: step(c), carry)
        bl, _, _, coll, panics, ovf = carry
        return epilogue(bl, coll, panics, ovf, slab)

    spec_arr = P(AXIS)
    specs = ShardedState(
        x=spec_arr, y=spec_arr, vx=spec_arr, vy=spec_arr, m=spec_arr,
        alive=spec_arr, valid=spec_arr, pid=spec_arr,
        collisions=P(), panics=P(), overflow=P())
    fn = jax.shard_map(local_run, mesh=mesh, in_specs=(specs, P()),
                       out_specs=specs, check_vma=False)
    return jax.jit(fn)
