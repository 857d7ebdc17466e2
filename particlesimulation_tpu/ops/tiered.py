"""Two-tier dense tiles for clustered (high-variance-occupancy) grids.

The reference's bucket grid pays per-particle work regardless of how
particles distribute over cells (reference serial/parsim.cpp:261-290,
292-377: per-bucket loops). The TPU dense-tile formulation instead pays
``ncells x kcap^2`` pair lanes with ``kcap`` = the *global* max occupancy —
on clustered loads (the reference harness's normal-mode ``-seed`` inits,
serial/parsim.cpp:220-232, where a Gaussian blob drives one cell to ~10x
the mean) that single hot cell taxes every cell in the grid. Measured: the
UNEVEN workload (seed -23, side 5000, ncside 100, N=1e6) forces kcap=960
against an average occupancy of 100 — 9.2e9 pair lanes, 158.9 ms/step,
6.3 M particle-steps/s (PERF.md).

Two-tier formulation: tiles come in two static shapes —

* a **small tier** ``(ncells, k_small)`` holding every cell whose occupancy
  fits, with ``k_small`` sized to the occupancy *distribution* (not its
  max); and
* a compact **fat tier** ``(fatcap, k_big)`` holding only the few cells
  that exceed ``k_small``, indexed by a per-step ``fat_ids`` cell list.

Each cell lives entirely in exactly one tier (all-pairs stays intra-tile),
so the pair/collision kernels (`ops/dense_xla.py`, `ops/pallas/cell_pairs`)
run unchanged per tier: ``ncells*k_small^2 + fatcap*k_big^2`` lanes — 37x
fewer than single-tier on UNEVEN. Per-cell COM rows merge by scatter-add
(a fat cell's small-tier row is empty), so the stencil tables and every
downstream consumer see the same (ncells,) arrays as the single-tier step.

Capacity is planned from an occupancy census (`plan_tiers`) and guarded
in-graph: occupancy beyond ``k_big`` or more fat cells than ``fatcap``
flags ``state.overflow`` (fat-list overflow in the negative range) and the
engine's lossless retry ladder re-plans, exactly like the single-tier
impls (engine.py:run). The reference PANIC-skips in its analogous case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from particlesimulation_tpu.config import DELTAT, EPSILON, Precision, SimConfig
from particlesimulation_tpu.ops import binning, collisions, integrate, stencil
from particlesimulation_tpu.state import SimState


def _round32(x: float) -> int:
    return max(32, (int(x) + 31) // 32 * 32)


def plan_tiers(occ_hist, ncells: int, max_kcap: int):
    """Choose (k_small, k_big, fatcap) from a host-side occupancy census.

    ``occ_hist``: array of per-cell occupancies (numpy). Minimizes the
    pair-lane model ``ncells*k^2 + fatcap_k*k_big^2`` over 32-multiples of
    ``k`` and returns None when the best two-tier plan saves < 40% of the
    single-tier lanes (then single-tier tiles are simpler and as fast).
    """
    import numpy as np

    occ = np.asarray(occ_hist)
    maxocc = int(occ.max()) if occ.size else 0
    k_big = min(_round32(maxocc * 1.1 + 4), max_kcap)
    single = ncells * k_big * k_big
    best = None
    for k in range(32, max(33, min(maxocc, max_kcap)), 32):
        nfat = int((occ > k).sum())
        fatcap = _round32(nfat * 1.3 + 2)
        lanes = ncells * k * k + fatcap * k_big * k_big
        if best is None or lanes < best[0]:
            best = (lanes, k, k_big, fatcap)
    if best is None or best[0] > 0.6 * single:
        return None
    return best[1], best[2], best[3]


def make_tiered_step(config: SimConfig, k_small: int, k_big: int,
                     fatcap: int, backend: str = "xla"):
    """Fast f32 step over two-tier dense tiles (clustered-grid hot path).

    Mirrors ``engine.make_dense_step`` (same step sequencing, same carried
    post-move tiles, reference serial/parsim.cpp:422-448) with the tile
    build/consume split across the two tiers.
    """
    side = config.side
    nc = config.ncside
    ncells = config.ncells
    assert config.precision is Precision.FAST
    assert k_big >= k_small
    if backend == "pallas":
        from particlesimulation_tpu.ops.pallas import cell_pairs as dmod
    else:
        from particlesimulation_tpu.ops import dense_xla as dmod

    OOB_S = ncells * k_small
    OOB_F = fatcap * k_big

    def scatter_tier(idx, oob, *arrays):
        out = []
        for a in arrays:
            out.append(jnp.zeros(oob, a.dtype)
                       .at[idx].set(a, mode="drop"))
        return out

    def build_tiles(state: SimState):
        """Two-tier tiles + index maps for the state's sorted positions."""
        key, valid = binning.cell_keys(state.x, state.y, side, nc)
        pos, _ = binning.segment_positions(key)
        occ = (jnp.zeros(ncells + 1, jnp.int32).at[key].add(1))[:ncells]
        kmax = jnp.max(occ)
        fat = occ > k_small
        n_fat = jnp.sum(fat, dtype=jnp.int32)
        fat_rank = jnp.cumsum(fat.astype(jnp.int32)) - 1
        # Cell id per fat row; unused rows stay 0 — their tiles are empty
        # (m=0 everywhere), which every consumer treats as inert.
        fat_ids = (jnp.zeros(fatcap, jnp.int32)
                   .at[jnp.where(fat, fat_rank, fatcap)]
                   .set(jnp.arange(ncells, dtype=jnp.int32), mode="drop"))
        # Overflow telemetry: positive = occupancy needs k_big >= that;
        # negative = fat list needs fatcap >= |that| (engine.run re-plans).
        ovf = jnp.where(kmax > k_big, kmax, 0).astype(jnp.int32)
        ovf = jnp.where((ovf == 0) & (n_fat > fatcap), -n_fat, ovf)
        kc = jnp.minimum(key, jnp.int32(ncells - 1))
        is_fat_p = valid & fat[kc]
        fr_p = fat_rank[kc]
        oks = valid & ~is_fat_p & (pos < k_small)
        okf = valid & is_fat_p & (pos < k_big) & (fr_p < fatcap)
        idx_s = jnp.where(oks, key * k_small + pos, OOB_S)
        idx_f = jnp.where(okf, fr_p * k_big + pos, OOB_F)
        xs, ys, ms = scatter_tier(idx_s, OOB_S, state.x, state.y, state.m)
        xf, yf, mf = scatter_tier(idx_f, OOB_F, state.x, state.y, state.m)
        return {"xs": xs.reshape(ncells, k_small),
                "ys": ys.reshape(ncells, k_small),
                "ms": ms.reshape(ncells, k_small),
                "xf": xf.reshape(fatcap, k_big),
                "yf": yf.reshape(fatcap, k_big),
                "mf": mf.reshape(fatcap, k_big),
                "idx_s": idx_s, "idx_f": idx_f, "oks": oks, "okf": okf,
                "fat_ids": fat_ids, "n_fat": n_fat, "ovf": ovf,
                "panic": jnp.sum(~valid, dtype=jnp.int32)}

    INF = jnp.int32(0x7FFFFFFF)

    def step(state: SimState, tiles):
        x, y, vx, vy, m, alive, pid = (state.x, state.y, state.vx, state.vy,
                                       state.m, state.alive, state.pid)
        ovf = tiles["ovf"]
        fat_ids = tiles["fat_ids"]
        frow_ok = jnp.arange(fatcap, dtype=jnp.int32) < tiles["n_fat"]
        ftgt = jnp.where(frow_ok, fat_ids, ncells)  # OOB rows dropped

        # Per-cell COM: small-tier row reductions, fat rows merged by
        # scatter-add (a fat cell's small row is all-zero).
        def merged(ws, wf):
            return ws.at[ftgt].add(wf, mode="drop")

        M = merged(jnp.sum(tiles["ms"], axis=1),
                   jnp.sum(tiles["mf"], axis=1))
        SX = merged(jnp.sum(tiles["ms"] * tiles["xs"], axis=1),
                    jnp.sum(tiles["mf"] * tiles["xf"], axis=1))
        SY = merged(jnp.sum(tiles["ms"] * tiles["ys"], axis=1),
                    jnp.sum(tiles["mf"] * tiles["yf"], axis=1))
        safe = jnp.where(M > 0, M, jnp.float32(1.0))
        MX = jnp.where(M > 0, SX / safe, jnp.float32(0.0))
        MY = jnp.where(M > 0, SY / safe, jnp.float32(0.0))

        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        ml_t = ml[:, :ncells].T  # (ncells, 8)
        mxl_t = mxl[:, :ncells].T
        myl_t = myl[:, :ncells].T

        fxs, fys = dmod.dense_pairwise_forces(
            tiles["xs"], tiles["ys"], tiles["ms"],
            ml_t, mxl_t, myl_t, ncells, k_small)
        fxf, fyf = dmod.dense_pairwise_forces(
            tiles["xf"], tiles["yf"], tiles["mf"],
            ml_t[fat_ids], mxl_t[fat_ids], myl_t[fat_ids], fatcap, k_big)

        zero = jnp.float32(0.0)
        gs = jnp.minimum(tiles["idx_s"], OOB_S - 1)
        gf = jnp.minimum(tiles["idx_f"], OOB_F - 1)
        fx = (jnp.where(tiles["oks"], fxs.reshape(-1)[gs], zero)
              + jnp.where(tiles["okf"], fxf.reshape(-1)[gf], zero))
        fy = (jnp.where(tiles["oks"], fys.reshape(-1)[gs], zero)
              + jnp.where(tiles["okf"], fyf.reshape(-1)[gf], zero))

        x, y, vx, vy = integrate.integrate(x, y, vx, vy, m, fx, fy, side,
                                           DELTAT)

        # Post-move rebin: one sort per step, fresh tiles (reused by the
        # collision pass now and as next step's binning).
        key2, valid2 = binning.cell_keys(x, y, side, nc)
        key2, pid, x, y, vx, vy, m, alive = binning.sort_by_cell(
            key2, pid, x, y, vx, vy, m, alive)
        mid = SimState(x=x, y=y, vx=vx, vy=vy, m=m, alive=alive, pid=pid,
                       collisions=state.collisions, panics=state.panics,
                       overflow=state.overflow)
        tiles2 = build_tiles(mid)
        # Keep the strongest overflow signal (positive beats negative so a
        # genuine occupancy need is never masked by a fat-list need).
        ovf = jnp.where(tiles2["ovf"] > 0,
                        jnp.maximum(ovf, tiles2["ovf"]),
                        jnp.where(ovf > 0, ovf,
                                  jnp.minimum(ovf, tiles2["ovf"])))

        # Collisions per tier. Slot order is (key, pid)-sorted in both
        # tiers, so slot index == bucket order (no pid tiles needed).
        ads = (tiles2["ms"] > 0).astype(jnp.int32)
        adf = (tiles2["mf"] > 0).astype(jnp.int32)
        cnt_s, ft_s = dmod.dense_collisions(
            tiles2["xs"], tiles2["ys"], ads, ncells, k_small, EPSILON)
        cnt_f, ft_f = dmod.dense_collisions(
            tiles2["xf"], tiles2["yf"], adf, fatcap, k_big, EPSILON)
        gs2 = jnp.minimum(tiles2["idx_s"], OOB_S - 1)
        gf2 = jnp.minimum(tiles2["idx_f"], OOB_F - 1)
        died = ((tiles2["oks"] & (ft_s.reshape(-1)[gs2] != INF))
                | (tiles2["okf"] & (ft_f.reshape(-1)[gf2] != INF)))
        m, alive = collisions.apply_deaths(m, alive, died)
        # Deaths in tile space keep the carried mass tiles consistent.
        tiles2["ms"] = jnp.where(ft_s != INF, jnp.float32(0.0), tiles2["ms"])
        tiles2["mf"] = jnp.where(ft_f != INF, jnp.float32(0.0), tiles2["mf"])
        tiles2["ovf"] = ovf

        count = cnt_s + cnt_f
        out = SimState(
            x=x, y=y, vx=vx, vy=vy, m=m, alive=alive, pid=pid,
            collisions=state.collisions + count.astype(state.collisions.dtype),
            panics=state.panics + tiles["panic"],
            overflow=_merge_ovf(state.overflow, ovf),
        )
        return out, tiles2

    def run(state: SimState, n_steps):
        tiles = build_tiles(state)

        def body(i, carry):
            st, tl = carry
            return step(st, tl)

        out, _ = jax.lax.fori_loop(0, n_steps, body, (state, tiles))
        return out

    return step, build_tiles, run


def _merge_ovf(a, b):
    """Merge overflow telemetry: positive (occupancy need) dominates,
    otherwise the most-negative fat-list need."""
    return jnp.where((a > 0) | (b > 0),
                     jnp.maximum(a, b), jnp.minimum(a, b))
