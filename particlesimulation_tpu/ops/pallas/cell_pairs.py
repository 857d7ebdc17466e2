"""Fused per-cell pairwise kernels: forces (+monopole) and collisions.

The fast engine's hot loops are O(N·k) same-cell pair interactions
(reference hot loops: serial/parsim.cpp:356-366 pairwise forces, :393-411
collision scan). The XLA offset-sweep formulation re-reads O(N) arrays from
HBM per offset and performs unaligned shifted loads — poison on TPU. These
kernels restore arithmetic intensity k with a *dense per-cell tile* layout:

  sorted particles → scatter → (ncells, K) slot matrix (K = padded capacity)
  kernel: grid over blocks of cells; each program computes all K×K pair
  terms for its cells in VMEM — lane-aligned 2D tiles, one HBM read per
  particle, zero gathers.

The 8 neighbor-COM monopole terms (reference serial/parsim.cpp:109-125,
292-377) are folded into the same force kernel as row-broadcast reads of a
per-cell (ncells, 8) stencil table — the whole force phase is one kernel.

Empty slots carry m=0 (zero force contribution) and alive=0 (no collision),
so no per-slot masks are needed beyond d2>0.

On non-TPU backends the kernels run in interpreter mode (used by the CPU
test suite to validate against the XLA reference formulations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particlesimulation_tpu.config import G

# Largest per-cell capacity the dense kernels accept before the engine falls
# back to the XLA sweep (keeps (CB, K, K) intermediates inside VMEM).
MAX_DENSE_KCAP = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _force_kernel(x_ref, y_ref, m_ref, ml_ref, mxl_ref, myl_ref,
                  fx_ref, fy_ref, *, jchunk):
    """Total gravity per slot: all same-cell pairs + 8 monopole terms.

    x/y/m refs: (CB, K) slot tiles; ml/mxl/myl refs: (CB, 8) stencil tables
    (neighbor mass / mirror-offset COM per cell, reference temp-cells).
    Partner slots are processed in static chunks of ``jchunk`` to bound the
    (CB, K, jchunk) VMEM intermediates.
    """
    x = x_ref[:]
    y = y_ref[:]
    m = m_ref[:]
    g = jnp.float32(G)
    gm = g * m
    kcap = x.shape[1]
    fx_chunks = []
    fy_chunks = []
    # Receiver slots i are processed in chunks; partners j span the full K
    # so the lane dimension stays wide. Intermediates are (CB, Ic, K).
    for ic in range(0, kcap, jchunk):
        xi = x[:, ic:ic + jchunk]
        yi = y[:, ic:ic + jchunk]
        gmi = gm[:, ic:ic + jchunk]
        dx = x[:, None, :] - xi[:, :, None]   # (CB, Ic, K)
        dy = y[:, None, :] - yi[:, :, None]
        d2 = dx * dx + dy * dy
        nz = d2 > 0.0
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
        s = gmi[:, :, None] * m[:, None, :] * (inv * inv * inv)
        fxc = jnp.sum(s * dx, axis=2)         # (CB, Ic)
        fyc = jnp.sum(s * dy, axis=2)
        # Monopole: 8 static stencil terms, row-broadcast per cell
        # (l:l+1 slices stay rank-2 — Mosaic rejects 1D intermediates).
        for l in range(8):
            cm = ml_ref[:, l:l + 1]
            dxl = mxl_ref[:, l:l + 1] - xi
            dyl = myl_ref[:, l:l + 1] - yi
            d2l = dxl * dxl + dyl * dyl
            nzl = d2l > 0.0
            invl = jnp.where(nzl, jax.lax.rsqrt(jnp.where(nzl, d2l, 1.0)),
                             0.0)
            sl = gmi * cm * (invl * invl * invl)
            fxc = fxc + sl * dxl
            fyc = fyc + sl * dyl
        fx_chunks.append(fxc)
        fy_chunks.append(fyc)
    fx_ref[:] = jnp.concatenate(fx_chunks, axis=1)
    fy_ref[:] = jnp.concatenate(fy_chunks, axis=1)


def _alive_pid_ranks(pid, alive, kcap, jchunk):
    """Chunked alive-pid rank per slot (bucket-order tie-breaks).

    The reference visits collision pairs in bucket order = ascending pid
    (serial/parsim.cpp:393-411); resident-tile slot order departs from pid
    order after migration, so ranks come from pid comparisons instead of
    slot iotas. (CB, Ic, K) int intermediates, same chunking as the pair
    passes.
    """
    chunks = []
    for ic in range(0, kcap, jchunk):
        pi = pid[:, ic:ic + jchunk]
        less = (alive[:, None, :] > 0) & (pid[:, None, :] < pi[:, :, None])
        chunks.append(jnp.sum(less, axis=2, dtype=jnp.int32))
    return jnp.concatenate(chunks, axis=1)


def _collision_kernel(x_ref, y_ref, alive_ref, pid_ref, ft_ref, count_ref, *,
                      kcap, eps2, jchunk):
    """First-colliding-pair ranks + set-rule count per cell row.

    alive: int32 (1/0). ft: int32 min pair-rank per slot (INT32_MAX if
    none; Mosaic has no unsigned reductions, and kcap<=1024 keeps ranks
    far below 2^31). count: (CB, 1) partial counts, summed by the caller. Implements
    the exact reference collision-set semantics (see ops/collisions.py).
    Two chunked passes: min-rank accumulation, then first-pair counting.
    """
    x = x_ref[:]
    y = y_ref[:]
    alive = alive_ref[:]
    INF = jnp.int32(0x7FFFFFFF)
    base = jnp.int32(kcap + 1)
    pr = _alive_pid_ranks(pid_ref[:], alive, kcap, jchunk)

    def chunk_cand(ic):
        # Receiver rows i in a chunk; partners j span the full K (lanes).
        xi = x[:, ic:ic + jchunk]
        yi = y[:, ic:ic + jchunk]
        ai = alive[:, ic:ic + jchunk]
        dx = x[:, None, :] - xi[:, :, None]   # (CB, Ic, K)
        dy = y[:, None, :] - yi[:, :, None]
        d2 = dx * dx + dy * dy
        pair_alive = (ai[:, :, None] * alive[:, None, :]) > 0
        i_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + ic
        j_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        hit = pair_alive & (d2 < eps2) & (j_idx > i_idx)
        ri = pr[:, ic:ic + jchunk][:, :, None]
        rj = pr[:, None, :]
        rank = jnp.minimum(ri, rj) * base + jnp.maximum(ri, rj)
        return jnp.where(hit, rank, INF), hit

    ft_i_chunks = []
    ftj = jnp.full(x.shape, INF, dtype=jnp.int32)
    for ic in range(0, kcap, jchunk):
        cand, _ = chunk_cand(ic)
        ft_i_chunks.append(jnp.min(cand, axis=2))            # slot as i
        ftj = jnp.minimum(ftj, jnp.min(cand, axis=1))        # slot as j
    ft = jnp.minimum(jnp.concatenate(ft_i_chunks, axis=1), ftj)
    ft_ref[:] = ft

    count = jnp.zeros((x.shape[0], 1), dtype=jnp.int32)
    for ic in range(0, kcap, jchunk):
        cand, hit = chunk_cand(ic)
        fti = ft[:, ic:ic + jchunk]
        first_both = hit & (fti[:, :, None] == cand) & (ft[:, None, :] == cand)
        count = count + jnp.sum(
            jnp.sum(first_both, axis=2, dtype=jnp.int32), axis=1,
            keepdims=True)
    count_ref[:] = count


def _fused_kernel(x_ref, y_ref, mf_ref, alive_ref, pid_ref,
                  fx_ref, fy_ref, ft_ref, count_ref, *,
                  kcap, eps2, jchunk, collide):
    """Fused collision(t) + pairwise-force(t+1) kernel.

    Mirrors ops/dense_xla.fused_pairs: one pass over post-move positions
    yields the collision ranks/count AND the next step's pairwise forces
    (with this pass's deaths applied to the force masses — the reference's
    merge-then-force ordering). mf: physics (limbo-masked) masses;
    alive: int32 collision mask.
    """
    x = x_ref[:]
    y = y_ref[:]
    mf = mf_ref[:]
    INF = jnp.int32(0x7FFFFFFF)
    base = jnp.int32(kcap + 1)
    g = jnp.float32(G)

    if collide:
        alive = alive_ref[:]
        pr = _alive_pid_ranks(pid_ref[:], alive, kcap, jchunk)

        def chunk_cand(ic):
            xi = x[:, ic:ic + jchunk]
            yi = y[:, ic:ic + jchunk]
            ai = alive[:, ic:ic + jchunk]
            dx = x[:, None, :] - xi[:, :, None]   # (CB, Ic, K)
            dy = y[:, None, :] - yi[:, :, None]
            d2 = dx * dx + dy * dy
            pair_alive = (ai[:, :, None] * alive[:, None, :]) > 0
            i_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + ic
            j_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
            hit = pair_alive & (d2 < eps2) & (j_idx > i_idx)
            ri = pr[:, ic:ic + jchunk][:, :, None]
            rj = pr[:, None, :]
            rank = jnp.minimum(ri, rj) * base + jnp.maximum(ri, rj)
            return jnp.where(hit, rank, INF), hit

        ft_i_chunks = []
        ftj = jnp.full(x.shape, INF, dtype=jnp.int32)
        for ic in range(0, kcap, jchunk):
            cand, _ = chunk_cand(ic)
            ft_i_chunks.append(jnp.min(cand, axis=2))
            ftj = jnp.minimum(ftj, jnp.min(cand, axis=1))
        ft = jnp.minimum(jnp.concatenate(ft_i_chunks, axis=1), ftj)

        count = jnp.zeros((x.shape[0], 1), dtype=jnp.int32)
        for ic in range(0, kcap, jchunk):
            cand, hit = chunk_cand(ic)
            fti = ft[:, ic:ic + jchunk]
            first_both = (hit & (fti[:, :, None] == cand)
                          & (ft[:, None, :] == cand))
            count = count + jnp.sum(
                jnp.sum(first_both, axis=2, dtype=jnp.int32), axis=1,
                keepdims=True)
        m_post = jnp.where(ft != INF, jnp.float32(0.0), mf)
    else:
        ft = jnp.full(x.shape, INF, dtype=jnp.int32)
        count = jnp.zeros((x.shape[0], 1), dtype=jnp.int32)
        m_post = mf
    ft_ref[:] = ft
    count_ref[:] = count

    gm = g * m_post
    fx_chunks = []
    fy_chunks = []
    for ic in range(0, kcap, jchunk):
        xi = x[:, ic:ic + jchunk]
        yi = y[:, ic:ic + jchunk]
        gmi = gm[:, ic:ic + jchunk]
        dx = x[:, None, :] - xi[:, :, None]
        dy = y[:, None, :] - yi[:, :, None]
        d2 = dx * dx + dy * dy
        nz = d2 > 0.0
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
        s = gmi[:, :, None] * m_post[:, None, :] * (inv * inv * inv)
        fx_chunks.append(jnp.sum(s * dx, axis=2))
        fy_chunks.append(jnp.sum(s * dy, axis=2))
    fx_ref[:] = jnp.concatenate(fx_chunks, axis=1)
    fy_ref[:] = jnp.concatenate(fy_chunks, axis=1)


def _fused_kernel_v2(xt_ref, yt_ref, mft_ref, alivet_ref, pidt_ref,
                     fxt_ref, fyt_ref, ftt_ref, count_ref,
                     pr_s, mpost_s, xl_s, yl_s, *,
                     kcap, eps2, jchunk, collide, force_form="v2"):
    """Fused pair kernel, v2: transposed layout + fori_loop chunk loops.

    Two structural changes vs the round-1 ``_fused_kernel``:

    * **chunk loops are ``lax.fori_loop``s** whose bodies re-use one
      VMEM stack frame — the v1 kernel unrolls them in Python, so Mosaic
      sums every live chunk intermediate on the scoped-VMEM stack
      (PERF.md "Pallas kernels on silicon");
    * **blocks are transposed**: refs are (K, CB) with *cells on the
      lane axis*. Mosaic only lowers dynamically-indexed slices when
      lane offsets are provably 128-aligned; receiver chunks index the
      *sublane* axis (`pl.ds(t*jchunk, jchunk)`, 8-aligned), so any
      chunk width works. Pair intermediates are (Ic, K, CB) — minor two
      dims (K, CB) fill the VPU tiles at any occupancy.

    Also ports dense_xla.fused_pairs_v2's hit gating: a cheap d²-only
    sweep computes "any pair within ε" and the rank/min/count collision
    machinery runs under ``@pl.when`` only for blocks that actually hit
    (rare by construction). Chunked reads go through refs; loop carries
    are full-block values. Semantics identical to ``_fused_kernel``.
    """
    x = xt_ref[:]           # (K, CB)
    y = yt_ref[:]
    INF = jnp.int32(0x7FFFFFFF)
    base = jnp.int32(kcap + 1)
    g = jnp.float32(G)
    nb = kcap // jchunk
    trips = nb

    def chunk3(ref, i0):
        return ref[pl.ds(i0, jchunk), :]

    if collide:
        alive = alivet_ref[:]

        def hit_body(t, anyhit):
            i0 = t * jchunk
            xi = chunk3(xt_ref, i0)          # (Ic, CB)
            yi = chunk3(yt_ref, i0)
            ai = chunk3(alivet_ref, i0)
            dx = x[None, :, :] - xi[:, None, :]   # (Ic, K, CB)
            dy = y[None, :, :] - yi[:, None, :]
            d2 = dx * dx + dy * dy
            pa = (ai[:, None, :] * alive[None, :, :]) > 0
            ii = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + i0
            jj = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            return anyhit | jnp.any(pa & (d2 < eps2) & (jj > ii))

        any_hit = jax.lax.fori_loop(0, trips, hit_body, jnp.bool_(False))

        ftt_ref[:] = jnp.full(x.shape, INF, dtype=jnp.int32)
        count_ref[:] = jnp.zeros((1, x.shape[1]), dtype=jnp.int32)

        @pl.when(any_hit)
        def _():
            pid_full = pidt_ref[:]

            def pr_body(t, _):
                i0 = t * jchunk
                pi = chunk3(pidt_ref, i0)
                less = ((alive[None, :, :] > 0)
                        & (pid_full[None, :, :] < pi[:, None, :]))
                pr_s[pl.ds(i0, jchunk), :] = jnp.sum(less, axis=1,
                                                     dtype=jnp.int32)
                return 0

            jax.lax.fori_loop(0, trips, pr_body, 0)
            pr = pr_s[:]

            def cand_chunk(i0):
                xi = chunk3(xt_ref, i0)
                yi = chunk3(yt_ref, i0)
                ai = chunk3(alivet_ref, i0)
                dx = x[None, :, :] - xi[:, None, :]
                dy = y[None, :, :] - yi[:, None, :]
                d2 = dx * dx + dy * dy
                pa = (ai[:, None, :] * alive[None, :, :]) > 0
                ii = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + i0
                jj = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                hit = pa & (d2 < eps2) & (jj > ii)
                ri = chunk3(pr_s, i0)[:, None, :]
                rj = pr[None, :, :]
                rank = jnp.minimum(ri, rj) * base + jnp.maximum(ri, rj)
                return jnp.where(hit, rank, INF), hit

            def min_body(t, ftj):
                i0 = t * jchunk
                cand, _ = cand_chunk(i0)
                ftt_ref[pl.ds(i0, jchunk), :] = jnp.min(cand, axis=1)
                return jnp.minimum(ftj, jnp.min(cand, axis=0))

            ftj0 = jnp.full(x.shape, INF, dtype=jnp.int32)
            ftj = jax.lax.fori_loop(0, trips, min_body, ftj0)
            ftt_ref[:] = jnp.minimum(ftt_ref[:], ftj)
            ft = ftt_ref[:]

            def cnt_body(t, cnt):
                i0 = t * jchunk
                cand, hit = cand_chunk(i0)
                fti_c = chunk3(ftt_ref, i0)
                fb = (hit & (fti_c[:, None, :] == cand)
                      & (ft[None, :, :] == cand))
                return cnt + jnp.sum(fb, axis=(0, 1), dtype=jnp.int32,
                                     keepdims=False)[None, :]

            cnt0 = jnp.zeros((1, x.shape[1]), dtype=jnp.int32)
            count_ref[:] = jax.lax.fori_loop(0, trips, cnt_body, cnt0)

        mpost_s[:] = jnp.where(ftt_ref[:] != INF, jnp.float32(0.0),
                               mft_ref[:])
    else:
        ftt_ref[:] = jnp.full(x.shape, INF, dtype=jnp.int32)
        count_ref[:] = jnp.zeros((1, x.shape[1]), dtype=jnp.int32)
        mpost_s[:] = mft_ref[:]

    m_post = mpost_s[:]

    if force_form == "v4":
        # MXU-form force algebra (dense_xla.fused_pairs_v4's derivation):
        # fx_i = G·m_i·(Σ_j w_ij·xl_j − xl_i·Σ_j w_ij), w = m_j/d³, with
        # coordinates recentered per cell (lane) by the used-slot mean to
        # bound the contraction cancellation. Saves one multiply per pair
        # axis and shares the w tensor across three reductions.
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        used = m_post > zero
        nrow = jnp.maximum(jnp.sum(jnp.where(used, one, zero), axis=0,
                                   keepdims=True), one)
        xl_s[:] = x - jnp.sum(jnp.where(used, x, zero), axis=0,
                              keepdims=True) / nrow
        yl_s[:] = y - jnp.sum(jnp.where(used, y, zero), axis=0,
                              keepdims=True) / nrow
        xl = xl_s[:]
        yl = yl_s[:]

        def force_body(t, _):
            i0 = t * jchunk
            xi = chunk3(xl_s, i0)
            yi = chunk3(yl_s, i0)
            gmi = g * chunk3(mpost_s, i0)
            dx = xl[None, :, :] - xi[:, None, :]
            dy = yl[None, :, :] - yi[:, None, :]
            d2 = dx * dx + dy * dy
            nz = d2 > 0.0
            inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
            w = m_post[None, :, :] * (inv * inv * inv)
            sx = jnp.sum(w * xl[None, :, :], axis=1)
            sy = jnp.sum(w * yl[None, :, :], axis=1)
            sw = jnp.sum(w, axis=1)
            fxt_ref[pl.ds(i0, jchunk), :] = gmi * (sx - xi * sw)
            fyt_ref[pl.ds(i0, jchunk), :] = gmi * (sy - yi * sw)
            return 0
    else:
        def force_body(t, _):
            i0 = t * jchunk
            xi = chunk3(xt_ref, i0)
            yi = chunk3(yt_ref, i0)
            gmi = g * chunk3(mpost_s, i0)
            dx = x[None, :, :] - xi[:, None, :]
            dy = y[None, :, :] - yi[:, None, :]
            d2 = dx * dx + dy * dy
            nz = d2 > 0.0
            inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
            s = gmi[:, None, :] * m_post[None, :, :] * (inv * inv * inv)
            fxt_ref[pl.ds(i0, jchunk), :] = jnp.sum(s * dx, axis=1)
            fyt_ref[pl.ds(i0, jchunk), :] = jnp.sum(s * dy, axis=1)
            return 0

    jax.lax.fori_loop(0, trips, force_body, 0)


def _pick_tiling_v2(kcap: int) -> tuple[int, int]:
    """(cells per program, receiver chunk) for the transposed kernel.

    Cells ride the lane axis: CB=128 fills the lanes; receiver chunks
    ride sublanes, so Ic is free of alignment constraints beyond 8.
    Live set per fori iteration ≈ half a dozen (Ic, K, CB) tensors;
    Ic=16 at K=160, CB=128 is ~8 MB. Env-tunable for A/B sweeps.
    """
    import os
    cb = int(os.environ.get("PSIM_PALLAS_V2_CB", "128"))
    ic = int(os.environ.get("PSIM_PALLAS_V2_IC", "16"))
    ic = min(ic, kcap)
    while kcap % ic:          # chunk must divide K (no clamped overlap)
        ic //= 2
    return cb, max(ic, 1)


def _fused_kernel_v2_kt(x_ref, y_ref, mf_ref, alive_ref, pid_ref,
                        fx_ref, fy_ref, ft_ref, count_ref,
                        xt_s, yt_s, mft_s, alivet_s, pidt_s,
                        fxt_s, fyt_s, ftt_s, cnt_s, pr_s, mpost_s,
                        xl_s, yl_s, *,
                        kcap, eps2, jchunk, collide, force_form="v2"):
    """_fused_kernel_v2 with in-kernel transposes: blocks arrive in the
    engine's (CB, K) layout, get transposed once into (K, CB) scratch
    (VMEM lane<->sublane shuffles), and the transposed kernel body runs
    unchanged — no XLA-side layout copies (PSIM_PALLAS_V2_KT=1)."""
    xt_s[:] = x_ref[:].T
    yt_s[:] = y_ref[:].T
    mft_s[:] = mf_ref[:].T
    alivet_s[:] = alive_ref[:].T
    pidt_s[:] = pid_ref[:].T
    _fused_kernel_v2(xt_s, yt_s, mft_s, alivet_s, pidt_s,
                     fxt_s, fyt_s, ftt_s, cnt_s, pr_s, mpost_s, xl_s, yl_s,
                     kcap=kcap, eps2=eps2, jchunk=jchunk, collide=collide,
                     force_form=force_form)
    fx_ref[:] = fxt_s[:].T
    fy_ref[:] = fyt_s[:].T
    ft_ref[:] = ftt_s[:].T
    count_ref[:] = cnt_s[:]


def fused_pairs_v4(xd, yd, mfd, alived, ncells: int, kcap: int, eps: float,
                   collide: bool = True, pid=None):
    """Pallas twin of ops/dense_xla.fused_pairs_v4: the transposed v2
    kernel with the MXU-form force algebra (shared-w reductions over
    recentered coordinates). Collision outputs are bit-identical to the
    v2 kernels; forces carry v4's contraction-cancellation term (adopted
    at production domain sizes — see the dense_xla quantization study)."""
    return fused_pairs_v2(xd, yd, mfd, alived, ncells, kcap, eps,
                          collide=collide, pid=pid, force_form="v4")


def fused_pairs_v2(xd, yd, mfd, alived, ncells: int, kcap: int, eps: float,
                   collide: bool = True, pid=None, force_form="v2"):
    """Pallas twin of ops/dense_xla.fused_pairs_v2 (same contract).

    Transposes tiles to (K, ncells) layout (cells on lanes — see
    _fused_kernel_v2) either at the XLA level (default: reindex copies
    outside the kernel) or inside the kernel per block
    (PSIM_PALLAS_V2_KT=1: VMEM shuffles, no HBM layout copies).
    """
    import os

    cb, jchunk = _pick_tiling_v2(kcap)
    nblocks = pl.cdiv(ncells, cb)
    pad_cells = nblocks * cb - ncells
    if pid is None:
        pid = _slot_iota_pid(ncells, kcap)
    xd, yd, mfd, alived, pid = _padded([xd, yd, mfd, alived, pid],
                                       pad_cells, kcap)
    tspec = pl.BlockSpec((kcap, cb), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    kernel_transpose = os.environ.get("PSIM_PALLAS_V2_KT") == "1"
    if kernel_transpose:
        nspec = pl.BlockSpec((cb, kcap), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((1, cb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        fx, fy, ft, counts = pl.pallas_call(
            functools.partial(_fused_kernel_v2_kt, kcap=kcap,
                              eps2=float(eps) * float(eps), jchunk=jchunk,
                              collide=collide, force_form=force_form),
            grid=(nblocks,),
            in_specs=[nspec] * 5,
            out_specs=(nspec, nspec, nspec, cspec),
            out_shape=(
                jax.ShapeDtypeStruct(xd.shape, xd.dtype),
                jax.ShapeDtypeStruct(xd.shape, xd.dtype),
                jax.ShapeDtypeStruct(xd.shape, jnp.int32),
                jax.ShapeDtypeStruct((1, xd.shape[0]), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((kcap, cb), jnp.float32),   # xT
                pltpu.VMEM((kcap, cb), jnp.float32),   # yT
                pltpu.VMEM((kcap, cb), jnp.float32),   # mfT
                pltpu.VMEM((kcap, cb), jnp.int32),     # aliveT
                pltpu.VMEM((kcap, cb), jnp.int32),     # pidT
                pltpu.VMEM((kcap, cb), jnp.float32),   # fxT
                pltpu.VMEM((kcap, cb), jnp.float32),   # fyT
                pltpu.VMEM((kcap, cb), jnp.int32),     # ftT
                pltpu.VMEM((1, cb), jnp.int32),        # count
                pltpu.VMEM((kcap, cb), jnp.int32),     # pid ranks
                pltpu.VMEM((kcap, cb), jnp.float32),   # post-death masses
                pltpu.VMEM((kcap, cb), jnp.float32),   # recentered x (v4)
                pltpu.VMEM((kcap, cb), jnp.float32),   # recentered y (v4)
            ],
            interpret=_interpret(),
        )(xd, yd, mfd, alived, pid)
        if pad_cells:
            fx, fy, ft = fx[:ncells], fy[:ncells], ft[:ncells]
        return fx, fy, jnp.sum(counts, dtype=jnp.int32), ft

    xt, yt, mft, alivet, pidt = (a.T for a in (xd, yd, mfd, alived, pid))
    cspec = pl.BlockSpec((1, cb), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    fxt, fyt, ftt, counts = pl.pallas_call(
        functools.partial(_fused_kernel_v2, kcap=kcap,
                          eps2=float(eps) * float(eps), jchunk=jchunk,
                          collide=collide, force_form=force_form),
        grid=(nblocks,),
        in_specs=[tspec, tspec, tspec, tspec, tspec],
        out_specs=(tspec, tspec, tspec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, xt.dtype),
            jax.ShapeDtypeStruct(xt.shape, xt.dtype),
            jax.ShapeDtypeStruct(xt.shape, jnp.int32),
            jax.ShapeDtypeStruct((1, xt.shape[1]), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kcap, cb), jnp.int32),     # pid ranks
            pltpu.VMEM((kcap, cb), jnp.float32),   # post-death masses
            pltpu.VMEM((kcap, cb), jnp.float32),   # recentered x (v4)
            pltpu.VMEM((kcap, cb), jnp.float32),   # recentered y (v4)
        ],
        interpret=_interpret(),
    )(xt, yt, mft, alivet, pidt)
    fx, fy, ft = fxt.T, fyt.T, ftt.T
    if pad_cells:
        fx, fy, ft = fx[:ncells], fy[:ncells], ft[:ncells]
    return fx, fy, jnp.sum(counts, dtype=jnp.int32), ft


def _slot_iota_pid(ncells, kcap):
    """Fallback pid tile when slot order IS pid order (sorted dense impl):
    a slot iota yields the same pair ordering as the original slot ranks."""
    return jnp.broadcast_to(jnp.arange(kcap, dtype=jnp.int32)[None, :],
                            (ncells, kcap))


def fused_pairs(xd, yd, mfd, alived, ncells: int, kcap: int, eps: float,
                collide: bool = True, pid=None):
    """Pallas twin of ops/dense_xla.fused_pairs (same signature/semantics).

    Interpreter-validated here; intended for first-party TPU runtimes where
    Pallas custom calls execute (the axon tunnel cannot — DEVNOTES.md).
    """
    cb, jchunk = _pick_tiling(kcap)
    nblocks = pl.cdiv(ncells, cb)
    pad_cells = nblocks * cb - ncells
    if pid is None:
        pid = _slot_iota_pid(ncells, kcap)
    xd, yd, mfd, alived, pid = _padded([xd, yd, mfd, alived, pid],
                                       pad_cells, kcap)
    spec = pl.BlockSpec((cb, kcap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((cb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fx, fy, ft, counts = pl.pallas_call(
        functools.partial(_fused_kernel, kcap=kcap,
                          eps2=float(eps) * float(eps), jchunk=jchunk,
                          collide=collide),
        grid=(nblocks,),
        in_specs=[spec, spec, spec, spec, spec],
        out_specs=(spec, spec, spec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct(xd.shape, xd.dtype),
            jax.ShapeDtypeStruct(xd.shape, xd.dtype),
            jax.ShapeDtypeStruct(xd.shape, jnp.int32),
            jax.ShapeDtypeStruct((xd.shape[0], 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(xd, yd, mfd, alived, pid)
    if pad_cells:
        fx, fy, ft, counts = (fx[:ncells], fy[:ncells], ft[:ncells],
                              counts[:ncells])
    return fx, fy, jnp.sum(counts, dtype=jnp.int32), ft


def _pick_tiling(kcap: int) -> tuple[int, int]:
    """(cells per program, receiver chunk).

    Mosaic allocates every live (CB, Ic, K) intermediate on the VMEM stack,
    so keep each one small with CB=8 (the sublane minimum); the lane
    dimension stays at the full K for VPU width. The per-intermediate
    budget is tunable: the collision passes keep ~a dozen (CB, Ic, K) int
    tensors live and the default 16 MiB scoped-vmem limit was measured to
    overflow at 512 KiB tiles on v5e (DEVNOTES.md round-2 probe), so the
    default is 64 KiB.
    """
    import os
    cb = int(os.environ.get("PSIM_PALLAS_CB", "8"))
    kb = int(os.environ.get("PSIM_PALLAS_TILE_KB", "64"))
    target_elems = (kb * 1024) // 4
    ic = max(8, target_elems // max(cb * kcap, 1))
    p = 8
    while p * 2 <= ic:
        p *= 2
    return cb, min(p, kcap)


def _padded(arrs, pad_cells, kcap):
    if not pad_cells:
        return arrs
    return [jnp.concatenate([a, jnp.zeros((pad_cells,) + a.shape[1:],
                                          a.dtype)]) for a in arrs]


def dense_pairwise_forces(xd, yd, md, ml, mxl, myl, ncells: int, kcap: int):
    """(ncells, K) tiles + (ncells, 8) stencil → per-slot (fx, fy)."""
    cb, jchunk = _pick_tiling(kcap)
    nblocks = pl.cdiv(ncells, cb)
    pad_cells = nblocks * cb - ncells
    xd, yd, md, ml, mxl, myl = _padded([xd, yd, md, ml, mxl, myl],
                                       pad_cells, kcap)
    spec = pl.BlockSpec((cb, kcap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((cb, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fx, fy = pl.pallas_call(
        functools.partial(_force_kernel, jchunk=jchunk),
        grid=(nblocks,),
        in_specs=[spec, spec, spec, sspec, sspec, sspec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(xd.shape, xd.dtype),
                   jax.ShapeDtypeStruct(xd.shape, xd.dtype)),
        interpret=_interpret(),
    )(xd, yd, md, ml, mxl, myl)
    if pad_cells:
        fx, fy = fx[:ncells], fy[:ncells]
    return fx, fy


def dense_collisions(xd, yd, alived, ncells: int, kcap: int, eps: float,
                     pid=None):
    """(ncells, K) tiles → (count, ft int32 per slot)."""
    cb, jchunk = _pick_tiling(kcap)
    nblocks = pl.cdiv(ncells, cb)
    pad_cells = nblocks * cb - ncells
    if pid is None:
        pid = _slot_iota_pid(ncells, kcap)
    xd, yd, alived, pid = _padded([xd, yd, alived, pid], pad_cells, kcap)
    spec = pl.BlockSpec((cb, kcap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((cb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ft, counts = pl.pallas_call(
        functools.partial(_collision_kernel, kcap=kcap,
                          eps2=float(eps) * float(eps), jchunk=jchunk),
        grid=(nblocks,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct(xd.shape, jnp.int32),
            jax.ShapeDtypeStruct((xd.shape[0], 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(xd, yd, alived, pid)
    if pad_cells:
        ft, counts = ft[:ncells], counts[:ncells]
    return jnp.sum(counts, dtype=jnp.int32), ft
