"""Dense per-cell-tile force/collision passes in pure XLA.

Same (ncells, K) slot-tile layout and math as the Pallas kernels in
``ops/pallas/cell_pairs.py``, expressed as a ``lax.map`` over blocks of
cells so XLA bounds the (CB, Ic, K) pair intermediates instead of
materializing the full (ncells, K, K) tensor. This is the fast-engine hot
path on runtimes where Pallas custom calls are unavailable; the Pallas
kernels remain the intended path on first-party TPU runtimes.

Replaces the per-offset sweep (O(k) separate shifted passes over HBM) with
blockwise all-pairs arithmetic — the pair work becomes compute-bound
instead of HBM/latency-bound.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from particlesimulation_tpu.config import G

# Cells per lax.map iteration. Each iteration is a separate device launch;
# with fused elementwise+reduce bodies nothing K²-sized materializes, so
# bigger blocks amortize launch overhead (the dominant cost at N=1e6).
CELL_BLOCK = int(os.environ.get("PSIM_CELL_BLOCK", "1024"))


def _blocked(a, cb):
    nb = -(-a.shape[0] // cb)
    pad = nb * cb - a.shape[0]
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a.reshape(nb, cb, *a.shape[1:])


def dense_pairwise_forces(xd, yd, md, ml_t, mxl_t, myl_t, ncells: int,
                          kcap: int, cb: int = CELL_BLOCK):
    """(ncells, K) tiles + (ncells, 8) stencil → per-slot (fx, fy)."""
    g = jnp.float32(G)

    def block(args):
        x, y, m, ml, mxl, myl = args          # (cb, K), (cb, 8)
        gm = g * m
        dx = x[:, None, :] - x[:, :, None]    # (cb, K, K) — fused by XLA
        dy = y[:, None, :] - y[:, :, None]
        d2 = dx * dx + dy * dy
        nz = d2 > 0.0
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
        s = gm[:, :, None] * m[:, None, :] * (inv * inv * inv)
        fx = jnp.sum(s * dx, axis=2)
        fy = jnp.sum(s * dy, axis=2)
        for l in range(8):
            cm = ml[:, l:l + 1]
            dxl = mxl[:, l:l + 1] - x
            dyl = myl[:, l:l + 1] - y
            d2l = dxl * dxl + dyl * dyl
            nzl = d2l > 0.0
            invl = jnp.where(nzl, jax.lax.rsqrt(jnp.where(nzl, d2l, 1.0)),
                             0.0)
            sl = gm * cm * (invl * invl * invl)
            fx = fx + sl * dxl
            fy = fy + sl * dyl
        return fx, fy

    args = tuple(_blocked(a, cb) for a in (xd, yd, md, ml_t, mxl_t, myl_t))
    fx, fy = jax.lax.map(block, args)
    fx = fx.reshape(-1, kcap)[:ncells]
    fy = fy.reshape(-1, kcap)[:ncells]
    return fx, fy


def fused_pairs(xd, yd, mfd, alived, ncells: int, kcap: int, eps: float,
                collide: bool = True, cb: int = CELL_BLOCK):
    """One pair sweep producing both step t's collisions and step t+1's
    pairwise forces.

    The collision pass over post-move positions and the next step's pairwise
    force pass iterate the *same* pair distances, so a single kernel computes
    d² once per pair and emits: (fxd, fyd, count, ftd). Forces use masses
    with this pass's deaths already applied (exactly the reference ordering:
    merged particles are massless for the next step's forces,
    serial/parsim.cpp:414-418 then :292-377).

    mfd: physics masses (limbo-masked); alived: int32 collision-alive mask.
    With ``collide=False`` (run prologue) no pairs collide and masses pass
    through unchanged.
    """
    g = jnp.float32(G)
    eps2 = jnp.float32(eps) * jnp.float32(eps)
    INF = jnp.int32(0x7FFFFFFF)
    base = jnp.int32(kcap + 1)

    def block(args):
        x, y, mf, alive = args
        dx = x[:, None, :] - x[:, :, None]
        dy = y[:, None, :] - y[:, :, None]
        d2 = dx * dx + dy * dy
        if collide:
            pair_alive = (alive[:, :, None] * alive[:, None, :]) > 0
            i_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            j_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
            hit = pair_alive & (d2 < eps2) & (j_idx > i_idx)
            rank = i_idx * base + j_idx
            cand = jnp.where(hit, rank, INF)
            ft = jnp.minimum(jnp.min(cand, axis=2), jnp.min(cand, axis=1))
            first_both = (hit & (ft[:, :, None] == cand)
                          & (ft[:, None, :] == cand))
            cnt = jnp.sum(first_both, dtype=jnp.int32)
            m_post = jnp.where(ft != INF, jnp.float32(0.0), mf)
        else:
            ft = jnp.full(x.shape, INF, dtype=jnp.int32)
            cnt = jnp.int32(0)
            m_post = mf
        nz = d2 > 0.0
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
        s = (g * m_post)[:, :, None] * m_post[:, None, :] * (inv * inv * inv)
        fx = jnp.sum(s * dx, axis=2)
        fy = jnp.sum(s * dy, axis=2)
        return fx, fy, ft, cnt

    args = tuple(_blocked(a, cb) for a in (xd, yd, mfd, alived))
    fx, fy, ft, cnts = jax.lax.map(block, args)
    return (fx.reshape(-1, kcap)[:ncells], fy.reshape(-1, kcap)[:ncells],
            jnp.sum(cnts, dtype=jnp.int32), ft.reshape(-1, kcap)[:ncells])


def monopole_tile_forces(xd, yd, mfd, ml_t, mxl_t, myl_t):
    """8 stencil monopole terms per slot, directly on tiles (elementwise)."""
    g = jnp.float32(G)
    gm = g * mfd
    fx = jnp.zeros_like(xd)
    fy = jnp.zeros_like(xd)
    for l in range(8):
        cm = ml_t[:, l:l + 1]
        dxl = mxl_t[:, l:l + 1] - xd
        dyl = myl_t[:, l:l + 1] - yd
        d2l = dxl * dxl + dyl * dyl
        nzl = d2l > 0.0
        invl = jnp.where(nzl, jax.lax.rsqrt(jnp.where(nzl, d2l, 1.0)), 0.0)
        sl = gm * cm * (invl * invl * invl)
        fx = fx + sl * dxl
        fy = fy + sl * dyl
    return fx, fy


def dense_collisions(xd, yd, alived, ncells: int, kcap: int, eps: float,
                     cb: int = CELL_BLOCK):
    """(ncells, K) tiles → (count, ft int32 per slot).

    Same first-colliding-pair formulation as ops/collisions.py (exact
    reference set-rule semantics).
    """
    eps2 = jnp.float32(eps) * jnp.float32(eps)
    INF = jnp.int32(0x7FFFFFFF)
    base = jnp.int32(kcap + 1)

    def block(args):
        x, y, alive = args
        dx = x[:, None, :] - x[:, :, None]
        dy = y[:, None, :] - y[:, :, None]
        d2 = dx * dx + dy * dy
        pair_alive = (alive[:, :, None] * alive[:, None, :]) > 0
        i_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        hit = pair_alive & (d2 < eps2) & (j_idx > i_idx)
        rank = i_idx * base + j_idx
        cand = jnp.where(hit, rank, INF)
        ft = jnp.minimum(jnp.min(cand, axis=2), jnp.min(cand, axis=1))
        first_both = hit & (ft[:, :, None] == cand) & (ft[:, None, :] == cand)
        cnt = jnp.sum(first_both, dtype=jnp.int32)
        return ft, cnt

    args = tuple(_blocked(a, cb) for a in (xd, yd, alived))
    ft, cnts = jax.lax.map(block, args)
    return jnp.sum(cnts, dtype=jnp.int32), ft.reshape(-1, kcap)[:ncells]
