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
    fx = jnp.zeros_like(x)
    fy = jnp.zeros_like(x)
    # Pairwise: t[c, i, j] = force on slot i from partner slot j.
    for jc in range(0, kcap, jchunk):
        xj = x[:, jc:jc + jchunk]
        yj = y[:, jc:jc + jchunk]
        mj = m[:, jc:jc + jchunk]
        dx = xj[:, None, :] - x[:, :, None]   # (CB, K, Jc)
        dy = yj[:, None, :] - y[:, :, None]
        d2 = dx * dx + dy * dy
        nz = d2 > 0.0
        inv = jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)
        s = gm[:, :, None] * mj[:, None, :] * (inv * inv * inv)
        fx = fx + jnp.sum(s * dx, axis=2)
        fy = fy + jnp.sum(s * dy, axis=2)
    # Monopole: 8 static stencil terms, row-broadcast per cell.
    for l in range(8):
        cm = ml_ref[:, l][:, None]
        dxl = mxl_ref[:, l][:, None] - x
        dyl = myl_ref[:, l][:, None] - y
        d2l = dxl * dxl + dyl * dyl
        nzl = d2l > 0.0
        invl = jnp.where(nzl, jax.lax.rsqrt(jnp.where(nzl, d2l, 1.0)), 0.0)
        sl = gm * cm * (invl * invl * invl)
        fx = fx + sl * dxl
        fy = fy + sl * dyl
    fx_ref[:] = fx
    fy_ref[:] = fy


def _collision_kernel(x_ref, y_ref, alive_ref, ft_ref, count_ref, *,
                      kcap, eps2, jchunk):
    """First-colliding-pair ranks + set-rule count per cell row.

    alive: int32 (1/0). ft: uint32 min pair-rank per slot (0xFFFFFFFF if
    none). count: (CB, 1) partial counts, summed by the caller. Implements
    the exact reference collision-set semantics (see ops/collisions.py).
    Two chunked passes: min-rank accumulation, then first-pair counting.
    """
    x = x_ref[:]
    y = y_ref[:]
    alive = alive_ref[:]
    INF = jnp.uint32(0xFFFFFFFF)
    base = jnp.uint32(kcap + 1)

    def chunk_cand(jc):
        xj = x[:, jc:jc + jchunk]
        yj = y[:, jc:jc + jchunk]
        aj = alive[:, jc:jc + jchunk]
        dx = xj[:, None, :] - x[:, :, None]   # (CB, K, Jc)
        dy = yj[:, None, :] - y[:, :, None]
        d2 = dx * dx + dy * dy
        pair_alive = (alive[:, :, None] * aj[:, None, :]) > 0
        i_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2) + jc
        hit = pair_alive & (d2 < eps2) & (j_idx > i_idx)
        rank = i_idx.astype(jnp.uint32) * base + j_idx.astype(jnp.uint32)
        return jnp.where(hit, rank, INF), hit

    ft = jnp.full(x.shape, INF, dtype=jnp.uint32)
    col_mins = []
    for jc in range(0, kcap, jchunk):
        cand, _ = chunk_cand(jc)
        ft = jnp.minimum(ft, jnp.min(cand, axis=2))          # slot as i
        col_mins.append(jnp.min(cand, axis=1))               # slot as j
    ft = jnp.minimum(ft, jnp.concatenate(col_mins, axis=1))
    ft_ref[:] = ft

    count = jnp.zeros((x.shape[0], 1), dtype=jnp.int32)
    for jc in range(0, kcap, jchunk):
        cand, hit = chunk_cand(jc)
        ftj = ft[:, jc:jc + jchunk]
        first_both = hit & (ft[:, :, None] == cand) & (ftj[:, None, :] == cand)
        count = count + jnp.sum(first_both, axis=(1, 2),
                                dtype=jnp.int32)[:, None]
    count_ref[:] = count


def _pick_tiling(kcap: int) -> tuple[int, int]:
    """(cells per program, partner chunk): TPU wants the sublane dim (cells)
    in multiples of 8; keep (CB, K, Jc) f32 intermediates ~≤2MB."""
    jchunk = min(kcap, 128 if kcap < 1024 else 64)
    budget = 2 * 1024 * 1024 // 4
    cb = budget // max(kcap * jchunk, 1)
    cb = max(8, (cb // 8) * 8)
    return min(cb, 512), jchunk


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


def dense_collisions(xd, yd, alived, ncells: int, kcap: int, eps: float):
    """(ncells, K) tiles → (count, ft uint32 per slot)."""
    cb, jchunk = _pick_tiling(kcap)
    nblocks = pl.cdiv(ncells, cb)
    pad_cells = nblocks * cb - ncells
    xd, yd, alived = _padded([xd, yd, alived], pad_cells, kcap)
    spec = pl.BlockSpec((cb, kcap), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((cb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ft, counts = pl.pallas_call(
        functools.partial(_collision_kernel, kcap=kcap,
                          eps2=float(eps) * float(eps), jchunk=jchunk),
        grid=(nblocks,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct(xd.shape, jnp.uint32),
            jax.ShapeDtypeStruct((xd.shape[0], 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(xd, yd, alived)
    if pad_cells:
        ft, counts = ft[:ncells], counts[:ncells]
    return jnp.sum(counts, dtype=jnp.int32), ft
