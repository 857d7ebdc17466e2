"""3x3 neighbor-cell monopole stencil with periodic minimum image.

The reference builds, per cell, eight "temp cells" holding each neighbor's COM
offset by ±side per wrapped axis (reference serial/parsim.cpp:301-354). Here
the same data is built for *all* cells at once with ``jnp.roll`` on the
``(ncside, ncside)`` COM grids plus edge-masked mirror offsets — no scatter,
no per-cell loop, and the construction degenerates correctly for
``ncside < 3`` where neighbors alias (SURVEY §2.4 P6: grid 1 sees itself 8
times with different offsets).

Stencil order is the reference's loop order — dx outer, dy inner, skipping
(0,0) (serial/parsim.cpp:301-305) — which the parity path's accumulation
order depends on.
"""

from __future__ import annotations

import jax.numpy as jnp

# (dx, dy) in reference iteration order.
STENCIL = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
           (1, -1), (1, 0), (1, 1))


def stencil_tables(M, MX, MY, side: float, ncside: int):
    """Neighbor monopole tables.

    Args:
      M, MX, MY: flat (ncells,) per-cell mass / COM arrays.
    Returns:
      (ml, mxl, myl): each (8, ncells + 1); row l holds, for every cell, the
      l-th temp-cell of the reference (neighbor COM with mirror offset
      pre-added). The final column is a zero sentinel for out-of-range
      particles to gather harmlessly.
    """
    dt = MX.dtype
    nc = ncside
    side_a = jnp.asarray(side, dt)
    M2 = M.reshape(nc, nc)    # [cy, cx]
    MX2 = MX.reshape(nc, nc)
    MY2 = MY.reshape(nc, nc)

    cx = jnp.arange(nc, dtype=jnp.int32)[None, :]  # column index = cell x
    cy = jnp.arange(nc, dtype=jnp.int32)[:, None]  # row index = cell y

    ml, mxl, myl = [], [], []
    for dx, dy in STENCIL:
        # rolled[cy, cx] = A[(cy+dy) % nc, (cx+dx) % nc]
        rm = jnp.roll(M2, (-dy, -dx), axis=(0, 1))
        rmx = jnp.roll(MX2, (-dy, -dx), axis=(0, 1))
        rmy = jnp.roll(MY2, (-dy, -dx), axis=(0, 1))
        # Mirror offsets: cx+dx >= nc → +side; cx+dx < 0 → -side
        # (reference serial/parsim.cpp:314-329). Only reachable at the edges.
        if dx == 1:
            offx = jnp.where(cx == nc - 1, side_a, jnp.asarray(0.0, dt))
        elif dx == -1:
            offx = jnp.where(cx == 0, -side_a, jnp.asarray(0.0, dt))
        else:
            offx = jnp.asarray(0.0, dt)
        if dy == 1:
            offy = jnp.where(cy == nc - 1, side_a, jnp.asarray(0.0, dt))
        elif dy == -1:
            offy = jnp.where(cy == 0, -side_a, jnp.asarray(0.0, dt))
        else:
            offy = jnp.asarray(0.0, dt)
        # temp.mx = offset, then temp.mx += neighbor.mx → offset + mx
        # (serial/parsim.cpp:316-347); the add order is preserved.
        ml.append(jnp.broadcast_to(rm, (nc, nc)).reshape(-1))
        mxl.append((offx + rmx).reshape(-1))
        myl.append((offy + rmy).reshape(-1))

    pad = jnp.zeros((8, 1), dtype=dt)
    ml = jnp.concatenate([jnp.stack(ml), pad], axis=1)
    mxl = jnp.concatenate([jnp.stack(mxl), pad], axis=1)
    myl = jnp.concatenate([jnp.stack(myl), pad], axis=1)
    return ml, mxl, myl
