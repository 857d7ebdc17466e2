"""Pallas rebin kernel vs the XLA rebin round (interpreter mode).

The kernel (ops/pallas/rebin_tile.py) must deliver exactly the same
particle→cell assignment as ops/resident.rebin — slot *placement* inside a
row may differ (rank-matched compact slots vs per-direction reserved
ranks; physics is slot-order independent), so equivalence is asserted at
the per-row multiset level: same set of (pid, x, y, vx, vy, m) per cell
row, same occupancy counts, same undelivered verdict.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from particlesimulation_tpu.ops import resident as res
from particlesimulation_tpu.ops.pallas import rebin_tile


def _tiles(ncside, kcap, rng, n, side, clustered=False):
    """Random occupied tiles with in-range positions."""
    shape = (ncside * ncside, kcap)
    x = np.zeros(shape, np.float32)
    y = np.zeros(shape, np.float32)
    vx = rng.normal(size=shape).astype(np.float32)
    vy = rng.normal(size=shape).astype(np.float32)
    m = np.zeros(shape, np.float32)
    occ = np.zeros(shape, bool)
    pid = np.zeros(shape, np.int32)
    w = side / ncside
    cells = (rng.integers(0, ncside * ncside, n) if not clustered
             else np.minimum(rng.integers(0, 3, n), ncside * ncside - 1))
    next_slot = np.zeros(ncside * ncside, np.int32)
    placed = 0
    for p in range(n):
        c = cells[p]
        s = next_slot[c]
        if s >= kcap:
            continue
        next_slot[c] += 1
        cx, cy = c % ncside, c // ncside
        x[c, s] = (cx + rng.uniform(0.05, 0.95)) * w
        y[c, s] = (cy + rng.uniform(0.05, 0.95)) * w
        m[c, s] = rng.uniform(0.5, 2.0)
        occ[c, s] = True
        pid[c, s] = placed
        placed += 1
    return res.TileState(
        x=jnp.asarray(x), y=jnp.asarray(y), vx=jnp.asarray(vx),
        vy=jnp.asarray(vy), m=jnp.asarray(m), occ=jnp.asarray(occ),
        pid=jnp.asarray(pid), collisions=jnp.int32(0),
        panics=jnp.int32(0), overflow=jnp.int32(0))


def _displace(ts, rng, side, frac=0.3, scale=1.2):
    """Move a fraction of occupied slots by up to ``scale`` cell widths."""
    occ = np.asarray(ts.occ)
    mask = occ & (rng.uniform(size=occ.shape) < frac)
    dx = rng.uniform(-scale, scale, occ.shape).astype(np.float32)
    dy = rng.uniform(-scale, scale, occ.shape).astype(np.float32)
    w = np.float32(side / int(np.sqrt(occ.shape[0])))
    x = np.where(mask, (np.asarray(ts.x) + dx * w) % side, np.asarray(ts.x))
    y = np.where(mask, (np.asarray(ts.y) + dy * w) % side, np.asarray(ts.y))
    return ts._replace(x=jnp.asarray(x.astype(np.float32)),
                       y=jnp.asarray(y.astype(np.float32)))


def _row_multisets(ts, ncside, kcap):
    occ = np.asarray(ts.occ)
    out = []
    for c in range(ncside * ncside):
        rows = []
        for s in range(kcap):
            if occ[c, s]:
                rows.append((int(np.asarray(ts.pid)[c, s]),
                             float(np.asarray(ts.x)[c, s]),
                             float(np.asarray(ts.y)[c, s]),
                             float(np.asarray(ts.vx)[c, s]),
                             float(np.asarray(ts.vy)[c, s]),
                             float(np.asarray(ts.m)[c, s])))
        out.append(sorted(rows))
    return out


def test_supported_gate():
    """Aligned even-divisor block factorings only; others fall back to the
    XLA round in the engine."""
    assert rebin_tile.supported(100, None, None)   # bench grid (rb=2)
    assert rebin_tile.supported(20, None, None)    # MEDIUM workload
    assert rebin_tile.supported(8, None, None)
    assert rebin_tile.supported(4, None, None)
    assert not rebin_tile.supported(5, None, None)   # odd
    assert not rebin_tile.supported(50, None, None)  # no aligned factoring
    assert not rebin_tile.supported(8, 10, None)     # non-square (sharded)
    assert not rebin_tile.supported(8, None, lambda s: None)  # mover_fn


@pytest.mark.parametrize("ncside,kcap,n,frac,scale", [
    (8, 12, 200, 0.3, 1.2),    # bench-like mover rate, single hops
    (8, 12, 220, 0.8, 1.2),    # heavy churn (multi-delivery pressure)
    (8, 12, 140, 0.5, 2.8),    # multi-cell hops (several rounds)
    (4, 10, 50, 0.6, 1.2),     # two blocks: top and bottom halo coincide
    (12, 8, 140, 0.5, 1.2),    # rb=2 over 6 blocks, smaller kcap
])
def test_kernel_matches_xla_round(ncside, kcap, n, frac, scale):
    rng = np.random.default_rng(ncside * 1000 + n)
    side = float(ncside)
    ts = _displace(_tiles(ncside, kcap, rng, n, side), rng, side,
                   frac, scale)

    ref, left_ref = res.rebin(ts, side, ncside, kcap)
    ker, left_ker = rebin_tile.rebin(ts, side, ncside, kcap)

    if int(left_ref) > 0:
        # Saturated rows in the XLA round (it reserves free rank d+1 for
        # direction d, so a row with few free slots only accepts from the
        # leading directions). The kernel's compact rank-matching uses
        # free slots at least as well — it may deliver everything the XLA
        # round strands, never more stranding.
        assert int(left_ker) <= int(left_ref)
        return
    assert int(left_ker) == 0
    a = _row_multisets(ref, ncside, kcap)
    b = _row_multisets(ker, ncside, kcap)
    for c, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"cell {c}: {ra} vs {rb}"


def test_kernel_overflow_matches():
    """A saturated destination row must leave movers pending in both."""
    ncside, kcap = 4, 4
    side = float(ncside)
    rng = np.random.default_rng(0)
    ts = _tiles(ncside, kcap, rng, 0, side)
    x = np.asarray(ts.x).copy()
    y = np.asarray(ts.y).copy()
    m = np.asarray(ts.m).copy()
    occ = np.asarray(ts.occ).copy()
    pid = np.asarray(ts.pid).copy()
    w = side / ncside
    # Fill cell (1,1) completely with stayers.
    for s in range(kcap):
        occ[5, s] = True
        x[5, s] = 1.5 * w
        y[5, s] = 1.5 * w
        m[5, s] = 1.0
        pid[5, s] = s
    # Two movers in cell (0,1) heading into the full cell (1,1).
    for s in range(2):
        occ[4, s] = True
        x[4, s] = 1.5 * w          # cell x=1
        y[4, s] = 1.5 * w          # cell y=1
        m[4, s] = 1.0
        pid[4, s] = 10 + s
    ts = ts._replace(x=jnp.asarray(x), y=jnp.asarray(y), m=jnp.asarray(m),
                     occ=jnp.asarray(occ), pid=jnp.asarray(pid))

    ref, left_ref = res.rebin(ts, side, ncside, kcap)
    ker, left_ker = rebin_tile.rebin(ts, side, ncside, kcap)
    assert int(left_ref) == 2
    assert int(left_ker) == 2
    assert _row_multisets(ref, ncside, kcap) == _row_multisets(
        ker, ncside, kcap)
