"""Occupancy-tiered (blocked) sweep formulations vs the global sweeps.

The blocked variants must be BIT-identical to the global formulations (the
parity engine's golden-vector claim rests on it): forces by the masked-term
no-op argument (ops/forces.py docstring), collisions because integer min /
sum are order-free. Verified here across block sizes that force padding,
cells straddling block boundaries, and hot cells (kmax ≫ mean occupancy).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from particlesimulation_tpu.config import EPSILON, Precision, SimConfig
from particlesimulation_tpu.ops import binning, collisions, forces

RNG = np.random.default_rng(42)


def _sorted_config(n, side, nc, cluster=None):
    """Random particles, optionally with a hot cell; sorted by (key, pid)."""
    x = RNG.uniform(0, side, n)
    y = RNG.uniform(0, side, n)
    if cluster:
        frac, cx, cy = cluster
        k = int(n * frac)
        w = side / nc
        x[:k] = RNG.uniform(cx * w, (cx + 1) * w, k)
        y[:k] = RNG.uniform(cy * w, (cy + 1) * w, k)
    m = RNG.uniform(0.5, 2.0, n)
    alive = RNG.uniform(size=n) > 0.1
    key, valid = binning.cell_keys(jnp.asarray(x), jnp.asarray(y), side, nc)
    key, pid, xs, ys, ms, als = binning.sort_by_cell(
        key, jnp.arange(n, dtype=jnp.int32), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(m), jnp.asarray(alive))
    pos, _ = binning.segment_positions(key)
    kmax = binning.max_occupancy(pos, key < nc * nc)
    return xs, ys, ms, als, key, pos, kmax, nc * nc


CONFIGS = [
    (300, 4.0, 3, None),            # small, dense cells
    (1000, 10.0, 7, (0.4, 2, 3)),   # hot cell: 40% of particles in one cell
    (5000, 50.0, 20, (0.2, 0, 0)),  # hot corner cell + sparse background
    (37, 2.0, 2, None),             # n smaller than any block size
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=["dense", "hot", "corner", "tiny"])
@pytest.mark.parametrize("block", [128, 256, 1024])
def test_blocked_forces_bitexact(cfg, block):
    n, side, nc, cluster = cfg
    x, y, m, alive, key, pos, kmax, ncells = _sorted_config(
        n, side, nc, cluster)
    fx_g, fy_g = forces.pairwise_forces_parity(x, y, m, alive, key, kmax,
                                               ncells)
    fx_b, fy_b = forces.pairwise_forces_parity_blocked(
        x, y, m, alive, key, kmax, ncells, block=block)
    np.testing.assert_array_equal(np.asarray(fx_g), np.asarray(fx_b))
    np.testing.assert_array_equal(np.asarray(fy_g), np.asarray(fy_b))


@pytest.mark.parametrize("cfg", CONFIGS, ids=["dense", "hot", "corner", "tiny"])
@pytest.mark.parametrize("block", [128, 1024])
def test_blocked_collisions_exact(cfg, block):
    n, side, nc, cluster = cfg
    # Tight epsilon-scale geometry: duplicate some positions so collisions
    # actually occur (incl. chains sharing a particle).
    x, y, m, alive, key, pos, kmax, ncells = _sorted_config(
        n, side, nc, cluster)
    xx = np.asarray(x).copy()
    yy = np.asarray(y).copy()
    for i in range(0, n - 3, 7):
        xx[i + 1] = xx[i]
        yy[i + 1] = yy[i] + EPSILON / 3
        xx[i + 2] = xx[i]
        yy[i + 2] = yy[i] - EPSILON / 3
    x, y = jnp.asarray(xx), jnp.asarray(yy)
    cnt_g, died_g = collisions.detect_collisions(
        x, y, alive, key, pos, kmax, EPSILON, ncells)
    cnt_b, died_b = collisions.detect_collisions_blocked(
        x, y, alive, key, pos, kmax, EPSILON, ncells, block=block)
    assert int(cnt_g) == int(cnt_b)
    np.testing.assert_array_equal(np.asarray(died_g), np.asarray(died_b))
    assert int(cnt_g) > 0  # the synthetic chains must actually collide


def test_blocked_is_engine_default_and_matches_global(monkeypatch):
    """End-to-end: a multi-step parity run is bitwise identical either way."""
    from particlesimulation_tpu.engine import Engine

    cfg = SimConfig(seed=-10, side=3.0, ncside=3, n_particles=100,
                    precision=Precision.PARITY)

    def run(blocked_flag):
        monkeypatch.setenv("PSIM_PARITY_BLOCKED", blocked_flag)
        monkeypatch.setenv("PSIM_PARITY_BLOCK", "128")
        eng = Engine(cfg)
        out = eng.run(eng.init_state(), 10)
        return np.asarray(out.x), np.asarray(out.y), int(out.collisions)

    xb, yb, cb = run("1")
    xg, yg, cg = run("0")
    np.testing.assert_array_equal(xb, xg)
    np.testing.assert_array_equal(yb, yg)
    assert cb == cg == 2  # golden vector v2's expected collision count


def test_rank_overflow_guard(monkeypatch):
    """kmax ≥ RANK_LIMIT must raise, not silently corrupt the set rule.

    The real limit (65535 occupants in one cell) is too expensive to
    simulate, so the limit is lowered: the full detection → telemetry →
    engine-raise path is what's under test, not the constant.
    """
    from particlesimulation_tpu import engine as eng_mod

    monkeypatch.setattr(collisions, "RANK_LIMIT", 8)
    cfg = SimConfig(seed=1, side=1.0, ncside=1, n_particles=32,
                    precision=Precision.PARITY)
    eng = eng_mod.Engine(cfg)
    with pytest.raises(RuntimeError, match="rank overflow"):
        eng.run(eng.init_state(), 1)

    # Flag itself: zero below the limit, one at/above it.
    assert int(collisions.rank_overflow(jnp.int32(7))) == 0
    assert int(collisions.rank_overflow(jnp.int32(8))) == 1
