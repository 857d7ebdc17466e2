"""Compact collision resolution (PSIM_COLLIDE=compact) vs the blocked path.

The flags-mode fused pair pass + compact_collision_count must reproduce
the blocked rank machinery exactly: same deaths (trivially — deaths are
the endpoint flags), same counts (the first-pair rank rule restated over
raw pids, which are order-isomorphic to the per-cell pid ranks), and
bit-identical forces (post-death masses are applied identically before
the force sweep). Reference semantics: serial/parsim.cpp:388-420.
"""

import os

import numpy as np
import pytest

from particlesimulation_tpu.config import EPSILON, Precision, SimConfig
from particlesimulation_tpu.ops import dense_xla as dx

import jax.numpy as jnp

INF = np.int32(0x7FFFFFFF)


def _rand_tiles(seed, ncells=24, kcap=16, box=0.06, dead_frac=0.1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box, (ncells, kcap)).astype(np.float32)
    y = rng.uniform(0, box, (ncells, kcap)).astype(np.float32)
    m = rng.uniform(0.5, 2.0, (ncells, kcap)).astype(np.float32)
    alive = (rng.random((ncells, kcap)) > dead_frac).astype(np.int32)
    m = np.where(alive > 0, m, 0.0).astype(np.float32)
    pd = rng.permutation(ncells * kcap).astype(np.int32).reshape(
        ncells, kcap)
    return x, y, m, alive, pd


def _cellf(ncells, kcap):
    return jnp.broadcast_to(
        jnp.arange(ncells, dtype=jnp.int32)[:, None], (ncells, kcap))


@pytest.mark.parametrize("fn_name", ["fused_pairs_v2", "fused_pairs_v4"])
@pytest.mark.parametrize("use_pid", [True, False])
def test_compact_matches_blocked_collision_dense(fn_name, use_pid):
    """Collision-dense random tiles: counts, deaths, forces all equal."""
    fn = getattr(dx, fn_name)
    for seed in (7, 11, 23):
        x, y, m, alive, pd = _rand_tiles(seed)
        ncells, kcap = x.shape
        args = tuple(jnp.asarray(a) for a in (x, y, m, alive))
        if use_pid:
            pid = jnp.asarray(pd)
            pidf = pid.reshape(-1)
        else:
            pid = None
            # pid=None ranks by slot order; the flat index is the
            # order-isomorphic surrogate (cell-major, slot-minor).
            pidf = jnp.arange(ncells * kcap, dtype=jnp.int32)
        fx1, fy1, cnt1, ft1 = fn(*args, ncells, kcap, EPSILON, cb=8,
                                 pid=pid, ichunk=4)
        died1 = np.asarray(ft1) != INF
        fx2, fy2, cnt0, flags = fn(*args, ncells, kcap, EPSILON, cb=8,
                                   pid=pid, ichunk=4, collide="flags")
        assert int(cnt0) == 0
        cnt2, hovf = dx.compact_collision_count(
            args[0].reshape(-1), args[1].reshape(-1),
            _cellf(ncells, kcap).reshape(-1), pidf,
            flags.reshape(-1), EPSILON, 512)
        assert int(hovf) == 0
        assert int(cnt1) == int(cnt2) > 0, (fn_name, seed)
        np.testing.assert_array_equal(died1, np.asarray(flags))
        np.testing.assert_array_equal(np.asarray(fx1), np.asarray(fx2))
        np.testing.assert_array_equal(np.asarray(fy1), np.asarray(fy2))


def test_compact_chain_counts_once():
    """A-B-C chain in one cell: the set rule counts 1 (serial:404-405)."""
    ncells, kcap = 4, 8
    x = np.full((ncells, kcap), 5.0, np.float32)
    y = np.arange(kcap, dtype=np.float32)[None, :].repeat(ncells, 0) * 1.0
    # chain in cell 2: slots 0-1-2 spaced 0.8*EPSILON apart (0<->2 is not
    # a pair), far from everything else
    y[2, 0], y[2, 1], y[2, 2] = 0.0, 0.8 * EPSILON, 1.6 * EPSILON
    y[2, 3:] += 10.0
    m = np.ones((ncells, kcap), np.float32)
    alive = np.ones((ncells, kcap), np.int32)
    args = tuple(jnp.asarray(a) for a in (x, y, m, alive))
    fx1, fy1, cnt1, ft1 = dx.fused_pairs_v2(*args, ncells, kcap, EPSILON,
                                            cb=4, pid=None, ichunk=4)
    _, _, _, flags = dx.fused_pairs_v2(*args, ncells, kcap, EPSILON,
                                       cb=4, pid=None, ichunk=4,
                                       collide="flags")
    cnt2, hovf = dx.compact_collision_count(
        args[0].reshape(-1), args[1].reshape(-1),
        _cellf(ncells, kcap).reshape(-1),
        jnp.arange(ncells * kcap, dtype=jnp.int32),
        flags.reshape(-1), EPSILON, 64)
    assert int(cnt1) == int(cnt2) == 1
    # all three chain members die (set members all die, serial:414-418)
    assert np.asarray(flags)[2, :3].all()
    assert int(np.asarray(flags).sum()) == 3


def test_compact_hcap_overflow_flags():
    """More flagged slots than hcap -> hovf reports the needed size."""
    ncells, kcap = 2, 8
    x = np.zeros((ncells, kcap), np.float32)      # all coincident... d2=0
    # d2 == 0 pairs are hits (< eps2); reference skips dist==0 only in
    # the force kernel, not the collision pass
    y = np.zeros((ncells, kcap), np.float32)
    m = np.ones((ncells, kcap), np.float32)
    alive = np.ones((ncells, kcap), np.int32)
    args = tuple(jnp.asarray(a) for a in (x, y, m, alive))
    _, _, _, flags = dx.fused_pairs_v2(*args, ncells, kcap, EPSILON,
                                       cb=2, pid=None, ichunk=4,
                                       collide="flags")
    assert int(np.asarray(flags).sum()) == 16
    cnt, hovf = dx.compact_collision_count(
        args[0].reshape(-1), args[1].reshape(-1),
        _cellf(ncells, kcap).reshape(-1),
        jnp.arange(ncells * kcap, dtype=jnp.int32),
        flags.reshape(-1), EPSILON, 8)
    assert int(hovf) == 16
    cnt, hovf = dx.compact_collision_count(
        args[0].reshape(-1), args[1].reshape(-1),
        _cellf(ncells, kcap).reshape(-1),
        jnp.arange(ncells * kcap, dtype=jnp.int32),
        flags.reshape(-1), EPSILON, 16)
    assert int(hovf) == 0 and int(cnt) == 2  # one set per cell


@pytest.mark.parametrize("impl", ["resident", "banded"])
def test_engine_compact_equals_block(impl, monkeypatch):
    """Full fast runs agree bit-for-bit between collision modes, and the
    hcap retry ladder is lossless (hcap=4 forces HIT_OVF replays)."""
    from particlesimulation_tpu.engine import Engine
    monkeypatch.setenv("PSIM_DENSE", "1")
    cfg = SimConfig(seed=-10, side=3.0, ncside=3, n_particles=100,
                    precision=Precision.FAST)

    def run_with(mode, hcap=None):
        monkeypatch.setenv("PSIM_COLLIDE", mode)
        if hcap is not None:
            monkeypatch.setenv("PSIM_HCAP", str(hcap))
        else:
            monkeypatch.delenv("PSIM_HCAP", raising=False)
        eng = Engine(cfg, impl=impl)
        out = eng.run(eng.init_state(), 10)
        return out

    b = run_with("block")
    c = run_with("compact")
    r = run_with("compact", hcap=4)
    assert int(np.asarray(b.collisions)) == int(np.asarray(c.collisions))
    assert int(np.asarray(b.collisions)) == int(np.asarray(r.collisions))
    assert int(np.asarray(b.collisions)) > 0
    for f in ("x", "y", "vx", "vy", "m"):
        bv = np.asarray(getattr(b, f))
        np.testing.assert_array_equal(bv, np.asarray(getattr(c, f)), err_msg=f)
        np.testing.assert_array_equal(bv, np.asarray(getattr(r, f)), err_msg=f)
    assert int(np.asarray(c.overflow)) == 0
    assert int(np.asarray(r.overflow)) == 0  # retried run ends clean
