"""Sharded engine: bitwise equality with the single-chip engine.

The decomposition changes communication, not math: every cell lives wholly on
one shard and per-cell op order is pid-ascending on both engines, so the f64
sharded run must equal the single-chip f64 run bit for bit — a strictly
stronger invariant than the reference's 1e-3 cross-variant agreement
(reference mpi/run_tests.sh:41-53).
"""

import jax
import numpy as np
import pytest

from particlesimulation_tpu.config import Precision, SimConfig
from particlesimulation_tpu.engine import Engine
from particlesimulation_tpu.parallel.sharded import ShardedEngine

NDEV = len(jax.devices())

needs_mesh = pytest.mark.skipif(NDEV < 8, reason="needs 8 virtual devices")


def _single_view(eng, state):
    pid = np.asarray(state.pid)
    order = np.argsort(pid)
    return {
        "pid": pid[order],
        "x": np.asarray(state.x)[order],
        "y": np.asarray(state.y)[order],
        "vx": np.asarray(state.vx)[order],
        "vy": np.asarray(state.vy)[order],
        "m": np.asarray(state.m)[order],
        "alive": np.asarray(state.alive)[order],
    }


@needs_mesh
@pytest.mark.parametrize(
    "seed,side,nc,n,steps,shards",
    [
        (1, 2.0, 8, 200, 10, 8),
        (1, 1.0, 8, 500, 15, 4),
        (-10, 3.0, 16, 300, 10, 8),
        (5893, 0.05, 8, 64, 12, 8),  # collisions + migration in a tiny box
        (17, 0.12, 4, 120, 20, 2),
    ],
)
def test_sharded_bitwise_equals_single(seed, side, nc, n, steps, shards):
    base = dict(seed=seed, side=side, ncside=nc, n_particles=n,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    ss = se.run(se.init_state(), steps)
    single = _single_view(se, ss)

    # Full-size slabs: capacity pressure is exercised separately; here the
    # subject is bitwise parity (normal-mode seeds cluster heavily).
    me = ShardedEngine(SimConfig(**base, n_shards=shards, shard_capacity=n,
                                 migration_capacity=n))
    ms = me.run(me.init_state(), steps)
    multi = me.gather(ms)

    np.testing.assert_array_equal(multi["pid"], single["pid"])
    for f in ("x", "y", "vx", "vy", "m", "alive"):
        np.testing.assert_array_equal(multi[f], single[f], err_msg=f)
    assert int(ms.collisions) == int(ss.collisions)
    assert int(ms.overflow) == 0


@needs_mesh
@pytest.mark.parametrize(
    "seed,side,nc,n,steps,shards",
    [
        (1, 2.0, 9, 200, 10, 4),     # 9 rows on 4 shards: 3+2+2+2
        (-10, 3.0, 13, 300, 10, 8),  # 13 rows on 8 shards: 5 shards of 2
        (17, 0.12, 5, 120, 20, 3),   # collisions + migration, 2+2+1
        (5893, 0.05, 8, 64, 12, 7),  # n_shards not a power of two
    ],
)
def test_uneven_decomposition_bitwise_equals_single(seed, side, nc, n,
                                                    steps, shards):
    """ncside % n_shards != 0 (the reference's own SMALL workload shape,
    ncside=1300 on 12 procs, mpi/parsim-mpi.cpp:338-342)."""
    base = dict(seed=seed, side=side, ncside=nc, n_particles=n,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    ss = se.run(se.init_state(), steps)
    single = _single_view(se, ss)

    me = ShardedEngine(SimConfig(**base, n_shards=shards, shard_capacity=n,
                                 migration_capacity=n))
    ms = me.run(me.init_state(), steps)
    multi = me.gather(ms)

    np.testing.assert_array_equal(multi["pid"], single["pid"])
    for f in ("x", "y", "vx", "vy", "m", "alive"):
        np.testing.assert_array_equal(multi[f], single[f], err_msg=f)
    assert int(ms.collisions) == int(ss.collisions)
    assert int(ms.overflow) == 0


@needs_mesh
def test_sharded_migration_wraps_ring():
    # Fast-moving particles crossing shard boundaries both ways, incl. the
    # periodic wraparound row (shard 0 <-> shard D-1).
    cfg = SimConfig(seed=3, side=8.0, ncside=8, n_particles=400,
                    precision=Precision.PARITY, n_shards=8)
    eng = ShardedEngine(cfg)
    st = eng.run(eng.init_state(), 30)
    g = eng.gather(st)
    assert len(g["pid"]) == 400  # no particle lost or duplicated
    assert (np.unique(g["pid"]) == np.arange(400)).all()
    assert int(st.overflow) == 0


@needs_mesh
def test_sharded_fast_precision_runs():
    cfg = SimConfig(seed=1, side=100.0, ncside=8, n_particles=1000,
                    precision=Precision.FAST, n_shards=8)
    eng = ShardedEngine(cfg)
    st = eng.run(eng.init_state(), 5)
    x, y, c = eng.result(st)
    assert np.isfinite(x) and np.isfinite(y)
