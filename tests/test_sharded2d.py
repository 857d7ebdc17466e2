"""2D-sharded engine: bitwise equality with the single-chip engine.

The rectangular decomposition (parallel/sharded2d.py) generalizes the
reference's 1D row split (mpi/parsim-mpi.cpp:330-465) to a (rows × cols)
device mesh. Every cell still lives wholly on one shard and per-cell op
order is pid-ascending, so the f64 2D-sharded run must equal the
single-chip f64 run bit for bit — across mesh aspects, uneven per-axis
decompositions, and dimension-ordered (row-then-col) migration.
"""

import numpy as np
import pytest

import jax

from particlesimulation_tpu.config import Precision, SimConfig
from particlesimulation_tpu.engine import Engine
from particlesimulation_tpu.parallel.sharded2d import (AxisDecomp,
                                                       Sharded2DEngine)

NDEV = len(jax.devices())

needs_mesh = pytest.mark.skipif(NDEV < 8, reason="needs 8 virtual devices")


def _single_view(state):
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


def test_axis_decomp_partitions():
    for size in (3, 8, 9, 13, 100):
        for nb in range(1, min(size, 9)):
            d = AxisDecomp(size, nb)
            firsts = [d.first_of(s) for s in range(nb)]
            counts = [d.count_of(s) for s in range(nb)]
            # Contiguous, complete, balanced within one line.
            assert firsts[0] == 0
            assert all(firsts[i] + counts[i] == (firsts + [size])[i + 1]
                       for i in range(nb))
            assert max(counts) - min(counts) <= 1
            assert max(counts) == d.max_blocks
            lines = np.arange(size)
            owners = d.owner_of(lines)
            for s in range(nb):
                got = lines[owners == s]
                assert got[0] == firsts[s] and len(got) == counts[s]
    with pytest.raises(ValueError):
        AxisDecomp(3, 4)


@needs_mesh
@pytest.mark.parametrize(
    "seed,side,nc,n,steps,shape",
    [
        (1, 2.0, 8, 200, 10, (2, 4)),
        (1, 1.0, 8, 500, 15, (4, 2)),
        (-10, 3.0, 16, 300, 10, (2, 2)),   # clustered normal-mode blob
        (5893, 0.05, 8, 64, 12, (2, 4)),   # collisions + migration, tiny box
        (17, 0.12, 4, 120, 20, (2, 2)),    # heavy migration every step
        (1, 2.0, 8, 200, 10, (1, 8)),      # column-only degenerate
    ],
)
def test_sharded2d_bitwise_equals_single(seed, side, nc, n, steps, shape):
    base = dict(seed=seed, side=side, ncside=nc, n_particles=n,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    ss = se.run(se.init_state(), steps)
    single = _single_view(ss)

    nsh = shape[0] * shape[1]
    me = Sharded2DEngine(
        SimConfig(**base, n_shards=nsh, mesh_shape=shape,
                  shard_capacity=n, migration_capacity=n), shape)
    ms = me.run(me.init_state(), steps)
    multi = me.gather(ms)

    np.testing.assert_array_equal(multi["pid"], single["pid"])
    for f in ("x", "y", "vx", "vy", "m", "alive"):
        np.testing.assert_array_equal(multi[f], single[f], err_msg=f)
    assert int(ms.collisions) == int(ss.collisions)
    assert int(np.asarray(ms.overflow)) == 0


@needs_mesh
@pytest.mark.parametrize(
    "seed,side,nc,n,steps,shape",
    [
        (1, 2.0, 9, 200, 10, (2, 4)),      # 9 cols on 4 blocks: 3+2+2+2
        (-10, 3.0, 13, 300, 10, (4, 2)),   # 13 rows on 4: 4+3+3+3
        (17, 0.12, 5, 120, 20, (2, 3)),    # both axes uneven, 6 devices
        (5893, 0.05, 7, 64, 12, (3, 2)),   # prime ncside
    ],
)
def test_sharded2d_uneven_bitwise_equals_single(seed, side, nc, n, steps,
                                                shape):
    base = dict(seed=seed, side=side, ncside=nc, n_particles=n,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    ss = se.run(se.init_state(), steps)
    single = _single_view(ss)

    nsh = shape[0] * shape[1]
    me = Sharded2DEngine(
        SimConfig(**base, n_shards=nsh, mesh_shape=shape,
                  shard_capacity=n, migration_capacity=n), shape)
    ms = me.run(me.init_state(), steps)
    multi = me.gather(ms)

    np.testing.assert_array_equal(multi["pid"], single["pid"])
    for f in ("x", "y", "vx", "vy", "m", "alive"):
        np.testing.assert_array_equal(multi[f], single[f], err_msg=f)
    assert int(ms.collisions) == int(ss.collisions)


@needs_mesh
def test_sharded2d_diagonal_migration():
    """A particle crossing a shard *corner* needs both a rows-axis and a
    cols-axis hop in one step (dimension-ordered routing). Construct one:
    fast mover heading diagonally across the (1,1)/(0,0) block corner.
    """
    nc, shape = 4, (2, 2)
    side = 4.0
    base = dict(seed=1, side=side, ncside=nc, n_particles=8,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    st = se.init_state()
    # Place particle 0 near the center corner (2,2) moving up-left so its
    # next cell is diagonal across both block boundaries.
    x = np.asarray(st.x).copy(); y = np.asarray(st.y).copy()
    vx = np.asarray(st.vx).copy(); vy = np.asarray(st.vy).copy()
    x[0], y[0] = 2.04, 2.04
    vx[0], vy[0] = -1.0, -1.0   # Δ = -0.1 per step: crosses x=2, y=2 at once
    m = np.asarray(st.m); alive = np.asarray(st.alive)
    pid = np.asarray(st.pid)
    # Restore the engine's sorted-slab invariant after the hand edit.
    w = side / nc
    key = (np.clip((y / w).astype(np.int64), 0, nc - 1) * nc
           + np.clip((x / w).astype(np.int64), 0, nc - 1))
    o = np.lexsort((pid, key))
    x, y, vx, vy, m, alive, pid = (a[o] for a in
                                   (x, y, vx, vy, m, alive, pid))
    import jax.numpy as jnp
    st = st._replace(x=jnp.asarray(x), y=jnp.asarray(y),
                     vx=jnp.asarray(vx), vy=jnp.asarray(vy),
                     m=jnp.asarray(m), alive=jnp.asarray(alive),
                     pid=jnp.asarray(pid))
    particles = {
        "x": x, "y": y, "vx": vx, "vy": vy,
        "m": m, "alive": alive, "pid": pid,
    }
    ss = se.run(st, 3)
    single = _single_view(ss)

    me = Sharded2DEngine(
        SimConfig(**base, n_shards=4, mesh_shape=shape,
                  shard_capacity=16, migration_capacity=8), shape)
    ms = me.run(me.pack_particles(particles), 3)
    multi = me.gather(ms)
    np.testing.assert_array_equal(multi["x"], single["x"])
    np.testing.assert_array_equal(multi["y"], single["y"])
    assert int(np.asarray(ms.overflow)) == 0


@needs_mesh
def test_sharded2d_overflow_retry_lossless():
    """An undersized migration buffer must grow and replay, not drop."""
    base = dict(seed=17, side=0.12, ncside=4, n_particles=120,
                precision=Precision.PARITY)
    se = Engine(SimConfig(**base))
    ss = se.run(se.init_state(), 20)
    single = _single_view(ss)

    me = Sharded2DEngine(
        SimConfig(**base, n_shards=4, mesh_shape=(2, 2),
                  shard_capacity=40, migration_capacity=2), (2, 2))
    ms = me.run(me.init_state(), 20)
    multi = me.gather(ms)
    for f in ("x", "y", "m", "alive"):
        np.testing.assert_array_equal(multi[f], single[f], err_msg=f)
    assert int(ms.collisions) == int(ss.collisions)
    assert me.bcap > 2  # the ladder actually grew


@needs_mesh
def test_sharded2d_fast_precision_matches_single_sweep():
    """f32 2D run: same per-cell contents and order as the single-chip f32
    sweep, so collision counts agree and positions match closely."""
    base = dict(seed=5893, side=0.05, ncside=8, n_particles=64,
                precision=Precision.FAST)
    se = Engine(SimConfig(**base), impl="sweep")
    ss = se.run(se.init_state(), 12)

    me = Sharded2DEngine(
        SimConfig(**base, n_shards=4, mesh_shape=(2, 2),
                  shard_capacity=64, migration_capacity=64), (2, 2),
        impl="resident")  # pinned: auto would route this sparse config 1D
    ms = me.run(me.init_state(), 12)
    assert int(ms.collisions) == int(ss.collisions)
    multi = me.gather(ms)
    pid = np.asarray(ss.pid)
    order = np.argsort(pid)
    np.testing.assert_allclose(multi["x"], np.asarray(ss.x)[order],
                               rtol=0, atol=1e-5)


def test_config_mesh_shape_validation():
    base = dict(seed=1, side=1.0, ncside=4, n_particles=10)
    with pytest.raises(ValueError):
        SimConfig(**base, n_shards=8, mesh_shape=(2, 2))  # product mismatch
    with pytest.raises(ValueError):
        SimConfig(**base, n_shards=10, mesh_shape=(5, 2))  # d_r > ncside
    cfg = SimConfig(**base, n_shards=8, mesh_shape=(2, 4))
    assert cfg.mesh_shape == (2, 4)


@needs_mesh
def test_sharded2d_checkpoint_resume_bit_exact(tmp_path):
    """Save mid-run from the 2D engine, restore as-is, continue: the
    resumed trajectory must equal the uninterrupted one bit for bit."""
    from particlesimulation_tpu.utils import checkpointing

    shape = (2, 4)
    cfg = SimConfig(seed=17, side=0.12, ncside=8, n_particles=120,
                    precision=Precision.PARITY, n_shards=8,
                    mesh_shape=shape, shard_capacity=60,
                    migration_capacity=60)
    eng = Sharded2DEngine(cfg, shape)
    s0 = eng.init_state()
    full = eng.run(s0, 20)

    mid = eng.run(s0, 8)
    path = str(tmp_path / "ck2d.npz")
    checkpointing.save_sharded_state(path, mid, n_shards=8,
                                     mesh_shape=shape)
    restored = checkpointing.restore_sharded(path, eng)
    resumed = eng.run(restored, 12)

    for f in ("x", "y", "vx", "vy", "m"):
        np.testing.assert_array_equal(np.asarray(getattr(resumed, f)),
                                      np.asarray(getattr(full, f)),
                                      err_msg=f)
    assert int(resumed.collisions) == int(full.collisions)


@needs_mesh
def test_sharded2d_checkpoint_cross_decomposition(tmp_path):
    """A 1D-engine checkpoint restores into the 2D engine (repack path)
    and continues to the same physics as the uninterrupted 1D run."""
    from particlesimulation_tpu.parallel.sharded import ShardedEngine
    from particlesimulation_tpu.utils import checkpointing

    base = dict(seed=17, side=0.12, ncside=8, n_particles=120,
                precision=Precision.PARITY)
    e1 = ShardedEngine(SimConfig(**base, n_shards=4, shard_capacity=120,
                                 migration_capacity=120))
    s0 = e1.init_state()
    full = e1.gather(e1.run(s0, 20))

    mid = e1.run(s0, 8)
    path = str(tmp_path / "ck1d.npz")
    checkpointing.save_sharded_state(path, mid, n_shards=4,
                                     row_starts=e1.config.row_starts)

    shape = (2, 4)
    e2 = Sharded2DEngine(
        SimConfig(**base, n_shards=8, mesh_shape=shape, shard_capacity=120,
                  migration_capacity=120), shape)
    restored = checkpointing.restore_sharded(path, e2)
    resumed = e2.gather(e2.run(restored, 12))

    np.testing.assert_array_equal(resumed["pid"], full["pid"])
    for f in ("x", "y", "m", "alive"):
        np.testing.assert_array_equal(resumed[f], full[f], err_msg=f)


# ---- round-5 census auto-routing: 2D mesh delegates clustered/sparse ----
# loads to the 1D ring over the same devices (banded-cols / supercell
# are 1D decompositions; a mesh request fixes the device count, the
# engine picks the decomposition — the reference's one-binary mpirun
# harness never needs a flag either, reference mpi/run_tests.sh:8-16).


@needs_mesh
def test_mesh2d_auto_routes_sparse_to_supercell():
    base = dict(seed=1, side=3.0, ncside=24, n_particles=300,
                precision=Precision.FAST)
    se = Engine(SimConfig(**base), impl="supercell")
    ss = se.run(se.init_state(), 8)
    me = Sharded2DEngine(
        SimConfig(**base, n_shards=8, mesh_shape=(2, 4)), (2, 4))
    st = me.init_state()
    assert me._delegate is not None and me.impl == "supercell"
    ms = me.run(st, 8)
    assert int(np.asarray(ms.collisions)) == int(np.asarray(ss.collisions))
    g = me.gather(ms)
    order = np.argsort(np.asarray(ss.pid))
    np.testing.assert_array_equal(g["alive"], np.asarray(ss.alive)[order])
    assert int(np.asarray(ms.overflow)) == 0


@needs_mesh
def test_mesh2d_auto_routes_clustered_to_banded_cols():
    """UNEVEN-at-reduced-N under --mesh 2x4: the census must land on the
    column-sharded banded engine with a real multi-band plan (same gate
    as the 1D test; the blob shape is census-scale so plan_tiers fires
    under the production band penalty)."""
    cfg = SimConfig(seed=-7, side=5000.0, ncside=100, n_particles=200_000,
                    precision=Precision.FAST, n_shards=8,
                    mesh_shape=(2, 4))
    eng = Sharded2DEngine(cfg, (2, 4))
    eng.init_state()
    assert eng._delegate is not None, "census did not delegate"
    assert eng.impl == "banded"
    assert eng._delegate.banded_variant == "cols"
    assert (eng._delegate._band_plan is not None
            and len(eng._delegate._band_plan) >= 2)


@needs_mesh
def test_mesh2d_auto_uniform_stays_2d_resident():
    cfg = SimConfig(seed=3, side=8.0, ncside=8, n_particles=400,
                    precision=Precision.FAST, n_shards=8,
                    mesh_shape=(2, 4))
    eng = Sharded2DEngine(cfg, (2, 4))
    st = eng.init_state()
    assert eng._delegate is None and eng.impl == "resident"
    ms = eng.run(st, 5)
    assert int(np.asarray(ms.overflow)) == 0
