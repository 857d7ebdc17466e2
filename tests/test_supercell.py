"""Super-cell engine (sparse-grid regime) vs the sweep engine.

One tile row covers S×S cells (ops/supercell.py); the physics contract is
unchanged — strictly same-cell pairs, per-cell monopole stencil with
periodic mirrors, reference collision set rule. The sweep engine (same f32
precision, cell-sorted formulation) is the comparison oracle: collision
counts and the dead set must match exactly, positions to full printed
precision, across even and uneven S partitions and under capacity retries.
"""

import numpy as np
import pytest

from particlesimulation_tpu.config import Precision, SimConfig
from particlesimulation_tpu.engine import Engine
from particlesimulation_tpu.ops.supercell import choose_supercell_factor


def _compare(base, steps, sc_kwargs=None, pos_tol=1e-3):
    sw = Engine(SimConfig(**base), impl="sweep")
    ss = sw.run(sw.init_state(), steps)
    sc = Engine(SimConfig(**base), impl="supercell", **(sc_kwargs or {}))
    st = sc.run(sc.init_state(), steps)
    o1 = np.argsort(np.asarray(ss.pid))
    o2 = np.argsort(np.asarray(st.pid))
    assert int(st.collisions) == int(ss.collisions)
    np.testing.assert_array_equal(np.asarray(st.alive)[o2],
                                  np.asarray(ss.alive)[o1])
    dx = np.abs(np.asarray(st.x)[o2] - np.asarray(ss.x)[o1]).max()
    dy = np.abs(np.asarray(st.y)[o2] - np.asarray(ss.y)[o1]).max()
    assert dx < pos_tol and dy < pos_tol
    assert int(np.asarray(st.overflow)) == 0
    return sc, st


def test_supercell_sparse_uniform():
    # 0.52 particles/cell; S=3 divides 24 evenly.
    _compare(dict(seed=1, side=3.0, ncside=24, n_particles=300,
                  precision=Precision.FAST), steps=20)


def test_supercell_uneven_partition():
    # ncside=25 with S=3 -> nsc=9 covers 27 cells: edge super-cells are
    # partial; periodic wrap must stay exact at cell granularity.
    _compare(dict(seed=7, side=5.0, ncside=25, n_particles=400,
                  precision=Precision.FAST), steps=20)


def test_supercell_collisions_tiny_box():
    # Dense enough for collisions (reference N1-style seed) but forced
    # through the supercell path with an explicit small grid coarsening.
    base = dict(seed=5893, side=0.5, ncside=16, n_particles=200,
                precision=Precision.FAST)
    sw = Engine(SimConfig(**base), impl="sweep")
    ss = sw.run(sw.init_state(), 15)
    sc = Engine(SimConfig(**base), impl="supercell")
    st = sc.run(sc.init_state(), 15)
    assert int(ss.collisions) > 0  # the config actually collides
    assert int(st.collisions) == int(ss.collisions)
    o1 = np.argsort(np.asarray(ss.pid))
    o2 = np.argsort(np.asarray(st.pid))
    np.testing.assert_array_equal(np.asarray(st.alive)[o2],
                                  np.asarray(ss.alive)[o1])


def test_supercell_normal_mode_clustering():
    # Negative seed: Box-Muller clustering concentrates particles around
    # the domain center — stresses uneven tile occupancy.
    _compare(dict(seed=-10, side=4.0, ncside=20, n_particles=350,
                  precision=Precision.FAST), steps=15)


def test_supercell_capacity_retry_lossless():
    base = dict(seed=-10, side=4.0, ncside=20, n_particles=350,
                precision=Precision.FAST)
    sw = Engine(SimConfig(**base), impl="sweep")
    ss = sw.run(sw.init_state(), 10)
    sc = Engine(SimConfig(**base), impl="supercell", kcap=32)
    st = sc.run(sc.init_state(), 10)
    assert int(st.collisions) == int(ss.collisions)
    o1 = np.argsort(np.asarray(ss.pid))
    o2 = np.argsort(np.asarray(st.pid))
    np.testing.assert_array_equal(np.asarray(st.alive)[o2],
                                  np.asarray(ss.alive)[o1])
    assert (np.unique(np.asarray(st.pid)) == np.arange(350)).all()


def test_supercell_migration_across_supercell_wrap():
    # Fast movers crossing super-cell boundaries incl. the periodic edge.
    base = dict(seed=3, side=8.0, ncside=16, n_particles=200,
                precision=Precision.FAST)
    sc, st = _compare(base, steps=30)
    assert (np.unique(np.asarray(st.pid)) == np.arange(200)).all()


def test_supercell_run_composition():
    # run(8)+run(7) ~ run(15): the epilogue/prologue round-trip loses no
    # particles and preserves the physics. (Not bit-exact: the prologue
    # canonicalizes slot order to (super-cell, pid) while an uninterrupted
    # run keeps rebin-history order, so f32 reduction order differs.)
    base = dict(seed=1, side=3.0, ncside=24, n_particles=300,
                precision=Precision.FAST)
    e1 = Engine(SimConfig(**base), impl="supercell")
    s1 = e1.run(e1.run(e1.init_state(), 8), 7)
    e2 = Engine(SimConfig(**base), impl="supercell")
    s2 = e2.run(e2.init_state(), 15)
    np.testing.assert_array_equal(np.asarray(s1.pid), np.asarray(s2.pid))
    np.testing.assert_array_equal(np.asarray(s1.alive),
                                  np.asarray(s2.alive))
    for f in ("x", "y"):
        np.testing.assert_allclose(np.asarray(getattr(s1, f)),
                                   np.asarray(getattr(s2, f)),
                                   atol=1e-4, err_msg=f)
    assert int(s1.collisions) == int(s2.collisions)


def test_supercell_halo_matches_general_path(monkeypatch):
    # S=3 divides 24: the halo-table monopole path is active by default;
    # PSIM_SC_HALO=0 forces the general pack/unpack path. Same physics,
    # same results.
    base = dict(seed=1, side=3.0, ncside=24, n_particles=300,
                precision=Precision.FAST)
    e1 = Engine(SimConfig(**base), impl="supercell")
    s1 = e1.run(e1.init_state(), 15)
    monkeypatch.setenv("PSIM_SC_HALO", "0")
    e2 = Engine(SimConfig(**base), impl="supercell")
    s2 = e2.run(e2.init_state(), 15)
    assert int(s1.collisions) == int(s2.collisions)
    np.testing.assert_array_equal(np.asarray(s1.alive), np.asarray(s2.alive))
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.y), np.asarray(s2.y),
                               atol=1e-5)


def test_choose_supercell_factor():
    # Sparse big grid: coarsens; dense grid: declines; tiny grid: declines.
    sparse = SimConfig(seed=1, side=100.0, ncside=1300, n_particles=500000)
    s = choose_supercell_factor(sparse)
    assert s is not None and s >= 2
    dense = SimConfig(seed=1, side=100.0, ncside=10, n_particles=10000)
    assert choose_supercell_factor(dense) is None
    tiny = SimConfig(seed=1, side=1.0, ncside=8, n_particles=10)
    assert choose_supercell_factor(tiny) is None


def test_supercell_autoselected_in_sparse_regime():
    import particlesimulation_tpu.engine as em
    if not em._use_dense_default():
        pytest.skip("tile impls off by default on this backend")
    cfg = SimConfig(seed=1, side=100.0, ncside=64, n_particles=500,
                    precision=Precision.FAST)
    eng = Engine(cfg)
    assert eng.impl == "supercell"
