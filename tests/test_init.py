"""Initial-condition parity: native vs NumPy fallback, draw order, scaling."""

import numpy as np

from particlesimulation_tpu import native, rng
from particlesimulation_tpu.config import EPSILON2, G, SimConfig
from particlesimulation_tpu.initializer import init_particles_host


def test_native_matches_numpy_expressions():
    n, side, nc = 257, 2.5, 7
    res = native.init_particles(5, side, nc, n)
    assert res is not None
    d = rng.uniform_stream_np(5, 5 * n).reshape(n, 5)
    np.testing.assert_array_equal(res[0], d[:, 0] * side)
    np.testing.assert_array_equal(res[1], d[:, 1] * side)
    np.testing.assert_array_equal(res[2], (d[:, 2] - 0.5) * side / nc / 5.0)
    np.testing.assert_array_equal(res[3], (d[:, 3] - 0.5) * side / nc / 5.0)
    np.testing.assert_array_equal(
        res[4], d[:, 4] * 0.01 * (nc * nc) / float(n) / G * EPSILON2)


def test_normal_mode_sequential_consumption():
    # Normal mode consumes a data-dependent number of uniforms per draw;
    # the native path and the NumPy loop must agree exactly.
    cfg = SimConfig(seed=-10, side=3.0, ncside=3, n_particles=100)
    nat = native.init_particles(cfg.seed, cfg.side, cfg.ncside, cfg.n_particles)
    d = rng.normal_stream_np(cfg.seed, 5 * cfg.n_particles).reshape(-1, 5)
    np.testing.assert_array_equal(nat[0], d[:, 0] * cfg.side)
    np.testing.assert_array_equal(nat[1], d[:, 1] * cfg.side)


def test_host_init_shapes_and_bounds():
    cfg = SimConfig(seed=2, side=10.0, ncside=4, n_particles=1000)
    x, y, vx, vy, m = init_particles_host(cfg)
    for a in (x, y, vx, vy, m):
        assert a.shape == (1000,) and a.dtype == np.float64
    assert (x >= 0).all() and (x < 10.0).all()
    assert (m > 0).all()
    vcap = 10.0 / 4 / 10.0
    assert (np.abs(vx) <= vcap).all() and (np.abs(vy) <= vcap).all()
