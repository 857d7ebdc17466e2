"""Full-step bit-parity of the f64 engine against the Python oracle.

The Python oracle (tests/oracle_np.py) restates the reference's particle-level
semantics with IEEE-double Python arithmetic; the parity engine must match it
bit for bit, step by step, including collision merges and dead-particle
bookkeeping. This localizes any divergence to a single step instead of a
whole golden run.
"""

import numpy as np
import pytest

from particlesimulation_tpu.config import Precision, SimConfig
from particlesimulation_tpu.engine import Engine
from particlesimulation_tpu.initializer import init_particles_host
from tests.oracle_np import NpOracle


def _unsorted_view(state):
    """Return state arrays in original-pid order."""
    pid = np.asarray(state.pid)
    order = np.argsort(pid)
    return {
        "x": np.asarray(state.x)[order],
        "y": np.asarray(state.y)[order],
        "vx": np.asarray(state.vx)[order],
        "vy": np.asarray(state.vy)[order],
        "m": np.asarray(state.m)[order],
        "alive": np.asarray(state.alive)[order],
    }


@pytest.mark.parametrize(
    "seed,side,nc,n,steps",
    [
        (1, 2.0, 3, 10, 5),
        (1, 1.0, 5, 100, 10),
        (-10, 3.0, 3, 100, 10),
        (5893, 0.05, 3, 10, 10),   # tiny domain → collisions
        (8555, 0.05, 3, 30, 20),   # more collisions, multi-death cells
        (7, 0.08, 2, 40, 15),      # ncside=2: stencil aliasing
        (9, 0.05, 1, 12, 15),      # ncside=1: full aliasing, single cell
    ],
)
def test_step_bitexact_vs_oracle(seed, side, nc, n, steps):
    cfg = SimConfig(seed=seed, side=side, ncside=nc, n_particles=n,
                    precision=Precision.PARITY)
    eng = Engine(cfg)
    state = eng.init_state()

    x, y, vx, vy, m = init_particles_host(cfg)
    oracle = NpOracle(side, nc, x, y, vx, vy, m)

    for t in range(steps):
        state = eng.run_debug(state, 1)
        oracle.step()
        got = _unsorted_view(state)
        np.testing.assert_array_equal(got["x"], oracle.x, err_msg=f"x step {t}")
        np.testing.assert_array_equal(got["y"], oracle.y, err_msg=f"y step {t}")
        np.testing.assert_array_equal(got["vx"], oracle.vx, err_msg=f"vx step {t}")
        np.testing.assert_array_equal(got["vy"], oracle.vy, err_msg=f"vy step {t}")
        np.testing.assert_array_equal(got["m"], oracle.m, err_msg=f"m step {t}")
        np.testing.assert_array_equal(got["alive"], oracle.alive,
                                      err_msg=f"alive step {t}")
        assert int(state.collisions) == oracle.collisions, f"collisions step {t}"


def test_jit_run_matches_stepwise():
    cfg = SimConfig(seed=5893, side=0.05, ncside=3, n_particles=10,
                    precision=Precision.PARITY)
    eng = Engine(cfg)
    a = eng.run(eng.init_state(), 10)
    b = eng.run_debug(eng.init_state(), 10)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    assert int(a.collisions) == int(b.collisions)
