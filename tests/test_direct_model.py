"""Direct all-pairs model: sanity + PIC cross-validation."""

import numpy as np

from particlesimulation_tpu.models.direct_nbody import DirectSimulation
from particlesimulation_tpu.models.gravity_pic import Simulation


def test_direct_runs_and_conserves():
    sim = DirectSimulation(seed=1, side=100.0, n_particles=256)
    m0 = float(np.asarray(sim.state.m).sum())
    st = sim.run(20)
    assert float(np.asarray(st.m).sum()) <= m0 + 1e-3
    assert np.isfinite(np.asarray(st.x)).all()


def test_direct_vs_pic_shared_ics_short_horizon():
    # Same seed/side => identical initial conditions (ncside=1 convention);
    # over a few steps the PIC force is dominated by the same-cell exact
    # pairs, so trajectories agree loosely.
    n, side = 128, 1.0
    d = DirectSimulation(seed=2, side=side, n_particles=n)
    p = Simulation(seed=2, side=side, ncside=1, n_particles=n,
                   precision="fast")
    ds = d.run(3)
    out = p.run(3)
    g = out.gather()
    dx = np.abs(np.asarray(ds.x) - g["x"]).max()
    assert dx < side * 0.05
