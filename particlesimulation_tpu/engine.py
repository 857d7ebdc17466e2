"""Single-chip simulation engines.

The reference's step driver (``simulate``, reference serial/parsim.cpp:422-448)
sequences updateCOM → updateForces → updatePositionAndVelocity →
checkCollisions per timestep. Here the whole step is one pure function over
the sorted-particle representation, jitted once, and the timestep loop is a
``lax.fori_loop`` with a *dynamic* step count — one compilation serves every
run length, and no host round-trips occur inside a run.

The post-move sort of step t doubles as the binning of step t+1 (positions
don't change between the collision pass and the next COM pass), so each step
performs exactly one lexicographic sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from particlesimulation_tpu.config import DELTAT, EPSILON, Precision, SimConfig
from particlesimulation_tpu.initializer import init_particles_host
from particlesimulation_tpu.ops import binning, collisions, com, forces, integrate, stencil
from particlesimulation_tpu.state import SimState


def make_step(config: SimConfig):
    """Build the jittable ``step: SimState -> SimState``."""
    side = config.side
    nc = config.ncside
    ncells = config.ncells
    parity = config.precision is Precision.PARITY

    def step(state: SimState) -> SimState:
        x, y, vx, vy, m, alive, pid = (state.x, state.y, state.vx, state.vy,
                                       state.m, state.alive, state.pid)
        # Phase 1 — binning + COM (arrays arrive sorted by this key).
        key, valid = binning.cell_keys(x, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        if parity:
            M, MX, MY = com.com_parity(key, x, y, m, ncells)
        else:
            M, MX, MY = com.com_fast(key, x, y, m, ncells)

        # Phase 2 — forces (pairwise sweep, then 8 stencil monopole terms).
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        if parity:
            fx, fy = forces.pairwise_forces_parity(x, y, m, alive, key, kmax,
                                                   ncells)
        else:
            fx, fy = forces.pairwise_forces_fast(x, y, m, alive, key, kmax,
                                                 ncells)
        fx, fy = forces.monopole_forces(x, y, m, alive, key, fx, fy,
                                        ml, mxl, myl, ncells, parity)

        # Phase 3 — integrate + periodic wrap.
        x, y, vx, vy = integrate.integrate(x, y, vx, vy, m, fx, fy, side,
                                           DELTAT)

        # Phase 4 — post-move rebin (the one sort per step) + collisions.
        key2, valid2 = binning.cell_keys(x, y, side, nc)
        key2, pid, x, y, vx, vy, m, alive = binning.sort_by_cell(
            key2, pid, x, y, vx, vy, m, alive)
        pos2, _ = binning.segment_positions(key2)
        kmax2 = binning.max_occupancy(pos2, key2 < ncells)
        count, died = collisions.detect_collisions(
            x, y, alive, key2, pos2, kmax2, EPSILON, ncells)
        m, alive = collisions.apply_deaths(m, alive, died)

        return SimState(
            x=x, y=y, vx=vx, vy=vy, m=m, alive=alive, pid=pid,
            collisions=state.collisions + count.astype(state.collisions.dtype),
            panics=state.panics + jnp.sum(~valid, dtype=jnp.int32),
        )

    return step


class Engine:
    """Single-chip engine: init, jitted run loop, result extraction."""

    def __init__(self, config: SimConfig):
        self.config = config
        if config.precision is Precision.PARITY:
            if not jax.config.jax_enable_x64:
                raise RuntimeError(
                    "parity precision requires jax_enable_x64 "
                    "(see utils.runtime.ensure_parity_runtime)")
            self.dtype = jnp.float64
        else:
            self.dtype = jnp.float32
        self._step = make_step(config)
        self._run = jax.jit(
            lambda s, nsteps: jax.lax.fori_loop(
                0, nsteps, lambda i, st: self._step(st), s))

    def init_state(self) -> SimState:
        """Host-side initial conditions, cast and pre-sorted by cell key."""
        cfg = self.config
        xs, ys, vxs, vys, ms = init_particles_host(cfg)
        n = cfg.n_particles
        ctype = (jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
        state = SimState(
            x=jnp.asarray(xs, self.dtype),
            y=jnp.asarray(ys, self.dtype),
            vx=jnp.asarray(vxs, self.dtype),
            vy=jnp.asarray(vys, self.dtype),
            m=jnp.asarray(ms, self.dtype),
            alive=jnp.ones(n, dtype=bool),
            pid=jnp.arange(n, dtype=jnp.int32),
            collisions=jnp.zeros((), dtype=ctype),
            panics=jnp.zeros((), dtype=jnp.int32),
        )
        key, _ = binning.cell_keys(state.x, state.y, cfg.side, cfg.ncside)
        key, pid, x, y, vx, vy, m, alive = binning.sort_by_cell(
            key, state.pid, state.x, state.y, state.vx, state.vy,
            state.m, state.alive)
        return state._replace(x=x, y=y, vx=vx, vy=vy, m=m, alive=alive,
                              pid=pid)

    def run(self, state: SimState, n_steps: int) -> SimState:
        out = self._run(state, jnp.int32(n_steps))
        return jax.block_until_ready(out)

    def result(self, state: SimState) -> tuple[float, float, int]:
        from particlesimulation_tpu.state import result_of
        return result_of(state)

    def run_debug(self, state: SimState, n_steps: int):
        """Unjitted per-step execution for step-diff debugging."""
        for _ in range(n_steps):
            state = self._step(state)
        return jax.block_until_ready(state)
