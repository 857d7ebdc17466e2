"""Simulation state pytrees.

The reference's ``Particle``/``Cell`` classes (serial/parsim.cpp:52-107) become
structure-of-arrays pytrees with static shapes. Particles never disappear:
collisions mark them dead (``alive=False, m=0``) exactly as the serial variant
does (serial/parsim.cpp:414-418), so N is static for the whole run.

The engine maintains a *sorted invariant*: particle arrays are kept sorted by
(current cell key, particle id). Cell buckets in the reference are filled in
ascending particle-index order (serial/parsim.cpp:265-289); sorting by
(key, pid) reproduces that in-cell ordering, which is load-bearing for the
f64 parity path's FP accumulation order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SimState(NamedTuple):
    """Per-particle state plus run counters. All arrays length N.

    Arrays are sorted by (cell key of current position, pid); ``pid`` is the
    original particle index (what the reference calls particle ``i``; output
    reports particle pid==0, serial/parsim.cpp:450-453).
    """

    x: jnp.ndarray    # (N,) position
    y: jnp.ndarray
    vx: jnp.ndarray   # (N,) velocity
    vy: jnp.ndarray
    m: jnp.ndarray    # (N,) mass; 0 for dead particles
    alive: jnp.ndarray  # (N,) bool — cleared on collision, never set again
    pid: jnp.ndarray  # (N,) int32 original index
    collisions: jnp.ndarray  # () int — cumulative merged-cluster count
    panics: jnp.ndarray      # () int32 — out-of-range binning events
                             # (reference [PANIC2] skip, serial/parsim.cpp:276-280)
    overflow: jnp.ndarray    # () int32 — dense-tile capacity overflow events;
                             # nonzero invalidates the run (engine retries with
                             # a larger capacity)

    @property
    def n(self) -> int:
        return self.x.shape[0]


class ShardedState(NamedTuple):
    """Per-shard particle slabs for the mesh-parallel engine.

    Shapes are per shard *inside* shard_map: (C,) slots with a validity mask
    (``valid`` = slot occupied; dead particles remain valid slots, matching
    the serial variant's forever-arrays). Outside shard_map the leading axis
    is sharded over the mesh: (D*C,).
    """

    x: jnp.ndarray
    y: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    m: jnp.ndarray
    alive: jnp.ndarray
    valid: jnp.ndarray  # (C,) bool — slot occupancy
    pid: jnp.ndarray
    collisions: jnp.ndarray  # per-shard partial; psum'd on read-out
    panics: jnp.ndarray
    overflow: jnp.ndarray    # () int32 — slab/migration overflow events (must stay 0)


def result_of(state: SimState) -> tuple[float, float, int]:
    """Final output contract: particle 0's position and the collision count.

    Reference serial/parsim.cpp:450-453. Particle 0 may be dead — its frozen
    position is reported, as in the serial variant.
    """
    pid = np.asarray(state.pid)
    idx = int(np.argmin(pid))  # pid 0's slot
    return (
        float(np.asarray(state.x)[idx]),
        float(np.asarray(state.y)[idx]),
        int(np.asarray(state.collisions)),
    )
