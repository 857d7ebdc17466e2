"""State checkpoint/resume.

The reference has none (state lives in memory for the whole run; SURVEY §5).
Here states serialize to ``.npz`` — enough to resume a run exactly (the step
function is pure, so a restored state continues bit-identically) and the
backbone of the step-diff debugging workflow in :mod:`.debug`.
"""

from __future__ import annotations

import numpy as np

from particlesimulation_tpu.state import SimState

_FIELDS = ("x", "y", "vx", "vy", "m", "alive", "pid", "collisions", "panics",
           "overflow")


def save_state(path: str, state: SimState) -> None:
    np.savez_compressed(path, **{f: np.asarray(getattr(state, f))
                                 for f in _FIELDS})


def load_state(path: str, dtype=None) -> SimState:
    import jax.numpy as jnp

    z = np.load(path)
    def arr(f, dt=None):
        a = z[f]
        return jnp.asarray(a if dt is None else a.astype(dt))
    dt = dtype
    return SimState(
        x=arr("x", dt), y=arr("y", dt), vx=arr("vx", dt), vy=arr("vy", dt),
        m=arr("m", dt), alive=arr("alive"), pid=arr("pid"),
        collisions=arr("collisions"), panics=arr("panics"),
        overflow=arr("overflow"))
