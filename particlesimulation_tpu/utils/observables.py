"""Physical observables for validation and monitoring.

The reference exposes no diagnostics beyond its two output lines; these
host-side observables back the cross-engine validation story: total
momentum/energy and center-of-mass drift quantify f32-vs-f64 and
PIC-vs-direct divergence without bit-level comparisons.

Periodic-domain note: the center of mass uses the circular mean (positions
live on a torus; an arithmetic mean is discontinuous at the wrap).
"""

from __future__ import annotations

import math

import numpy as np

from particlesimulation_tpu.config import G


def _arrays(state):
    pid = np.asarray(state.pid)
    sel = np.ones(len(pid), dtype=bool)
    if hasattr(state, "valid"):
        sel = np.asarray(state.valid)
    return {f: np.asarray(getattr(state, f))[sel]
            for f in ("x", "y", "vx", "vy", "m")}


def total_momentum(state):
    a = _arrays(state)
    return (float(np.sum(a["m"] * a["vx"])), float(np.sum(a["m"] * a["vy"])))


def total_mass(state):
    return float(np.sum(_arrays(state)["m"]))


def kinetic_energy(state):
    a = _arrays(state)
    return float(0.5 * np.sum(a["m"] * (a["vx"] ** 2 + a["vy"] ** 2)))


def circular_center_of_mass(state, side: float):
    """Mass-weighted circular mean of positions on the periodic domain."""
    a = _arrays(state)
    m = a["m"]
    M = m.sum()
    if M == 0:
        return (0.0, 0.0)
    out = []
    for coord in (a["x"], a["y"]):
        theta = coord * (2 * math.pi / side)
        c = float(np.sum(m * np.cos(theta)) / M)
        s = float(np.sum(m * np.sin(theta)) / M)
        ang = math.atan2(s, c) % (2 * math.pi)
        out.append(ang * side / (2 * math.pi))
    return tuple(out)


def summary(state, side: float) -> dict:
    px, py = total_momentum(state)
    cx, cy = circular_center_of_mass(state, side)
    return {
        "mass": total_mass(state),
        "momentum": (px, py),
        "kinetic_energy": kinetic_energy(state),
        "com": (cx, cy),
        "alive": int(np.asarray(state.alive).sum()) if hasattr(state, "alive")
                 else None,
        "collisions": int(np.asarray(state.collisions)),
    }
