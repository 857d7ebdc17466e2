"""Step-diff debugging against the reference oracle.

Parity work lives or dies on localizing the *first* diverging step fast
(SURVEY §7.2 step 3). Tools here:

* :func:`first_divergence` — run two engines step by step and report the
  first step and field where they differ (bitwise or by tolerance);
* :func:`state_digest` — compact per-step fingerprint (sum of positions,
  alive count, collision counter) for cheap trajectory comparison;
* :func:`run_reference_binary` — build (once) and run the C++ serial oracle
  from a reference checkout, returning its two output lines.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np


def state_digest(state) -> dict:
    return {
        "sx": float(np.asarray(state.x).sum()),
        "sy": float(np.asarray(state.y).sum()),
        "sm": float(np.asarray(state.m).sum()),
        "alive": int(np.asarray(state.alive).sum()),
        "collisions": int(np.asarray(state.collisions)),
    }


def _by_pid(state):
    pid = np.asarray(state.pid)
    order = np.argsort(pid)
    return {f: np.asarray(getattr(state, f))[order]
            for f in ("x", "y", "vx", "vy", "m", "alive")}


def first_divergence(eng_a, state_a, eng_b, state_b, max_steps: int,
                     atol: float = 0.0):
    """Step both engines; return (step, field, max_abs_diff) or None."""
    for t in range(max_steps):
        state_a = eng_a.run(state_a, 1)
        state_b = eng_b.run(state_b, 1)
        va, vb = _by_pid(state_a), _by_pid(state_b)
        for f in ("x", "y", "vx", "vy", "m", "alive"):
            a, b = va[f], vb[f]
            if a.dtype == bool:
                if (a != b).any():
                    return (t, f, float((a != b).sum()))
            else:
                d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
                if d > atol:
                    return (t, f, float(d))
        if int(state_a.collisions) != int(state_b.collisions):
            return (t, "collisions",
                    float(int(state_a.collisions) - int(state_b.collisions)))
    return None


def run_reference_binary(reference_dir: str, args: list, build_dir: str = "/tmp/psim_oracle"):
    """Compile (cached) and run the serial C++ oracle; returns (x, y, cols)."""
    os.makedirs(build_dir, exist_ok=True)
    exe = os.path.join(build_dir, "parsim")
    src = os.path.join(reference_dir, "serial", "parsim.cpp")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-fopenmp", "-o", exe, src], check=True)
    out = subprocess.run([exe] + [str(a) for a in args],
                         capture_output=True, text=True, check=True)
    lines = out.stdout.strip().splitlines()
    xy = lines[0].split()
    return float(xy[0]), float(xy[1]), int(lines[1])
