"""Explicit integrator with periodic wrap.

Replicates ``Particle::applyForce`` (reference serial/parsim.cpp:150-195):
``a = F/m``; ``x += v*dt + 0.5*a*dt*dt`` (with the reference's left-to-right
association); ``v += a*dt``; wrap ``x = fmod(x + side, side)``. Dead particles
(``m == 0``) are frozen in place — they skip integration and wrapping
entirely (serial/parsim.cpp:151-155).

``fmod`` is an exact IEEE operation, so the wrap is bit-identical to the C
library's for the same inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def integrate(x, y, vx, vy, m, fx, fy, side: float, deltat: float):
    """One explicit step. Returns (x, y, vx, vy)."""
    dt = x.dtype
    dtt = jnp.asarray(deltat, dt)
    half = jnp.asarray(0.5, dt)
    side_a = jnp.asarray(side, dt)
    frozen = m == 0
    safe_m = jnp.where(frozen, jnp.asarray(1.0, dt), m)
    ax = fx / safe_m
    ay = fy / safe_m
    # x += vx*dt + 0.5*ax*dt*dt  — association ((vx*dt) + (((0.5*ax)*dt)*dt))
    nx = x + (vx * dtt + ((half * ax) * dtt) * dtt)
    ny = y + (vy * dtt + ((half * ay) * dtt) * dtt)
    nvx = vx + ax * dtt
    nvy = vy + ay * dtt
    nx = jnp.fmod(nx + side_a, side_a)
    ny = jnp.fmod(ny + side_a, side_a)
    return (
        jnp.where(frozen, x, nx),
        jnp.where(frozen, y, ny),
        jnp.where(frozen, vx, nvx),
        jnp.where(frozen, vy, nvy),
    )
