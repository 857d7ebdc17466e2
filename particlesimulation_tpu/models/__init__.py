"""Simulation models — user-facing facades over the engines.

The reference has exactly one physics model (PIC gravity with EPSILON-merge
collisions); :mod:`.gravity_pic` is its home here, exposing a high-level
``Simulation`` API on top of the engine layer.
"""

from particlesimulation_tpu.models.gravity_pic import Simulation

__all__ = ["Simulation"]
