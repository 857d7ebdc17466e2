"""Utility subsystems: runtime env control, profiling, checkpointing, debug."""
