"""Pallas TPU kernels for the O(N·k) hot loops (fast engine)."""
