"""Shared test fixtures and markers.

The parity environment (CPU backend, 8 virtual devices, x64, FMA-free
codegen) is established by the early plugin tests/bootstrap_env.py — see its
docstring for why it must run at plugin-import time.
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

RUN_SLOW = os.environ.get("PSIM_RUN_SLOW") == "1"

slow = pytest.mark.skipif(
    not RUN_SLOW, reason="heavy golden vector; set PSIM_RUN_SLOW=1 to run")
