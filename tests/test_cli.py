"""CLI contract: the reference's exact 5-arg / 2-line interface."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, extra_env=None):
    env = {**os.environ, "PYTHONPATH": ROOT, **(extra_env or {})}
    return subprocess.run(
        [sys.executable, "-m", "particlesimulation_tpu"] + args,
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300)


def test_cli_parity_golden_vector_1():
    r = _run_cli(["1", "2", "3", "10", "1"])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert lines == ["1.570 0.056", "0"]
    # Wall time goes to stderr as "%.1fs" (reference serial/parsim.cpp:475-479).
    assert any(line.endswith("s") for line in r.stderr.splitlines())


def test_cli_usage_error():
    r = _run_cli(["1", "2", "3"])
    assert r.returncode == 1
    assert "Usage" in r.stderr


def test_cli_mesh_matches_single():
    base = ["5893", "0.05", "3", "10", "10"]
    single = _run_cli(base)
    mesh = _run_cli(base + ["--mesh", "3"])
    assert single.stdout == mesh.stdout
    assert single.stdout.strip().splitlines() == ["0.002 0.035", "2"]


def test_cli_fast_mesh_golden_vector():
    """Golden vector N1 through the sharded resident fast path: the CLI's
    --engine fast --mesh route must reproduce the reference output exactly
    (coords at 3 decimals, collision count exact)."""
    base = ["5893", "0.05", "3", "10", "10", "--engine", "fast",
            "--mesh", "3"]
    r = _run_cli(base)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().splitlines() == ["0.002 0.035", "2"]


def test_cli_fast_mesh_self_provisions_devices():
    """--engine fast --mesh N from a host with too few devices must
    re-exec onto an N-device virtual CPU mesh (the reference's
    mpirun-on-one-machine analog, reference mpi/run_tests.sh:8-16)
    instead of dying with "need N devices, have 1"."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PSIM_DEVCOUNT_REEXEC")}
    env["PYTHONPATH"] = ROOT
    r = subprocess.run(
        [sys.executable, "-m", "particlesimulation_tpu",
         "5893", "0.05", "3", "10", "10", "--engine", "fast", "--mesh", "3"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().splitlines() == ["0.002 0.035", "2"]


def test_cli_mesh_honors_impl():
    """--mesh N --impl sweep must select the sweep slab impl (round-2
    verdict: --impl was parsed but silently ignored under --mesh)."""
    base = ["5893", "0.05", "3", "10", "10", "--engine", "fast",
            "--mesh", "3", "--impl", "sweep"]
    r = _run_cli(base, extra_env={"PSIM_SHARD_IMPL": "resident"})
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().splitlines() == ["0.002 0.035", "2"]


def test_cli_rejects_unknown_impl():
    r = _run_cli(["5893", "0.05", "3", "10", "10", "--engine", "fast",
                  "--mesh", "3", "--impl", "bogus"])
    assert r.returncode != 0
    assert "bogus" in (r.stderr + r.stdout)


def test_cli_mesh2d_matches_single():
    """--mesh RxC selects the 2D rectangular decomposition
    (parallel/sharded2d.py); parity output must equal the 1-chip run
    (golden vector N1, openMP/new_tests.sh:31)."""
    base = ["5893", "0.05", "4", "16", "10"]
    single = _run_cli(base)
    mesh = _run_cli(base + ["--mesh", "2x4"])
    assert mesh.returncode == 0, mesh.stderr
    assert single.stdout == mesh.stdout


def test_cli_mesh2d_fast_golden_vector():
    base = ["5893", "0.05", "3", "10", "10", "--engine", "fast",
            "--mesh", "3x2"]
    r = _run_cli(base, extra_env={
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().splitlines() == ["0.002 0.035", "2"]
