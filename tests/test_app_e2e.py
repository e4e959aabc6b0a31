"""End-to-end test of the du_low_sim app binary (subprocess, CPU)."""

import json
import os
import subprocess
import sys


def test_du_low_sim_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "apps", "du_low_sim.py"),
         "--cpu", "--slots", "3", "--snr-db", "25",
         "--set", "cell.nof_rb=24", "--set", "cell.nof_ports=1",
         "--set", "cell.nof_layers=1", "--set", "cell.modulation=qpsk",
         "--set", "cell.target_code_rate=0.3",
         "--trace", "/tmp/du_low_trace.json"],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BLER=0.000" in proc.stderr
    data = json.load(open("/tmp/du_low_trace.json"))
    assert data["traceEvents"]


def test_du_low_sim_scheduler_mode():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "apps", "du_low_sim.py"),
         "--cpu", "--slots", "6", "--ues", "2", "--policy", "qos",
         "--snr-db", "25",
         "--set", "cell.nof_rb=24", "--set", "cell.nof_ports=1",
         "--set", "cell.nof_layers=1", "--set", "cell.modulation=qpsk",
         "--set", "cell.target_code_rate=0.3"],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "scheduler mode: 2 UEs" in proc.stderr
    assert "BLER=0.000" in proc.stderr


def test_du_low_sim_dump_config():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "apps", "du_low_sim.py"),
         "--cpu", "--dump-config", "--set", "cell.nof_rb=106"],
        capture_output=True, text=True, timeout=120, env=env, cwd=repo,
    )
    assert proc.returncode == 0
    assert "nof_rb: 106" in proc.stdout


def test_gnb_sim_runs_end_to_end():
    """The monolithic gNB app: attach + bidirectional traffic + handover."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "apps", "gnb_sim.py"),
         "--cpu", "--ues", "1", "--packets", "2", "--slots", "20",
         "--handover", "--metrics-json"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    last = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    stats = json.loads(last)
    assert stats["ok"] and stats["dl_packets"] == 2 and stats["ul_packets"] == 2


def test_du_high_benchmark_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "benchmarks", "du_high_benchmark.py"),
         "--slots", "20", "--ues", "2"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.splitlines()[-1])
    assert out["unit"] == "us" and out["value"] > 0
