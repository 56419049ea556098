"""2-process jax.distributed localhost test of the multihost layer.

Covers parallel/multihost.py end-to-end: coordinator bring-up, global mesh
over 2 processes x 2 virtual CPU devices, one sharded VMC step with cross-
process collectives (the DCN path of a real multi-host TPU run).
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_training_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=ROOT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"process {pid} output:\n{out}"
    # both processes agree on the psum'd energy
    lines = [
        [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")][0]
        for out in outs
    ]
    assert lines[0] == lines[1], lines


def test_initialize_distributed_reraises_explicit_failure():
    """An explicitly-requested multi-process init that fails must raise,
    not silently fall back to single-process (round-1 defect)."""
    from naqs_tpu.parallel.multihost import initialize_distributed

    with pytest.raises((ValueError, RuntimeError)):
        # invalid coordinator for an explicit 2-process request
        initialize_distributed(
            coordinator_address="localhost:1", num_processes=2, process_id=5
        )
