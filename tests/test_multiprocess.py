"""Multi-host simulation: 2 processes x 4 virtual CPU devices each.

SURVEY.md section 4's prescription for testing pod-style distribution
without hardware: every process runs tests/_mp_worker.py, which joins a
jax.distributed cluster, builds the global 8-device "rays" mesh, and runs
one NRC-enabled train step with pixels sharded across the process boundary
-- exercising coordinator bring-up, cross-process collectives (the gradient
all-reduce), and dist.mesh.initialize_distributed's underlying path.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_four_device_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n---\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "MP_OK" in out, out
