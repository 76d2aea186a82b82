"""2-process jax.distributed test: the multi-host engine path on one
machine (localhost coordinator; the multi-node-without-a-cluster strategy,
SURVEY.md §4).  Reference analog: the multi-process perf harness
test/performance_tests/run_perf_test.sh:72-124."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_roundtrip():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "QATZIP_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "QATZIP_TPU_NUM_PROCESSES": "2",
            "QATZIP_TPU_PROCESS_ID": str(rank),
            "QATZIP_TPU_FORCE_SW": "1",
        })
        env.pop("XLA_FLAGS", None)  # no virtual-device split inside workers
        env.pop("PYTHONPATH", None)  # PYTHONPATH breaks plugin discovery
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "DIST OK" in out
