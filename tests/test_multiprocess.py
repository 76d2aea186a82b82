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


def _run_two_process(extra_args=(), expect=("DIST OK",), force_sw="1"):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "QATZIP_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "QATZIP_TPU_NUM_PROCESSES": "2",
            "QATZIP_TPU_PROCESS_ID": str(rank),
            "QATZIP_TPU_FORCE_SW": force_sw,
        })
        env.pop("XLA_FLAGS", None)  # no virtual-device split inside workers
        env.pop("PYTHONPATH", None)  # PYTHONPATH breaks plugin discovery
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, *extra_args], env=env,
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
        for marker in expect:
            assert marker in out, f"rank {rank}: missing {marker}\n{out[-2000:]}"


def test_two_process_distributed_roundtrip():
    _run_two_process()


def test_two_process_distributed_lz4_frame():
    """LZ4-frame streams through the 2-process dist engine: deterministic
    member framing + decompress-distributed member scatter."""
    _run_two_process(extra_args=("--lz4",), expect=("DIST OK", "DIST LZ4 OK"))


def test_two_process_async_ring_coexists_with_collectives():
    """Per-rank async consumer threads + jax.distributed collectives in the
    same process (reference async mode, src/qatzip.c:3854-4196, under the
    multi-process deployment of run_perf_test.sh)."""
    _run_two_process(extra_args=("--async",),
                     expect=("DIST OK", "DIST ASYNC OK"))


def test_two_process_device_kernel_path():
    """The hybrid device compress kernels dispatch under jax.distributed
    (XLA CPU backend stands in for the chip, same code path)."""
    _run_two_process(extra_args=("--device",),
                     expect=("DIST OK", "DIST DEVICE OK"), force_sw="0")
