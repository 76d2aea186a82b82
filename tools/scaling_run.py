"""Regenerate SCALING.json: virtual-mesh kernel scaling + a real
2-process jax.distributed row (the run_perf_test.sh analog, reference
test/performance_tests/run_perf_test.sh:72-124)."""
import json
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mesh_rows():
    # the axon sitecustomize hook (PYTHONPATH=/root/.axon_site) initializes
    # the jax backend at interpreter start, so CPU-mesh measurement must run
    # in a subprocess with a cleaned environment
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.check_output(
        [sys.executable, os.path.abspath(__file__), "--mesh-only"],
        env=env, text=True, timeout=900, stderr=subprocess.DEVNULL)
    return json.loads(out.strip().splitlines()[-1])


def _mesh_rows_inproc():
    from qatzip_tpu.parallel import shard

    out = {}
    for ndev in (2, 8):
        mesh = shard.make_mesh(ndev)
        out[f"mesh{ndev}"] = {k: (round(v, 3) if isinstance(v, float) else v)
                              for k, v in shard.scaling_report(mesh).items()}
    return out


def two_process_row():
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu",
                    "QATZIP_TPU_COORDINATOR": f"127.0.0.1:{port}",
                    "QATZIP_TPU_NUM_PROCESSES": "2",
                    "QATZIP_TPU_PROCESS_ID": str(rank),
                    "QATZIP_TPU_FORCE_SW": "1"})
        env.pop("XLA_FLAGS", None)
        env.pop("PYTHONPATH", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "dist_worker.py"),
             "--perf"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    bps = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-2000:]
        m = re.search(r"DIST PERF rank=\d+ Bps=(\d+)", out)
        assert m, out[-2000:]
        bps.append(int(m.group(1)))
    # each rank reports whole-stream Bps for the SAME stream compressed
    # cooperatively; per-process work is half, so aggregate = mean, and
    # the single-process baseline is measured separately below
    from qatzip_tpu.parallel import dist_engine
    import numpy as np
    import time as _t
    rng = np.random.default_rng(42)
    words = [b"the", b"quick", b"brown", b"fox", b"distributed", b"offload"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 30000)) * 8
    import qatzip_tpu as qz
    from qatzip_tpu.constants import QzDataFormat
    qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                sw_only=True)
    t0 = _t.time()
    for _ in range(5):
        qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                    sw_only=True)
    single = len(data) / ((_t.time() - t0) / 5)
    agg = sum(bps) / len(bps)
    return {"processes": 2, "per_rank_stream_Bps": bps,
            "single_process_Bps": round(single),
            "two_process_stream_Bps": round(agg),
            "speedup": round(agg / single, 3),
            "note": "2 jax.distributed processes on one 2-core host; each "
                    "rank compresses half the block range and allgathers "
                    "(tools/dist_worker.py --perf). On real multi-host "
                    "pods each process owns its own chips + cores."}


def main():
    doc = {
        "harness": "tools/scaling_run.py (run_perf_test.sh analog; kernel "
                   "rows: qatzip_tpu/parallel/shard.py:scaling_report over "
                   "the flagship match-finder; process row: real 2-process "
                   "jax.distributed via parallel/dist_engine.py)",
        "environment": {
            "platform": "virtual CPU devices + 2-process localhost "
                        "coordinator",
            "physical_cores": 2,
        },
        "caveat": "virtual CPU devices and co-located processes share the "
                  "host's 2 physical cores, capping aggregate throughput "
                  "regardless of mesh/process count; on real TPU hosts "
                  "each mesh device is independent silicon and each "
                  "process owns its own host, so the same SPMD dispatch "
                  "and block scatter scale with chip/host count.",
    }
    doc.update(mesh_rows())        # must run before any jax import in
    doc["two_process"] = two_process_row()  # this process (sets XLA_FLAGS)
    path = os.path.join(REPO, "SCALING.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    if "--mesh-only" in sys.argv:
        print(json.dumps(_mesh_rows_inproc()))
    else:
        main()
