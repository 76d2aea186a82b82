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
    import time

    from qatzip_tpu.parallel import shard

    out = {}
    for ndev in (2, 8):
        mesh = shard.make_mesh(ndev)
        out[f"mesh{ndev}"] = {k: (round(v, 3) if isinstance(v, float) else v)
                              for k, v in shard.scaling_report(mesh).items()}
    # device-compute row: the kernel-only measurement judged against the
    # CORE-capped ideal — on virtual CPU devices the 8-way mesh shares 2
    # physical cores, so the honest sharding-efficiency question is "does
    # the SPMD dispatch reach the hardware ceiling", not "does it reach
    # 8x" (it cannot; on real chips each mesh device is its own silicon)
    cores = os.cpu_count() or 2
    m8 = out["mesh8"]
    ideal = m8["single_device_Bps"] * min(8, cores)
    out["mesh8_device_compute"] = {
        "devices": 8,
        "physical_cores": cores,
        "mesh_Bps": m8["mesh_Bps"],
        "core_capped_ideal_Bps": round(ideal, 3),
        "efficiency_vs_core_capped_ideal": round(m8["mesh_Bps"] / ideal, 3),
        "note": "kernel-only (no host assembly); efficiency vs the "
                "physical-core ceiling isolates SPMD sharding overhead "
                "from the host's core count",
    }
    # Amdahl decomposition of the hybrid pipeline on the mesh: kernel-only
    # vs kernel+host-assembly wall time for the same 64-chunk batch
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qatzip_tpu.ops import match_finder as mf
    from qatzip_tpu.native import qzcore as native

    mesh = shard.make_mesh(8)
    rng = np.random.default_rng(0)
    words = [b"the", b"quick", b"brown", b"fox", b"hybrid", b"assembly"]
    blob = b" ".join(words[i] for i in rng.integers(0, len(words), 200000))
    n = 65536
    chunks = [blob[i * n:(i + 1) * n] for i in range(16)]
    data = np.zeros((16, n + 8), np.uint8)
    for i, c in enumerate(chunks):
        data[i, :len(c)] = np.frombuffer(c, np.uint8)
    lens = np.full(16, n, np.int32)
    dj = jax.device_put(jnp.asarray(data), NamedSharding(mesh, P("block", None)))
    lj = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P("block")))

    def kernel_only():
        return np.asarray(mf.find_candidates(dj, lj))

    cand = kernel_only()
    t0 = time.perf_counter()
    cand = kernel_only()
    t_k = time.perf_counter() - t0
    from qatzip_tpu.engine.cpu_backend import _map_chunks

    def full():
        c = kernel_only()
        return _map_chunks(
            lambda ic: native.deflate_candidates(ic[1], c[ic[0]], 1),
            list(enumerate(chunks)))

    full()
    t0 = time.perf_counter()
    full()
    t_f = time.perf_counter() - t0
    out["amdahl_hybrid"] = {
        "batch_bytes": 16 * n,
        "kernel_s": round(t_k, 4),
        "kernel_plus_host_assembly_s": round(t_f, 4),
        "host_serial_fraction": round(max(t_f - t_k, 0.0) / t_f, 3),
        "note": "host assembly (native candidate parse + entropy code) "
                "overlaps the next batch's device dispatch in the engine "
                "(device_codecs submit-all-then-assemble); this row bounds "
                "the serial host term the overlap must hide",
    }
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
                    "QATZIP_TPU_FORCE_SW": "1",
                    # one SW thread per rank: 2 ranks x 1 thread on 2
                    # cores, the reference's procs x threads pinning
                    # (run_perf_test.sh taskset rows)
                    "QATZIP_TPU_SW_THREADS": "1"})
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


def dist_overhead_row():
    """The dist-engine's own cost at fixed compute (round-5 row): per-rank
    overhead_frac = (T_compress_distributed - T_local_compress)/T_total.
    This isolates scatter bookkeeping + allgather + assembly from the
    compute the ranks do anyway, supporting the multi-host scaling claim
    independently of this host's 2-core ceiling."""
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu",
                    "QATZIP_TPU_COORDINATOR": f"127.0.0.1:{port}",
                    "QATZIP_TPU_NUM_PROCESSES": "2",
                    "QATZIP_TPU_PROCESS_ID": str(rank),
                    "QATZIP_TPU_FORCE_SW": "1",
                    "QATZIP_TPU_SW_THREADS": "1"})
        env.pop("XLA_FLAGS", None)
        env.pop("PYTHONPATH", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "dist_worker.py"),
             "--overhead"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    fracs, totals, locals_ = [], [], []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-2000:]
        m = re.search(r"DIST OVERHEAD rank=\d+ total_s=([0-9.]+) "
                      r"local_s=([0-9.]+) overhead_frac=([0-9.]+)", out)
        assert m, out[-2000:]
        totals.append(float(m.group(1)))
        locals_.append(float(m.group(2)))
        fracs.append(float(m.group(3)))
    return {"processes": 2,
            "workload_bytes": 12772800,       # dist_worker --overhead corpus (x64)
            "per_rank_total_s": totals,
            "per_rank_local_compress_s": locals_,
            "per_rank_overhead_frac": fracs,
            "mean_overhead_frac": round(sum(fracs) / len(fracs), 4),
            "note": "dist-engine overhead (scatter bookkeeping + payload "
                    "allgather + assembly) at fixed per-rank compute, "
                    "measured over the localhost gRPC transport (~0.7 "
                    "GB/s); the overhead term is pure transport+copy, so "
                    "on DCN-class NICs it shrinks proportionally while "
                    "per-rank compute is unchanged — a mean fraction f "
                    "bounds achievable N-process scaling at ~N*(1-f) for "
                    "this transport"}


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
    doc["dist_overhead"] = dist_overhead_row()
    path = os.path.join(REPO, "SCALING.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    if "--mesh-only" in sys.argv:
        print(json.dumps(_mesh_rows_inproc()))
    else:
        main()
