"""Worker process for the 2-process jax.distributed test/harness.

Launched once per rank with QATZIP_TPU_COORDINATOR / _NUM_PROCESSES /
_PROCESS_ID set (the run_perf_test.sh multi-process analog, reference
test/performance_tests/run_perf_test.sh:72-124).  Compresses a
deterministic corpus through the distributed engine path, verifies the
assembled stream against gzip and against a single-host reference stream,
and prints one OK line.
"""
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    from qatzip_tpu.constants import QzDataFormat
    from qatzip_tpu.parallel import dist, dist_engine

    assert dist.init_distributed(), "coordinator env not set"
    pid = jax.process_index()
    nproc = jax.process_count()

    rng = np.random.default_rng(42)
    words = [b"the", b"quick", b"brown", b"fox", b"distributed", b"offload"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 30000))

    comp = dist_engine.compress_distributed(
        data, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=4096,
        sw_only=True)
    assert gzip.decompress(comp) == data, "gzip oracle mismatch"

    out = dist_engine.decompress_distributed(
        comp, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=4096,
        sw_only=True)
    assert out == data, "distributed decompress mismatch"

    # the distributed stream must equal the single-host stream bit-for-bit
    # (deterministic member framing; seq invariant src/qatzip.c:1641-1649)
    import qatzip_tpu as qz
    ref = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                      hw_buff_sz=4096, sw_only=True)
    assert comp == ref, "distributed stream differs from single-host stream"

    print(f"DIST OK rank={pid}/{nproc} bytes={len(data)} comp={len(comp)}",
          flush=True)

    if "--lz4" in sys.argv:
        # LZ4-frame distributed round-trip + decompress-distributed with
        # member scatter across ranks
        lcomp = dist_engine.compress_distributed(
            data, algorithm="lz4", hw_buff_sz=4096, sw_only=True)
        ref = qz.compress(data, "lz4", hw_buff_sz=4096, sw_only=True)
        assert lcomp == ref, "distributed lz4 stream differs"
        lout = dist_engine.decompress_distributed(
            lcomp, algorithm="lz4", hw_buff_sz=4096, sw_only=True)
        assert lout == data, "distributed lz4 decompress mismatch"
        print(f"DIST LZ4 OK rank={pid}", flush=True)

    if "--async" in sys.argv:
        # async ring on each rank + distributed assembly of the results:
        # the per-rank async consumer and the jax.distributed collectives
        # must coexist (ring + allgather)
        from qatzip_tpu import async_api

        sess = qz.QzSession()
        assert qz.qz_setup_session_deflate(sess) == qz.QZ_OK
        futs = []
        for i in range(6):
            rc, fut = async_api.qz_compress2(sess, data[i::7])
            assert rc == qz.QZ_OK
            futs.append((i, fut))
        for i, fut in futs:
            r = fut.result(timeout=60)
            assert r.rc == qz.QZ_OK
            assert qz.decompress(r.data, "deflate") == data[i::7]
        # one distributed op after the async traffic proves coexistence
        out2 = dist_engine.decompress_distributed(
            comp, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=4096,
            sw_only=True)
        assert out2 == data
        print(f"DIST ASYNC OK rank={pid}", flush=True)

    if "--device" in sys.argv:
        # run the XLA device kernels (CPU backend here) under
        # jax.distributed: the hybrid compress path end-to-end, forced on
        os.environ["QATZIP_TPU_DEVICE"] = "1"
        dcomp2 = dist_engine.compress_distributed(
            data, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=16384)
        assert gzip.decompress(dcomp2) == data, "device-path gzip mismatch"
        from qatzip_tpu.engine.core import _engine as _eng

        assert _eng.hw_requests > 0, "device path not exercised"
        print(f"DIST DEVICE OK rank={pid} hw={_eng.hw_requests}", flush=True)

    if "--overhead" in sys.argv:
        # isolate the dist-engine's own cost (scatter bookkeeping +
        # allgather + assembly) from the local compress at fixed compute:
        # overhead_frac = (T_total - T_local_compress) / T_total per rank
        import time as _t

        import qatzip_tpu as qzpkg

        big = data * 64          # ~15MB: the production-size regime where
        t_local = []             # per-rank compute dominates the allgather
        real_compress = qzpkg.compress

        def timed_compress(*a, **k):
            t0 = _t.perf_counter()
            r = real_compress(*a, **k)
            t_local.append(_t.perf_counter() - t0)
            return r

        qzpkg.compress = timed_compress
        try:
            dist_engine.compress_distributed(
                big, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                hw_buff_sz=65536, sw_only=True)  # warm
            t_local.clear()
            reps = 5
            t0 = _t.perf_counter()
            for _ in range(reps):
                dist_engine.compress_distributed(
                    big, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                    hw_buff_sz=65536, sw_only=True)
            total = (_t.perf_counter() - t0) / reps
        finally:
            qzpkg.compress = real_compress
        local = sum(t_local) / reps
        print(f"DIST OVERHEAD rank={pid} total_s={total:.5f} "
              f"local_s={local:.5f} "
              f"overhead_frac={max(total - local, 0.0) / total:.4f}",
              flush=True)

    if "--perf" in sys.argv:
        # per-process throughput loop (run_perf_test.sh column-8 analog):
        # each rank compresses its share repeatedly; the harness sums Bps
        import time

        big = data * 8
        reps = 5
        dist_engine.compress_distributed(
            big, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=65536,
            sw_only=True)
        t0 = time.time()
        for _ in range(reps):
            dist_engine.compress_distributed(
                big, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, hw_buff_sz=65536,
                sw_only=True)
        dt = (time.time() - t0) / reps
        print(f"DIST PERF rank={pid} Bps={len(big)/dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
