"""Ratio x device-compute sweep for the round-5 compress levers:
stride 2/3/4, rank8 on/off, batch 128 — against the zlib L1 ratio floor.

Run: python tools/probe_hybrid5.py [mb]
"""
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_corpus
    from qatzip_tpu.native import qzcore as native
    from qatzip_tpu.ops import match_finder as mf

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    data = build_corpus(mb)
    n = 65536
    B = len(data) // n
    arr = np.zeros((B, n + 8), np.uint8)
    for i in range(B):
        arr[i, :n] = np.frombuffer(data[i * n:(i + 1) * n], np.uint8)
    lens = np.full((B,), n, np.int32)
    dj = jnp.asarray(arr)
    lj = jnp.asarray(lens)

    zl1 = sum(len(zlib.compress(data[i * n:(i + 1) * n], 1)) - 11
              for i in range(B))
    print(f"{B} x 64KB; zlib L1 ratio {len(data)/zl1:.4f}", flush=True)

    for stride, rank8, depth in ((2, True, 16), (2, False, 16),
                                 (3, True, 16), (3, False, 16),
                                 (4, True, 16), (3, True, 24)):
        def run():
            return mf.find_candidates(dj, lj, depth=depth, stride=stride,
                                      rank8=rank8)
        cand = run()
        np.asarray(cand[0, :8])
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            cand = run()
        np.asarray(cand[0, :8])
        dt = (time.perf_counter() - t0) / reps
        cand_np = np.asarray(cand)
        csize = 0
        for i in range(B):
            payload = native.deflate_candidates(
                data[i * n:(i + 1) * n], cand_np[i], 1)
            csize += len(payload)
        print(f"s{stride} d{depth} rank8={int(rank8)}: "
              f"{dt*1e3:.2f} ms -> {len(data)/dt/1e9:.3f} GB/s, "
              f"ratio {len(data)/csize:.4f} "
              f"({'OK' if len(data)/csize >= len(data)/zl1 else 'BELOW zlib'})",
              flush=True)


if __name__ == "__main__":
    main()
