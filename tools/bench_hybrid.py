"""True-sync bench of the hybrid encoder: device K1 (find_candidates) +
native host assembly.  Reports device compute ms/2MB, host assembly MB/s,
ratio vs zlib L1, and end-to-end with D2H."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))

import time
import zlib

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qatzip_tpu.native import qzcore as native
    from qatzip_tpu.ops import match_finder as mf

    print("dev:", jax.devices(), flush=True)
    B, N = 32, 65536
    raw = open("/usr/bin/g++", "rb").read()
    need = B * N
    buf = (raw * (need // len(raw) + 1))[:need]
    data = np.zeros((B, N + 8), np.uint8)
    data[:, :N] = np.frombuffer(buf, np.uint8).reshape(B, N)
    lens = np.full((B,), N, np.int32)
    dj = jnp.asarray(data)
    lj = jnp.asarray(lens)

    # compile + warm
    t0 = time.perf_counter()
    cand = mf.find_candidates(dj, lj)
    np.asarray(cand[0, :8])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    # device compute (true sync via small readback)
    t0 = time.perf_counter()
    REPS = 10
    for _ in range(REPS):
        cand = mf.find_candidates(dj, lj)
    np.asarray(cand[0, :8])
    dt = (time.perf_counter() - t0) / REPS
    print(f"K1 find_candidates: {dt*1e3:.2f} ms per {B*N>>20} MB "
          f"({B*N/dt/1e6:.0f} MB/s device compute)", flush=True)

    # full D2H of the candidate array (the transfer the hybrid pays)
    t0 = time.perf_counter()
    cand_np = np.asarray(cand)
    d2h = time.perf_counter() - t0
    print(f"cand D2H: {cand_np.nbytes>>20} MB in {d2h*1e3:.0f} ms", flush=True)

    # host assembly
    chunks = [buf[i * N:(i + 1) * N] for i in range(B)]
    t0 = time.perf_counter()
    payloads = [native.deflate_candidates(c, cand_np[i], 1)
                for i, c in enumerate(chunks)]
    host_dt = time.perf_counter() - t0
    print(f"host assembly: {host_dt*1e3:.1f} ms ({B*N/host_dt/1e6:.0f} MB/s "
          f"single-core)", flush=True)

    tot_out = sum(len(p) for p in payloads)
    tot_zlib = sum(len(zlib.compress(c, 1)) - 6 for c in chunks)
    ok = all(zlib.decompress(p, -15) == c for p, c in zip(payloads, chunks))
    print(f"ratio: {B*N/tot_out:.3f} vs zlib L1 {B*N/tot_zlib:.3f} "
          f"bit_exact={ok}", flush=True)
    # steady-state pipelined end-to-end: submit next batch while host
    # assembles previous (JAX async dispatch)
    t0 = time.perf_counter()
    PREPS = 5
    pend = mf.find_candidates(dj, lj)
    for _ in range(PREPS):
        nxt = mf.find_candidates(dj, lj)
        cand_np = np.asarray(pend)
        for i, c in enumerate(chunks):
            native.deflate_candidates(c, cand_np[i], 1)
        pend = nxt
    np.asarray(pend[0, :8])
    dt = (time.perf_counter() - t0) / PREPS
    print(f"pipelined end-to-end: {dt*1e3:.1f} ms per {B*N>>20} MB "
          f"({B*N/dt/1e6:.0f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
