"""Probe: compress-side sort cost levers (round 5, VERDICT #2).

The two lax.sorts are ~the whole cost of the hybrid compress device stage
(0.67 GB/s/chip).  Measures, true-sync (small-slice readback):
  1. u32 key + (b4, b4b) payloads        — the shipped sort1
  2. u16 key + (pos16, b4, b4b) payloads — narrow key: stable sort makes
     pos-order implicit, pos rides as payload instead of key bits
  3. u32 key + 1/2/3 payloads            — payload marginal cost
  4. sort2 variants: u32 pos<<16 key + dist payload vs u16 pos key
  5. batch scaling: B=64/128/256 rows of 64K (the knee search)

Run: python tools/probe_sort5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np


def sync(r):
    # SMALL-SLICE readback (PERF.md): slice on device, pull 8 elements —
    # np.asarray of the whole result would drag the tunnel D2H into the
    # compute number
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 8),)])


def timeit(f, *args, n=10):
    r = f(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.perf_counter() - t0) / n


def report(name, fn):
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, n = 64, 65536
    elems = B * n

    k32 = jnp.asarray(rng.integers(0, 1 << 31, (B, n), dtype=np.int64)
                      .astype(np.uint32))
    k16 = jnp.asarray(rng.integers(0, 1 << 15, (B, n)).astype(np.uint16))
    p16 = jnp.asarray(rng.integers(0, 1 << 16, (B, n)).astype(np.uint16))
    p32a = jnp.asarray(rng.integers(0, 1 << 31, (B, n), dtype=np.int64)
                       .astype(np.uint32))
    p32b = jnp.asarray(rng.integers(0, 1 << 31, (B, n), dtype=np.int64)
                       .astype(np.uint32))

    @jax.jit
    def s_u32_2p(k, a, b):
        return jax.lax.sort((k, a, b), num_keys=1, is_stable=True)

    @jax.jit
    def s_u16_3p(k, p, a, b):
        return jax.lax.sort((k, p, a, b), num_keys=1, is_stable=True)

    @jax.jit
    def s_u32_1p(k, a):
        return jax.lax.sort((k, a), num_keys=1, is_stable=True)

    @jax.jit
    def s_u16_1p(k, a):
        return jax.lax.sort((k, a), num_keys=1, is_stable=True)

    report("sort1 u32key +2x u32 payload (shipped)",
           lambda: f"{timeit(s_u32_2p, k32, p32a, p32b)*1e3:.2f} ms "
           f"({timeit(s_u32_2p, k32, p32a, p32b)/elems*1e9:.2f} ns/elem)")
    report("sort1 u16key +pos16 +2x u32 payload",
           lambda: f"{timeit(s_u16_3p, k16, p16, p32a, p32b)*1e3:.2f} ms "
           f"({timeit(s_u16_3p, k16, p16, p32a, p32b)/elems*1e9:.2f} ns/elem)")
    report("sort2 u32key +1 u32 payload (shipped unscramble)",
           lambda: f"{timeit(s_u32_1p, k32, p32a)*1e3:.2f} ms "
           f"({timeit(s_u32_1p, k32, p32a)/elems*1e9:.2f} ns/elem)")
    report("sort2 u16key +1 u16 payload",
           lambda: f"{timeit(s_u16_1p, k16, p16)*1e3:.2f} ms "
           f"({timeit(s_u16_1p, k16, p16)/elems*1e9:.2f} ns/elem)")

    # batch knee: full find_candidates at B=64/128/256 (stride-2 L1 point)
    from qatzip_tpu.ops import match_finder as mf

    for BB in (64, 128, 256):
        data = np.zeros((BB, n + 8), np.uint8)
        data[:, :n] = rng.integers(0, 64, (BB, n), dtype=np.uint8)
        lens = np.full((BB,), n, np.int32)
        dj = jnp.asarray(data)
        lj = jnp.asarray(lens)

        def run(dj=dj, lj=lj):
            return mf.find_candidates(dj, lj, depth=16, stride=2)
        try:
            dt = timeit(run, n=5)
            print(f"OK   find_candidates B={BB} d16 s2: {dt*1e3:.2f} ms "
                  f"-> {BB*n/dt/1e9:.3f} GB/s", flush=True)
        except Exception as e:
            print(f"FAIL B={BB}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
