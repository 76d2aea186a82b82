"""True-sync device microbench: block_until_ready on this platform can
return before execution finishes, so every timing here forces a tiny
readback (np.asarray of 8 elements) which is a real synchronization.
These numbers replace PERF.md's primitive table."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 32, 65536
_OB = jax.lax.optimization_barrier


def sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 8),)])


def bench(name, f, *args, n=20):
    try:
        r = f(*args)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        sync(r)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:34s}: {dt*1e3:8.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:34s}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return None


def main():
    print("dev:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    keys = jax.random.randint(ks[0], (B, N), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)
    pays = [jax.random.randint(k, (B, N), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)
            for k in ks[1:]]

    def mk_sort(nop):
        def f(k, *ps):
            return jax.lax.sort((k,) + ps, num_keys=1)
        return jax.jit(f)

    bench("sort 1op", mk_sort(1), keys)
    bench("sort 2op", mk_sort(2), keys, pays[0])
    bench("sort 5op", mk_sort(5), keys, *pays[:4])
    bench("sort 8op", mk_sort(8), keys, *pays[:7])

    # narrow-source take_along_axis: source [B*nseg, W] rows, idx [B*nseg, W]
    for W in (128, 256, 512):
        R = B * N // W  # keep total elements = 2M
        src = jax.random.randint(ks[1], (R, W), 0, (1 << 31) - 1, dtype=jnp.int32)
        idx = jax.random.randint(ks[2], (R, W), 0, W, dtype=jnp.int32)

        def g(a, i):
            a2, i2 = _OB((a, i))
            return _OB(jnp.take_along_axis(a2, i2, axis=-1, mode="clip"))
        bench(f"narrow gather {W}-wide 2M", jax.jit(g), src, idx)

    # narrow gather chain (8 dependent passes, the doubling pattern)
    W = 256
    R = B * N // W
    src = jax.random.randint(ks[1], (R, W), 0, W, dtype=jnp.int32)
    idx0 = jax.random.randint(ks[2], (R, W), 0, W, dtype=jnp.int32)

    def chain8(a, i):
        for _ in range(8):
            a2, i2 = _OB((a, i))
            i = _OB(jnp.take_along_axis(a2, i2, axis=-1, mode="clip"))
        return i
    bench("narrow gather chain x8 (256w)", jax.jit(chain8), src, idx0)

    # wide gather, fewer elements
    idxw = jax.random.randint(ks[3], (B, 20480), 0, N, dtype=jnp.int32)

    def gw(a, i):
        a2, i2 = _OB((a, i))
        return _OB(jnp.take_along_axis(a2, i2, axis=-1, mode="clip"))
    bench("wide gather 64K-src 0.65M idx", jax.jit(gw), keys, idxw)
    idxw2 = jax.random.randint(ks[3], (B, N), 0, N, dtype=jnp.int32)
    bench("wide gather 64K-src 2M idx", jax.jit(gw), keys, idxw2)

    # RLE doubling int16 vs int32
    eq = (keys & 1).astype(jnp.bool_)

    def rle(dtype):
        def f(e):
            r = e.astype(dtype)
            s = 1
            while s < 258:
                pad = jnp.zeros((B, s), dtype)
                r = jnp.where(r >= s, jnp.minimum(s + jnp.concatenate(
                    [r[:, s:], pad], axis=-1), dtype(258)), r)
                s <<= 1
            return r
        return jax.jit(f)
    bench("rle9 int16", rle(jnp.int16), eq)
    bench("rle9 int32", rle(jnp.int32), eq)

    # elementwise battery: 10 chained u32 ops
    def ew(a):
        v = a
        for _ in range(10):
            v = (v * jnp.uint32(2654435761)) ^ (v >> 7)
        return v
    bench("elementwise x10 u32", jax.jit(ew), keys)

    bench("cumsum i32", jax.jit(lambda a: jnp.cumsum(a.astype(jnp.int32), axis=-1)), keys)
    bench("cummax i32", jax.jit(lambda a: jax.lax.cummax(a.astype(jnp.int32), axis=1)), keys)

    # one-hot hist 286 bins
    idx286 = jax.random.randint(ks[4], (B, N), 0, 286, dtype=jnp.int32)

    def hist(i):
        hi = i // 32
        lo = i - hi * 32
        oh_hi = (hi[..., None] == jnp.arange(9)[None, None, :]).astype(jnp.int8)
        oh_lo = (lo[..., None] == jnp.arange(32)[None, None, :]).astype(jnp.int8)
        return jax.lax.dot_general(oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
    bench("hist286 onehot", jax.jit(hist), idx286)

    # v1 stage totals
    from qatzip_tpu.ops import deflate_encode as de
    raw = open("/usr/bin/g++", "rb").read()[: B * N]
    data = np.zeros((B, N + 8), np.uint8)
    data[:, :N] = np.frombuffer(raw, np.uint8).reshape(B, N)
    dj = jnp.asarray(data)
    lj = jnp.asarray(np.full((B,), N, np.int32))
    bench("v1 analyze_blocks (2MB)",
          lambda d, l: de.analyze_blocks(d, l, 1, 16), dj, lj, n=3)


if __name__ == "__main__":
    main()
