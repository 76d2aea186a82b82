"""Measure XLA sort variants + gather/RLE battery costs on the device.
These numbers pick the encoder-v2 structure (see PERF.md)."""
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


def timeit(f, *args, n=10):
    r = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    return (time.perf_counter() - t0) / n


def main():
    print("dev:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    keys = jax.random.randint(k1, (B, N), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)
    p1 = jax.random.randint(k2, (B, N), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)
    p2 = jax.random.randint(k3, (B, N), 0, (1 << 31) - 1, dtype=jnp.int32).astype(jnp.uint32)

    tests = {
        "sort_key_only": jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]),
        "sort_1pay": jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)),
        "sort_2pay": jax.jit(lambda k, p, q: jax.lax.sort((k, p, q), num_keys=1)),
        "sort_key_unstable16": jax.jit(
            lambda k: jax.lax.sort((k.astype(jnp.uint16),), num_keys=1)[0]),
    }
    print(f"sort_key_only      : {timeit(tests['sort_key_only'], keys)*1e3:.2f} ms", flush=True)
    print(f"sort_1pay          : {timeit(tests['sort_1pay'], keys, p1)*1e3:.2f} ms", flush=True)
    print(f"sort_2pay          : {timeit(tests['sort_2pay'], keys, p1, p2)*1e3:.2f} ms", flush=True)

    # gather battery: g sequential barriered gathers of [B,N] from [B,N]
    def gathers(g):
        def f(a, idx):
            out = jnp.uint32(0)
            for i in range(g):
                ii = (idx + i) & (N - 1)
                a2, ii = _OB((a, ii))
                out = out + _OB(jnp.take_along_axis(a2, ii, axis=-1, mode="clip"))
            return out
        return jax.jit(f)

    idx = jax.random.randint(k2, (B, N), 0, N, dtype=jnp.int32)
    for g in (1, 8, 20):
        dt = timeit(gathers(g), keys, idx)
        print(f"gathers x{g:2d}       : {dt*1e3:.2f} ms ({dt/g*1e3:.3f} ms each)", flush=True)

    # RLE-style doubling: 9 passes of shift+where on int16
    def rle(eq):
        r = eq.astype(jnp.int16)
        s = 1
        while s < 258:
            pad = jnp.zeros((B, s), jnp.int16)
            r_sh = jnp.concatenate([r[:, s:], pad], axis=-1)
            r = jnp.where(r >= s, jnp.minimum(s + r_sh, jnp.int16(258)), r)
            s <<= 1
        return r
    eq = (keys & 1).astype(jnp.bool_)
    print(f"rle_doubling(int16): {timeit(jax.jit(rle), eq)*1e3:.2f} ms", flush=True)

    # histogram battery (one-hot MXU, 286 bins)
    def hist(idx286):
        hi = idx286 // 32
        lo = idx286 - hi * 32
        oh_hi = (hi[..., None] == jnp.arange(9)[None, None, :]).astype(jnp.int8)
        oh_lo = (lo[..., None] == jnp.arange(32)[None, None, :]).astype(jnp.int8)
        return jax.lax.dot_general(
            oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
    idx286 = jax.random.randint(k3, (B, N), 0, 286, dtype=jnp.int32)
    print(f"hist286 onehot     : {timeit(jax.jit(hist), idx286)*1e3:.2f} ms", flush=True)

    # cumsum u32 + int32
    print(f"cumsum_u32         : {timeit(jax.jit(lambda a: jnp.cumsum(a, axis=-1)), keys)*1e3:.2f} ms", flush=True)

    # binary search: 17 take_along_axis steps over [B, 20K] queries
    Q = 20480
    def bsearch(cum, qv):
        lo = jnp.zeros((B, Q), jnp.int32)
        hi = jnp.full((B, Q), N, jnp.int32)
        for _ in range(17):
            mid = (lo + hi) >> 1
            c, m = _OB((cum, mid))
            v = _OB(jnp.take_along_axis(c, m, axis=-1, mode="clip"))
            go = v < qv
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo
    cum = jnp.cumsum((keys & 31).astype(jnp.int32), axis=-1)
    qv = jax.random.randint(k1, (B, Q), 0, 1 << 20, dtype=jnp.int32)
    print(f"bsearch 17x20K     : {timeit(jax.jit(bsearch), cum, qv)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
