"""Trustworthy TPU primitive timing: repeat each op K times INSIDE one jit
(chained on its own output so XLA can't hoist), read back a scalar once.
cost = (t(K=17) - t(K=1)) / 16 per op instance.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 16, 65536
K_HI, K_LO = 17, 1


def measure(name, make_fn, *args):
    outs = {}
    for k in (K_LO, K_HI):
        fn = jax.jit(make_fn(k))
        np.asarray(fn(*args))  # compile+warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            s = np.asarray(fn(*args))
        outs[k] = (time.time() - t0) / reps
    per_op = (outs[K_HI] - outs[K_LO]) / (K_HI - K_LO)
    print(f"{name:44s} {per_op*1e3:9.3f} ms/op   (1x call {outs[K_LO]*1e3:7.1f} ms)",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    u32 = lambda *s: jnp.asarray(rng.integers(0, 1 << 31, s), dtype=jnp.uint32)

    x = u32(B, N)
    tbl = u32(32769)

    def mk_elem(k):
        def f(v):
            for i in range(k):
                v = (v * jnp.uint32(2654435761)) ^ (v >> 15)
            return v.sum()
        return f
    measure("elementwise mul+xor [B,N]", mk_elem, x)

    def mk_gather(k):
        def f(v):
            for i in range(k):
                v = tbl[(v & 32767).astype(jnp.int32)] ^ v
            return v.sum()
        return f
    measure("gather 1M from 32K-table", mk_gather, x)

    def mk_sort1(k):
        def f(v):
            for i in range(k):
                v = jax.vmap(lambda a: jax.lax.sort((a,), num_keys=1)[0])(v) ^ jnp.uint32(i)
            return v.sum()
        return f
    measure("sort 1-op [B,N]", mk_sort1, x)

    y = u32(B, N)
    z = u32(B, N)

    def mk_sort3(k):
        def f(a, b, c):
            for i in range(k):
                a, b, c = jax.vmap(
                    lambda p, q, r: jax.lax.sort((p, q, r), num_keys=2))(a, b, c)
                a = a ^ jnp.uint32(i)
            return a.sum() + b.sum() + c.sum()
        return f
    measure("sort 2key+1payload [B,N]", mk_sort3, x, y, z)

    cols = [u32(B, N) for _ in range(17)]

    def mk_sort17(k):
        def f(*ops):
            ops = list(ops)
            for i in range(k):
                ops = list(jax.vmap(
                    lambda *o: jax.lax.sort(o, num_keys=16))(*ops))
                ops[0] = ops[0] ^ jnp.uint32(i)
            return sum(o.sum() for o in ops)
        return f
    measure("sort 16key+1payload [B,N]", mk_sort17, *cols)

    widx = jnp.asarray(np.sort(rng.integers(0, 20000, (B, 4 * N))),
                       dtype=jnp.int32)

    def mk_scatter(k):
        def f(w, v):
            acc = jnp.zeros((B, 20000), jnp.uint32)
            for i in range(k):
                acc = jax.vmap(lambda a, wi, vi: a.at[wi].add(vi))(
                    acc, w, v[:, : 4 * N])
            return acc.sum()
        return f
    vbig = u32(B, 4 * N)
    measure("scatter-add 4M->320K", mk_scatter, widx, vbig)

    seg_t = jnp.asarray(rng.integers(0, 52, (B, 2048, 256)), dtype=jnp.int32)
    seg_v = jnp.asarray(rng.random((B, 2048, 256, 2)), dtype=jnp.float32)

    def mk_place(k):
        def f(t, v):
            acc = 0.0
            for i in range(k):
                oh = ((t + i) % 52 == jnp.arange(52)[None, None, None, :][..., :]
                      ).astype(jnp.float32) if False else (
                    (t[..., None] + i) % 52 == jnp.arange(52)).astype(jnp.float32)
                r = jnp.einsum("bsfk,bsfw->bswk", v, oh,
                               preferred_element_type=jnp.float32)
                acc = acc + r.sum()
            return acc
        return f
    measure("L1 place 2048x[256->52] batched mm", mk_place, seg_t, seg_v)

    P = jnp.asarray(
        np.eye(64, dtype=np.float32)[rng.integers(0, 64, (B, 1024, 64))])

    def mk_scan(k):
        def f(p):
            acc = 0.0
            for i in range(k):
                r = jax.lax.associative_scan(
                    lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b,
                                            preferred_element_type=jnp.float32),
                    p + (i * 0.0), axis=1)
                acc = acc + r.sum()
            return acc
        return f
    measure("assoc-scan 1024 x mm64", mk_scan, P)

    sw = u32(128, 2624)
    bases = jnp.asarray(np.sort(rng.integers(0, B * 20000 - 2700, 128)),
                        jnp.int32)

    def mk_dus(k):
        def f(s, b):
            flat = jnp.zeros((B * 20000,), jnp.uint32)
            for i in range(k):
                def body(j, acc):
                    return jax.lax.dynamic_update_slice(
                        acc, s[j] ^ jnp.uint32(i), (b[j],))
                flat = jax.lax.fori_loop(0, 128, body, flat)
            return flat.sum()
        return f
    measure("fori 128x DUS[2624]", mk_dus, sw, bases)

    data = jnp.asarray(rng.integers(0, 256, (B, N)), dtype=jnp.uint8)
    Bmat = jnp.asarray(rng.integers(0, 2, (512, 32)), dtype=jnp.float32)

    def mk_crc(k):
        def f(d, m):
            acc = 0.0
            for i in range(k):
                bits = ((d[..., None].astype(jnp.uint32) >>
                         jnp.arange(8, dtype=jnp.uint32)) & 1)
                bits = bits.reshape(B, -1, 512).astype(jnp.float32) + (i * 0.0)
                r = jnp.einsum("bcf,fk->bck", bits, m,
                               preferred_element_type=jnp.float32)
                acc = acc + r.sum()
            return acc
        return f
    measure("crc32 bits-matmul [B,N]", mk_crc, data, Bmat)


if __name__ == "__main__":
    main()
