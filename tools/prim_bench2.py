"""Second round of TPU primitive micro-benchmarks for the kernel redesign."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 16, 65536


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, (B, N)), dtype=jnp.uint32)
    cols = [jnp.asarray(rng.integers(0, 1 << 31, (B, N)), dtype=jnp.uint32)
            for _ in range(17)]

    def sortk(k):
        def f(*ops):
            return jax.vmap(lambda *o: jax.lax.sort(o, num_keys=k))(*ops)
        return jax.jit(f)

    timeit("sort 2key+1payload", sortk(2), key, cols[0], cols[1])
    timeit("sort 4key+1payload", sortk(4), key, *cols[:4])
    timeit("sort 8key+1payload", sortk(8), key, *cols[:8])
    timeit("sort 16key+1payload", sortk(16), key, *cols[:16])

    # associative scan of [64,64] one-hot matmuls over 1024 segments
    segs = 1024
    P = jnp.asarray(
        np.eye(64, dtype=np.float32)[rng.integers(0, 64, (B, segs, 64))])
    # P: [B, segs, 64, 64] one-hot rows

    @jax.jit
    def assoc_scan(p):
        def combine(a, b):
            return jnp.einsum("...ij,...jk->...ik", a, b,
                              preferred_element_type=jnp.float32)
        return jax.lax.associative_scan(combine, p, axis=1)

    timeit("assoc-scan 1024x matmul64 [B]", assoc_scan, P)

    # batched small matmuls: 2048 segs x [256x52] onehot place
    contrib = jnp.asarray(rng.random((B, 2048, 256, 2)), dtype=jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, 52, (B, 2048, 256)), dtype=jnp.int32)

    @jax.jit
    def l1_place(c, t):
        oh = (t[..., None] == jnp.arange(52)[None, None, None, :]).astype(
            jnp.bfloat16)
        return jnp.einsum("bsfk,bsfw->bswk", c, oh,
                          preferred_element_type=jnp.float32)

    timeit("L1 place 2048x[256->52] matmul", l1_place, contrib, tgt)

    # L2 place: 8 groups x [12544 contribs -> 2624 words]
    c2 = jnp.asarray(rng.random((B, 8, 12544, 2)), dtype=jnp.bfloat16)
    t2 = jnp.asarray(rng.integers(0, 2624, (B, 8, 12544)), dtype=jnp.int32)

    @jax.jit
    def l2_place(c, t):
        oh = (t[..., None] == jnp.arange(2624)[None, None, None, :]).astype(
            jnp.bfloat16)
        return jnp.einsum("bgfk,bgfw->bgwk", c, oh,
                          preferred_element_type=jnp.float32)

    timeit("L2 place 8x[12544->2624] matmul", l2_place, c2, t2)

    # fori DUS on flat buffer: 128 iterations of 2624-word updates
    flat = jnp.zeros((B * 20000,), jnp.uint32)
    seg_words = jnp.asarray(rng.integers(0, 1 << 31, (128, 2624)), jnp.uint32)
    bases = jnp.asarray(np.sort(rng.integers(0, B * 20000 - 2700, 128)),
                        jnp.int32)

    @jax.jit
    def dus_loop(f, sw, b):
        def body(i, acc):
            return jax.lax.dynamic_update_slice(acc, sw[i], (b[i],))
        return jax.lax.fori_loop(0, 128, body, f)

    timeit("fori 128x DUS[2624] flat", dus_loop, flat, seg_words, bases)

    # roll-based candidate compare: 17 rolls + compares
    @jax.jit
    def roll_compare(*ops):
        acc = jnp.zeros_like(ops[0], dtype=jnp.int32)
        for d in range(1, 2):
            for c in ops:
                acc = acc + (jnp.roll(c, d, axis=1) == c).astype(jnp.int32)
        return acc

    timeit("17x roll+compare", roll_compare, *cols)

    # u8 [B,N] -> bits f32 + matmul [512x32] (crc32 building block)
    data = jnp.asarray(rng.integers(0, 256, (B, N)), dtype=jnp.uint8)
    Bmat = jnp.asarray(rng.integers(0, 2, (512, 32)), dtype=jnp.float32)

    @jax.jit
    def crc_mm(d, m):
        bits = ((d[..., None].astype(jnp.uint32) >>
                 jnp.arange(8, dtype=jnp.uint32)) & 1)
        bits = bits.reshape(B, -1, 512).astype(jnp.float32)
        acc = jnp.einsum("bcf,fk->bck", bits, m,
                         preferred_element_type=jnp.float32)
        return (acc.astype(jnp.int32) & 1).astype(jnp.uint32)

    timeit("crc32 bits-matmul [B,N]", crc_mm, data, Bmat)


if __name__ == "__main__":
    main()
