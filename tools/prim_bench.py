"""Micro-benchmarks of TPU primitive costs to guide kernel design."""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N = 16, 65536
F = 4 * N
M = 20000


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    idx_small = jnp.asarray(rng.integers(0, 256, (B, N)), dtype=jnp.int32)
    idx_big = jnp.asarray(rng.integers(0, 32769, (B, N)), dtype=jnp.int32)
    table_small = jnp.asarray(rng.integers(0, 1 << 15, 256), dtype=jnp.int32)
    table_big = jnp.asarray(rng.integers(0, 1 << 15, 32769), dtype=jnp.int32)
    vals_f = jnp.asarray(rng.integers(0, 1 << 15, (B, F)), dtype=jnp.uint32)
    widx = jnp.asarray(np.sort(rng.integers(0, M, (B, F))), dtype=jnp.int32)
    data_u8 = jnp.asarray(rng.integers(0, 256, (B, N)), dtype=jnp.uint8)

    timeit("gather [B,N] from 256-table",
           jax.jit(lambda i: table_small[i]), idx_small)
    timeit("gather [B,N] from 32769-table",
           jax.jit(lambda i: table_big[i]), idx_big)
    timeit("scatter-add [B,F]->[B,M]",
           jax.jit(lambda w, v: jax.vmap(
               lambda wi, vi: jnp.zeros(M, jnp.uint32).at[wi].add(vi))(w, v)),
           widx, vals_f)
    timeit("scatter-set bool [B,N]->[B,N]",
           jax.jit(lambda i: jax.vmap(
               lambda ii: jnp.zeros(N, jnp.bool_).at[ii & (N - 1)].set(True))(i)),
           idx_big)
    timeit("one-hot matmul lookup [B,N]x286x2",
           jax.jit(lambda i: jax.vmap(
               lambda ii: ((ii[:, None] == jnp.arange(286)[None, :])
                           .astype(jnp.bfloat16)
                           @ jnp.ones((286, 2), jnp.float32)))(i % 286)),
           idx_small)
    timeit("one-hot compare-reduce hist [B,N]->286",
           jax.jit(lambda i: jax.vmap(
               lambda ii: jnp.sum((ii[:, None] == jnp.arange(286)[None, :])
                                  .astype(jnp.int32), axis=0))(i % 286)),
           idx_small)
    timeit("cumsum [B,F]",
           jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32), axis=1)), vals_f)
    timeit("sort [B,N] u32",
           jax.jit(lambda v: jnp.sort(v.view(jnp.uint32), axis=1)), idx_big)
    timeit("sort3 [B,N] key+2payload",
           jax.jit(lambda k, a: jax.vmap(
               lambda kk, aa: jax.lax.sort((kk, aa, aa), num_keys=1))(k, a)),
           idx_big, idx_small)
    timeit("searchsorted [B,M] in [B,F]",
           jax.jit(lambda off: jax.vmap(
               lambda o: jnp.searchsorted(o, jnp.arange(0, 32 * M, 32)))(off)),
           widx)
    timeit("take_along_axis [B,N] perm",
           jax.jit(lambda v, i: jnp.take_along_axis(v, i % N, axis=1)),
           idx_big, idx_small)
    timeit("u8->u32 + elementwise chain [B,N]",
           jax.jit(lambda d: (d.astype(jnp.uint32) * jnp.uint32(2654435761))
                   >> jnp.uint32(17)), data_u8)
    timeit("fori 17x (gather f[f]) [B,N]",
           jax.jit(lambda f: jax.vmap(
               lambda ff: jax.lax.fori_loop(
                   0, 17, lambda k, g: g[g], ff % N))(f)),
           idx_big)


if __name__ == "__main__":
    main()
