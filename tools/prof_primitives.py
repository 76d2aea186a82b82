"""Microbenchmark TPU primitive costs relevant to the deflate pipeline.

Run on the real chip. Times per-op for batch B=32 blocks of N=64K.
Results guide kernel design: avoid anything well under ~1 Gelem/s.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, N = 32, 65536
key = jax.random.PRNGKey(0)
data = jax.random.randint(key, (B, N), 0, 256, dtype=jnp.int32)
u32 = data.astype(jnp.uint32)
idx = jax.random.randint(key, (B, N), 0, N, dtype=jnp.int32)


def bench(name, fn, *args, iters=5):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:10.3f} ms  ({B*N/dt/1e9:8.2f} Gelem/s)  [compile {tc:.1f}s]", flush=True)
    return dt


bench("elementwise mul+shift", lambda x: (x * jnp.uint32(2654435761)) >> 17, u32)
bench("sort u32 axis=-1", lambda x: jnp.sort(x, axis=-1), u32)
bench("gather take_along_axis full", lambda x, i: jnp.take_along_axis(x, i, axis=-1), data, idx)
bench("gather small window (idx%512 into 512)", lambda x, i: jnp.take_along_axis(x[:, :512], i % 512, axis=-1), data, idx)
bench("scatter set .at[].set", lambda x, i: jnp.zeros_like(x).at[jnp.arange(B)[:, None], i].set(x), data, idx)
bench("scatter-add to 286 bins",
      lambda x: jnp.zeros((B, 286), jnp.int32).at[jnp.arange(B)[:, None], jnp.clip(x, 0, 285)].add(1), data)
bench("one-hot matmul hist 286 bins",
      lambda x: jax.nn.one_hot(jnp.clip(x, 0, 285), 286, dtype=jnp.float32).sum(1), data)
bench("cumsum int32 axis=-1", lambda x: jnp.cumsum(x, axis=-1), data)
bench("roll axis=-1", lambda x: jnp.roll(x, 7, axis=-1), data)
bench("where+add chain x8", lambda x: sum(jnp.where(x > i, x, 0) for i in range(8)), data)
tbl = jax.random.randint(key, (286,), 0, 1 << 15, dtype=jnp.int32)
bench("small-table gather tbl[x] (286)", lambda x: tbl[jnp.clip(x, 0, 285)], data)

def serial_sim(x):
    def body(i, s):
        return s + jnp.take_along_axis(x, (s % N).astype(jnp.int32)[:, None], axis=-1)[:, 0]
    return jax.lax.fori_loop(0, 1000, body, jnp.zeros((B,), jnp.int32))
bench("1000-step scan w/ per-lane gather", serial_sim, data, iters=2)
