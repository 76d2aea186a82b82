"""Probe: dependent-gather latency — the quantity that decides the lockstep
Pallas inflate's ceiling.

v1 findings (kept in git history): take_along_axis compiles ONLY with a
full-width [R,128] index over 128-wide rows ([B,1] indices and 512/1024-wide
tables fail to lower); dynamic minor-axis slices crash the Mosaic compiler;
per-call dispatch overhead (~10ms tunnel) swamps small kernels.  v2 therefore
loops K dependent gathers INSIDE one kernel and fits the slope.

True-sync timing (np.asarray readback; block_until_ready can return early on
axon — PERF.md).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def timeit(f, *args, n=10):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    return (time.perf_counter() - t0) / n


def dep_gather_loop(R, K):
    """K chained (dependent) [R,128] gathers inside one kernel."""
    def kern(t_ref, i_ref, o_ref):
        def body(_, idx):
            return jnp.take_along_axis(t_ref[:], idx & 127, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, K, body, i_ref[:])

    def call(t, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return call


def indep_gather_loop(R, K, W):
    """K iterations of W INDEPENDENT gathers (ILP probe)."""
    def kern(t_ref, i_ref, o_ref):
        def body(_, idx):
            acc = idx
            for w in range(W):
                acc = acc + jnp.take_along_axis(t_ref[:], (idx + w) & 127,
                                                axis=1)
            return acc & 127
        o_ref[:] = jax.lax.fori_loop(0, K, body, i_ref[:])

    def call(t, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return call


def elemwise_loop(R, K):
    """fori_loop baseline: per-iteration overhead without gathers."""
    def kern(t_ref, i_ref, o_ref):
        def body(_, idx):
            v = (idx * 2654435761 + 12345) & 0x7FFFFFFF
            return (v ^ (v >> 7)) & 0xFFFF
        o_ref[:] = jax.lax.fori_loop(0, K, body, i_ref[:])

    def call(t, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    return call


def refill_dma(B, NW, WIN):
    """Per-lane window refill via 128 async copies HBM->VMEM."""
    def kern(off_ref, stream_ref, win_ref):
        def inner(sems):
            def start(i, _):
                pltpu.make_async_copy(
                    stream_ref.at[i, pl.ds(off_ref[0, i], WIN)],
                    win_ref.at[i], sems.at[i]).start()
                return 0
            jax.lax.fori_loop(0, B, start, 0)

            def wait(i, _):
                pltpu.make_async_copy(
                    stream_ref.at[i, pl.ds(off_ref[0, i], WIN)],
                    win_ref.at[i], sems.at[i]).wait()
                return 0
            jax.lax.fori_loop(0, B, wait, 0)
        pl.run_scoped(inner, pltpu.SemaphoreType.DMA((B,)))

    def call(off, stream):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, WIN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(off, stream)
    return call


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for R in (8, 32, 128):
        t = jnp.asarray(rng.integers(0, 1 << 20, (R, 128), dtype=np.int32))
        i0 = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))
        for K in (1024, 4096):
            f = jax.jit(dep_gather_loop(R, K))
            report(f"dep-gather R={R} K={K}",
                   lambda f=f, t=t, i0=i0, K=K:
                   f"{timeit(f, t, i0)*1e3:.3f} ms "
                   f"({timeit(f, t, i0)/K*1e9:.0f} ns/gather)")

    R = 128
    t = jnp.asarray(rng.integers(0, 1 << 20, (R, 128), dtype=np.int32))
    i0 = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))
    for W in (4, 8):
        f = jax.jit(indep_gather_loop(R, 2048, W))
        report(f"indep x{W} R=128 K=2048",
               lambda f=f: f"{timeit(f, t, i0)*1e3:.3f} ms "
               f"({timeit(f, t, i0)/2048/W*1e9:.0f} ns/gather)")

    f = jax.jit(elemwise_loop(R, 4096))
    report("elemwise loop K=4096",
           lambda: f"{timeit(f, t, i0)*1e3:.3f} ms "
           f"({timeit(f, t, i0)/4096*1e9:.0f} ns/iter)")

    B, NW, WIN = 128, 4096, 128
    stream = jnp.asarray(rng.integers(0, 99, (B, NW), dtype=np.int32))
    off = jnp.asarray(rng.integers(0, NW - WIN, (1, B), dtype=np.int32))
    f = jax.jit(refill_dma(B, NW, WIN))
    report("refill 128 per-lane DMAs",
           lambda: f"{timeit(f, off, stream)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
