"""Probe v4: the remaining unknown constructs for the lockstep decoder.

v3 verdict: full decode step = 563 ns marginal (~0.6 GB/s at 128 lanes);
dynamic-offset DMA refill crashes Mosaic.  v4 tests the fallback refill
(scalar VMEM reads + 3D middle-axis row copies), the while_loop variant,
and the token-tile DMA to an HBM output."""
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

R = 128


def report(name, fn):
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:180]}", flush=True)


def timeit(f, *args, n=10):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    return (time.perf_counter() - t0) / n


# A+B+C: refill via scalar VMEM read of per-lane block index + 3D row copy
def refill3d(NB, nrefills):
    def kern(stream_ref, blkv_ref, win_ref):
        def refill(r, _):
            def one(i, _):
                blk = blkv_ref[0, i] + (r & 1)
                win_ref[i, 0, :] = stream_ref[i, blk, :]
                win_ref[i, 1, :] = stream_ref[i, blk + 1, :]
                return 0
            return jax.lax.fori_loop(0, R, one, 0)
        jax.lax.fori_loop(0, nrefills, refill, 0)

    def call(stream, blkv):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 2, 64), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(stream, blkv)
    return call


# D: while_loop step + token tile + DMA to HBM out every TILE steps
def tokens_dma(K, TILE, MAXS):
    def kern(t_ref, i_ref, o_ref, done_ref, tile_ref, sem):
        def cond(c):
            step, idx, alldone = c
            return (step < K) & ~alldone

        def body(c):
            step, idx, _ = c
            g = jnp.take_along_axis(t_ref[:], idx & 127, axis=1)
            tile_ref[step % TILE] = g[0]
            idx = idx + g

            def flush():
                cp = pltpu.make_async_copy(
                    tile_ref,
                    o_ref.at[pl.ds((step // TILE) * TILE, TILE)],
                    sem)
                cp.start()
                cp.wait()
            jax.lax.cond((step % TILE) == TILE - 1, flush, lambda: None)
            alldone = jnp.all(idx[0, :8] > (1 << 30))  # never true
            return step + 1, idx, alldone

        step, idx, _ = jax.lax.while_loop(
            cond, body, (0, i_ref[:], False))
        done_ref[0, 0] = step

    def call(t, i):
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((MAXS, 128), jnp.int32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.VMEM((TILE, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(t, i)
    return call


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    NB = 256
    stream = jnp.asarray(rng.integers(0, 99, (R, NB, 64), dtype=np.int32))
    blkv = jnp.asarray(rng.integers(0, NB - 2, (1, R), dtype=np.int32))
    for nrefills in (16, 64):
        f = jax.jit(refill3d(NB, nrefills))
        report(f"refill3d x{nrefills}",
               lambda f=f, n=nrefills:
               f"{timeit(f, stream, blkv)*1e3:.3f} ms "
               f"({timeit(f, stream, blkv)/n*1e6:.1f} us/refill)")

    t = jnp.asarray(rng.integers(0, 3, (R, 128), dtype=np.int32))
    i0 = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))
    K, TILE = 4096, 256
    f = jax.jit(tokens_dma(K, TILE, K))
    report(f"while+tile+DMA K={K}",
           lambda: f"{timeit(f, t, i0)*1e3:.2f} ms "
           f"({timeit(f, t, i0)/K*1e9:.0f} ns/step)")


if __name__ == "__main__":
    main()
