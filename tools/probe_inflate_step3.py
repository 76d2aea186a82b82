"""Probe v3: resolve per-gather / per-step cost above the ~4.5ms call floor
(v2's K was too small).  Times the realistic lockstep decode step: 6
dependent gather levels + bit arithmetic on [128,128] state."""
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


def dep_loop(K):
    def kern(t_ref, i_ref, o_ref):
        def body(_, idx):
            return jnp.take_along_axis(t_ref[:], idx & 127, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, K, body, i_ref[:])

    def call(t, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)
    return call


def step_loop(K):
    """Realistic decode step: 2 window gathers + root+sub litlen + root+sub
    dist (6 dependent gather levels) + the bit arithmetic between them."""
    def kern(win_ref, tll_ref, td_ref, i_ref, o_ref):
        def body(_, carry):
            bitpos, acc = carry
            wi = (bitpos >> 5) & 63
            sh = bitpos & 31
            w0 = jnp.take_along_axis(win_ref[:], wi, axis=1)
            w1 = jnp.take_along_axis(win_ref[:], (wi + 1) & 63, axis=1)
            bits = ((w0 >> sh) | ((w1 << (31 - sh)) << 1)) & 0x7FFFFFFF
            e = jnp.take_along_axis(tll_ref[:], bits & 127, axis=1)
            sidx = ((e >> 8) + (bits >> 9)) & 127
            e2 = jnp.take_along_axis(tll_ref[:], sidx, axis=1)
            e = jnp.where((e & 48) == 48, e2, e)
            clen = e & 15
            bits2 = (bits >> clen) & 0x3FFFFFF
            ed = jnp.take_along_axis(td_ref[:], bits2 & 127, axis=1)
            ed2 = jnp.take_along_axis(td_ref[:],
                                      ((ed >> 8) + (bits2 >> 9)) & 127,
                                      axis=1)
            ed = jnp.where((ed & 48) == 48, ed2, ed)
            adv = clen + (ed & 15) + 1
            return (bitpos + (adv & 31), acc ^ bits)
        init = (i_ref[:], jnp.zeros((R, 128), jnp.int32))
        bitpos, acc = jax.lax.fori_loop(0, K, body, init)
        o_ref[:] = acc + bitpos

    def call(win, tll, td, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(win, tll, td, i)
    return call


def refill_vmem(NW, WIN):
    """Window refill variant: VMEM->VMEM async copies with dynamic offset."""
    def kern(off_ref, stream_ref, win_ref):
        def inner(sem):
            def one(i, _):
                cp = pltpu.make_async_copy(
                    stream_ref.at[i, pl.ds(off_ref[i], WIN)],
                    win_ref.at[i], sem)
                cp.start()
                cp.wait()
                return 0
            jax.lax.fori_loop(0, R, one, 0)
        pl.run_scoped(inner, pltpu.SemaphoreType.DMA)

    def call(off, stream):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, WIN), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(off, stream)
    return call


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(0, 1 << 20, (R, 128), dtype=np.int32))
    i0 = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))

    for K in (16384, 65536):
        f = jax.jit(dep_loop(K))
        report(f"dep-gather K={K}",
               lambda f=f, K=K: f"{timeit(f, t, i0)*1e3:.2f} ms "
               f"({timeit(f, t, i0)/K*1e9:.1f} ns/gather)")

    win = jnp.asarray(rng.integers(0, 1 << 20, (R, 128), dtype=np.int32))
    for K in (4096, 16384):
        f = jax.jit(step_loop(K))
        report(f"full step K={K}",
               lambda f=f, K=K: (lambda dt:
                                 f"{dt*1e3:.2f} ms ({dt/K*1e9:.0f} ns/step; "
                                 f"~{R*2.7/(dt/K)/1e9:.2f} GB/s at 2.7B/tok)"
                                 )(timeit(f, win, t, t, i0)))

    NW, WIN = 4096, 64
    stream = jnp.asarray(rng.integers(0, 99, (R, NW), dtype=np.int32))
    off = jnp.asarray(rng.integers(0, NW - WIN, (R,), dtype=np.int32))
    f = jax.jit(refill_vmem(NW, WIN))
    report("refill VMEM->VMEM seq DMA x128",
           lambda: f"{timeit(f, off, stream)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
