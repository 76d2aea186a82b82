"""Probe 4: Pallas lane-gather throughput (the primitive a Pallas decoder
would live on), true-sync timed."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 512, 128


def report(name, fn):
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)


def timeit(f, *args, n=10):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0][0, :8])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0][0, :8])
    return (time.perf_counter() - t0) / n


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 16 chained per-row lane gathers over [512,128] in VMEM
    def k_chain(x_ref, i_ref, o_ref):
        v = x_ref[:]
        idx = i_ref[:]
        for _ in range(16):
            idx = jnp.take_along_axis(v, idx & 127, axis=1)
        o_ref[:] = idx

    def p_chain(x, i):
        return pl.pallas_call(
            k_chain,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i)

    x = jnp.asarray(rng.integers(0, 1 << 20, (S, L), dtype=np.int32))
    i0 = jnp.asarray(rng.integers(0, L, (S, L), dtype=np.int32))
    report("chain16 lane gather", lambda: np.asarray(jax.jit(p_chain)(x, i0))[0, 0])
    try:
        dt = timeit(jax.jit(p_chain), x, i0)
        per = dt / 16 / (S * L)
        print(f"TIME chain16: {dt*1e3:.3f} ms -> {per*1e9:.3f} ns/elem/gather "
              f"({S*L*16/dt/1e9:.2f} Gelem/s)", flush=True)
    except Exception as e:
        print("FAIL timing:", str(e)[:160], flush=True)

    # broadcast-row table gather: table [1,128] broadcast, per-element idx
    def k_tbl(t_ref, i_ref, o_ref):
        tbl = t_ref[:]          # [8,128] table tile
        idx = i_ref[:]
        acc = jnp.zeros((S, L), jnp.int32)
        for r in range(8):
            row = tbl[r:r + 1, :]                     # [1,128]
            g = jnp.take_along_axis(jnp.broadcast_to(row, (S, L)),
                                    idx & 127, axis=1)
            acc = jnp.where((idx >> 7) == r, g, acc)
        o_ref[:] = acc

    def p_tbl(t, i):
        return pl.pallas_call(
            k_tbl,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    tbl = jnp.asarray(rng.integers(0, 99, (8, L), dtype=np.int32))
    i1 = jnp.asarray(rng.integers(0, 1024, (S, L), dtype=np.int32))
    def chk_tbl():
        got = np.asarray(jax.jit(p_tbl)(tbl, i1))
        want = np.asarray(tbl).reshape(-1)[np.asarray(i1)]
        return f"match={bool((got == want).all())}"
    report("tbl1024 via 8 bcast rows", chk_tbl)
    try:
        dt = timeit(jax.jit(p_tbl), tbl, i1)
        print(f"TIME tbl1024: {dt*1e3:.3f} ms for {S*L} lookups "
              f"({S*L/dt/1e9:.2f} Gelem/s)", flush=True)
    except Exception as e:
        print("FAIL tbl timing:", str(e)[:160], flush=True)

    # same chain16 but XLA (for contrast on identical shapes)
    def xla_chain(v, idx):
        for _ in range(16):
            a, i = jax.lax.optimization_barrier((v, idx & 127))
            idx = jax.lax.optimization_barrier(
                jnp.take_along_axis(a, i, axis=1))
        return idx
    try:
        dt = timeit(jax.jit(xla_chain), x, i0)
        print(f"TIME xla chain16 same shape: {dt*1e3:.3f} ms", flush=True)
    except Exception as e:
        print("FAIL xla chain:", str(e)[:160], flush=True)

    # grid version: 32 blocks of [512,128] (2M elements)
    def k_chain3(x_ref, i_ref, o_ref):
        v = x_ref[0]
        idx = i_ref[0]
        for _ in range(16):
            idx = jnp.take_along_axis(v, idx & 127, axis=1)
        o_ref[0] = idx

    def p_chain_grid(x, i):
        spec = pl.BlockSpec((1, S, L), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            k_chain3,
            out_shape=jax.ShapeDtypeStruct((32, S, L), jnp.int32),
            grid=(32,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(x, i)

    xg = jnp.asarray(rng.integers(0, 1 << 20, (32, S, L), dtype=np.int32))
    ig = jnp.asarray(rng.integers(0, L, (32, S, L), dtype=np.int32))
    report("chain16 grid32", lambda: np.asarray(jax.jit(p_chain_grid)(xg, ig))[0, 0, 0])
    try:
        dt = timeit(jax.jit(p_chain_grid), xg, ig)
        print(f"TIME chain16 grid32 (2M x16): {dt*1e3:.3f} ms "
              f"({32*S*L*16/dt/1e9:.2f} Gelem/s)", flush=True)
    except Exception as e:
        print("FAIL grid timing:", str(e)[:160], flush=True)


if __name__ == "__main__":
    main()
