"""Pallas probe round 2: fixed bitonic (non-negative rolls), sublane
dynamic gather, SMEM scalar walk, wide-lane gather limits."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        dt = time.perf_counter() - t0
        print(f"OK   {name}: {out} ({dt:.2f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def timeit(f, *args, n=10):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / n


S, L = 512, 128  # 65536 elements per block


def _ce(v, lin, stride, dirbit):
    """Bitonic compare-exchange at stride (powers of two) via rolls."""
    if stride < L:
        up = pltpu.roll(v, shift=L - stride, axis=1)   # v[i+stride] -> i
        dn = pltpu.roll(v, shift=stride, axis=1)       # v[i-stride] -> i
    else:
        r = stride // L
        up = pltpu.roll(v, shift=S - r, axis=0)
        dn = pltpu.roll(v, shift=r, axis=0)
    bit = (lin & stride) != 0
    partner = jnp.where(bit, dn, up)
    asc = (lin & dirbit) == 0
    lo = jnp.minimum(v, partner)
    hi = jnp.maximum(v, partner)
    want_min = bit == jnp.logical_not(asc)  # xor
    return jnp.where(want_min, hi, lo)


def k_bitonic(x_ref, o_ref):
    v = x_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    lin = rows * L + cols
    n = S * L
    k = 2
    while k <= n:
        dirbit = k if k < n else (1 << 30)  # final merge ascending
        j = k // 2
        while j >= 1:
            v = _ce(v, lin, j, dirbit)
            j //= 2
        k *= 2
    o_ref[0] = v


def p_bitonic(x):
    B = x.shape[0]
    return pl.pallas_call(
        k_bitonic,
        out_shape=jax.ShapeDtypeStruct((B, S, L), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    big1 = jax.random.randint(key, (1, S, L), 0, 1 << 30, dtype=jnp.int32)
    def chk1():
        out = np.asarray(jax.jit(p_bitonic)(big1)).reshape(-1)
        # bitonic linear index is (row, col) = row*128+col order
        return f"sorted={bool(np.all(np.diff(out) >= 0))}"
    report("bitonic1", chk1)
    try:
        dt = timeit(jax.jit(p_bitonic), big1)
        print(f"TIME bitonic 64k x1: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print("FAIL bitonic1 timing:", str(e)[:200], flush=True)

    big32 = jax.random.randint(key, (32, S, L), 0, 1 << 30, dtype=jnp.int32)
    report("bitonic32", lambda: f"sorted={bool(np.all(np.diff(np.asarray(jax.jit(p_bitonic)(big32))[7].reshape(-1)) >= 0))}")
    try:
        dt = timeit(jax.jit(p_bitonic), big32)
        print(f"TIME bitonic 64k x32 (2M): {dt*1e3:.2f} ms "
              f"({32*65536/dt/1e9:.3f} Gelem/s)", flush=True)
    except Exception as e:
        print("FAIL bitonic32 timing:", str(e)[:200], flush=True)

    # XLA sort same batch for comparison
    def xs(a):
        return jnp.sort(a.reshape(32, -1), axis=-1)
    try:
        dt = timeit(jax.jit(xs), big32)
        print(f"TIME xla sort 64k x32: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print("FAIL xla sort32:", str(e)[:200], flush=True)

    # sublane dynamic gather: take_along_axis along axis 0
    def k_subgather(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    def p_subgather(tbl, idx):
        return pl.pallas_call(
            k_subgather,
            out_shape=jax.ShapeDtypeStruct(idx.shape, tbl.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    tbl = jnp.tile(jnp.arange(512, dtype=jnp.int32)[:, None] * 10, (1, 128))
    idx = jnp.tile(jnp.array([[17]], jnp.int32), (8, 128))
    report("subgather512x128",
           lambda: np.asarray(jax.jit(p_subgather)(tbl, idx))[0, :2].tolist())

    tbl8 = tbl[:8]
    report("subgather8x128",
           lambda: np.asarray(jax.jit(p_subgather)(tbl8, jnp.tile(jnp.array([[5]], jnp.int32), (8, 128))))[0, :2].tolist())

    # SMEM scalar walk: dynamic scalar reads from an SMEM array
    def k_swalk(f_ref, o_ref):
        def body(i, p):
            return f_ref[p]
        o_ref[0] = jax.lax.fori_loop(0, 4096, body, 0)

    def p_swalk(f):
        return pl.pallas_call(
            k_swalk,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(f)

    fchain = jnp.arange(1, 8193, dtype=jnp.int32) % 8192
    report("smem_walk", lambda: np.asarray(jax.jit(p_swalk)(fchain)).tolist())
    try:
        dt = timeit(jax.jit(p_swalk), fchain)
        print(f"TIME smem walk: {dt*1e9/4096:.1f} ns/step", flush=True)
    except Exception as e:
        print("FAIL smem walk timing:", str(e)[:200], flush=True)

    # vector-op fori_loop cost inside a kernel ([8,128] op per step)
    def k_vloop(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[:] * (i & 1)
        o_ref[:] = jax.lax.fori_loop(0, 512, body, jnp.zeros((8, 128), jnp.int32))

    def p_vloop(x):
        return pl.pallas_call(
            k_vloop,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x8 = jnp.ones((8, 128), jnp.int32)
    report("vloop", lambda: np.asarray(jax.jit(p_vloop)(x8))[0, 0].tolist())
    try:
        dt = timeit(jax.jit(p_vloop), x8)
        print(f"TIME vector fori step: {dt*1e9/512:.1f} ns/step", flush=True)
    except Exception as e:
        print("FAIL vloop timing:", str(e)[:200], flush=True)

    # uint32 ops inside kernel
    def k_u32(x_ref, o_ref):
        v = x_ref[:].astype(jnp.uint32)
        o_ref[:] = ((v * jnp.uint32(2654435761)) >> jnp.uint32(17)).astype(jnp.int32)

    def p_u32(x):
        return pl.pallas_call(
            k_u32,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    report("u32ops", lambda: np.asarray(jax.jit(p_u32)(x8))[0, 0].tolist())

    # cumsum along lanes inside kernel
    def k_cumsum(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    def p_cumsum(x):
        return pl.pallas_call(
            k_cumsum,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    report("cumsum_lane", lambda: np.asarray(jax.jit(p_cumsum)(x8))[0, -1].tolist())


if __name__ == "__main__":
    main()
