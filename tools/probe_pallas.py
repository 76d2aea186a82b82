"""Probe Pallas capability + primitive costs on the attached device.

Run on the real chip (no JAX_PLATFORMS override).  Each probe is
independent and failure-isolated so one unsupported op doesn't hide the
rest.  Results drive the kernel designs in qatzip_tpu/ops/pallas_*.py.
"""
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def report(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        dt = time.perf_counter() - t0
        print(f"OK   {name}: {out} ({dt:.2f}s)", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)


def timeit(f, *args, n=5):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
        r = r[0] if isinstance(r, tuple) else r
    r.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    plat = jax.devices()[0].platform
    print("platform:", plat, flush=True)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # 1. minimal elementwise kernel
    def k_double(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    def p_double(x):
        return pl.pallas_call(
            k_double,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    report("minimal", lambda: np.asarray(jax.jit(p_double)(x))[0, :3].tolist())

    # 2. roll along lanes inside kernel
    def k_roll(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=1, axis=1)

    def p_roll(x):
        return pl.pallas_call(
            k_roll,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    report("roll_lane", lambda: np.asarray(jax.jit(p_roll)(x))[0, :3].tolist())

    # 3. dynamic vector gather from a VMEM table (take_along_axis on lanes)
    def k_gather(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

    def p_gather(tbl, idx):
        return pl.pallas_call(
            k_gather,
            out_shape=jax.ShapeDtypeStruct(idx.shape, tbl.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbl, idx)

    tbl = jnp.tile(jnp.arange(128, dtype=jnp.int32)[None, :] * 10, (8, 1))
    idx = jnp.tile(jnp.array([[5, 3] + [0] * 126], jnp.int32), (8, 1))
    report("gather_lane128",
           lambda: np.asarray(jax.jit(p_gather)(tbl, idx))[0, :3].tolist())

    # 3b. gather from wide table (1024 lanes) via take_along_axis
    tblw = jnp.tile(jnp.arange(1024, dtype=jnp.int32)[None, :], (8, 1))
    idxw = jnp.tile(jnp.array([[1000, 512] + [0] * 1022], jnp.int32), (8, 1))
    report("gather_lane1024",
           lambda: np.asarray(jax.jit(p_gather)(tblw, idxw))[0, :3].tolist())

    # 4. scalar fori_loop with dynamic VMEM indexing (serial walk cost)
    def k_walk(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[acc % 8, i % 128]
        o_ref[0, 0] = jax.lax.fori_loop(0, 4096, body, 0)

    def p_walk(x):
        return pl.pallas_call(
            k_walk,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    report("scalar_walk_4096", lambda: np.asarray(jax.jit(p_walk)(x)).tolist())
    try:
        dt = timeit(jax.jit(p_walk), x)
        print(f"TIME scalar_walk: {dt*1e9/4096:.1f} ns/step", flush=True)
    except Exception as e:
        print("FAIL scalar_walk timing:", e, flush=True)

    # 5. bitonic-style compare-exchange pass over [512,128] in VMEM, all
    #    stages fused in one kernel: estimates full in-VMEM sort cost.
    def k_bitonic(x_ref, o_ref):
        v = x_ref[:]
        n_total = 512 * 128
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
        lin = rows * 128 + cols

        def ce(v, stride, direction_bit):
            # partner = lin ^ stride, via rolls
            if stride < 128:
                up = pltpu.roll(v, shift=-stride, axis=1)
                dn = pltpu.roll(v, shift=stride, axis=1)
            else:
                up = pltpu.roll(v, shift=-(stride // 128), axis=0)
                dn = pltpu.roll(v, shift=stride // 128, axis=0)
            bit = (lin & stride) != 0
            partner = jnp.where(bit, dn, up)
            asc = ((lin & direction_bit) == 0)
            lo = jnp.minimum(v, partner)
            hi = jnp.maximum(v, partner)
            want_min = jnp.logical_xor(bit, jnp.logical_not(asc))
            return jnp.where(want_min, lo, hi)

        # full bitonic over 65536 elements: 16 stages
        for k in range(1, 17):
            dirbit = 1 << k if k < 16 else 0
            for j in range(k - 1, -1, -1):
                v = ce(v, 1 << j, dirbit if dirbit else (1 << 30))
        o_ref[:] = v

    def p_bitonic(x):
        return pl.pallas_call(
            k_bitonic,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    key = jax.random.PRNGKey(0)
    big = jax.random.randint(key, (512, 128), 0, 1 << 30, dtype=jnp.int32)
    def check_sorted():
        out = np.asarray(jax.jit(p_bitonic)(big)).reshape(-1)
        ok = bool(np.all(np.diff(out) >= 0))
        return f"sorted={ok}"
    report("bitonic_64k", check_sorted)
    try:
        dt = timeit(jax.jit(p_bitonic), big)
        print(f"TIME bitonic 64k elems: {dt*1e3:.2f} ms "
              f"({64*1024*4/dt/1e9:.2f} GB/s of u32 keys)", flush=True)
    except Exception as e:
        print("FAIL bitonic timing:", e, flush=True)

    # 6. XLA jnp.sort baseline on same shape for comparison
    def xs(a):
        return jnp.sort(a.reshape(1, -1), axis=1)
    try:
        dt = timeit(jax.jit(xs), big)
        print(f"TIME xla sort 64k: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print("FAIL xla sort:", e, flush=True)

    # 7. grid pipelining: 32-block grid of the bitonic kernel (2MB batch)
    def p_bitonic_grid(x):
        return pl.pallas_call(
            k_bitonic,
            out_shape=jax.ShapeDtypeStruct((32, 512, 128), jnp.int32),
            grid=(32,),
            in_specs=[pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    def k_bitonic3(x_ref, o_ref):
        # same as k_bitonic but refs are [1,512,128]
        v = x_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
        lin = rows * 128 + cols

        def ce(v, stride, dirbit):
            if stride < 128:
                up = pltpu.roll(v, shift=-stride, axis=1)
                dn = pltpu.roll(v, shift=stride, axis=1)
            else:
                up = pltpu.roll(v, shift=-(stride // 128), axis=0)
                dn = pltpu.roll(v, shift=stride // 128, axis=0)
            bit = (lin & stride) != 0
            partner = jnp.where(bit, dn, up)
            asc = ((lin & dirbit) == 0)
            lo = jnp.minimum(v, partner)
            hi = jnp.maximum(v, partner)
            want_min = jnp.logical_xor(bit, jnp.logical_not(asc))
            return jnp.where(want_min, lo, hi)

        for k in range(1, 17):
            dirbit = 1 << k if k < 16 else (1 << 30)
            for j in range(k - 1, -1, -1):
                v = ce(v, 1 << j, dirbit)
        o_ref[0] = v

    def p_bitonic_grid2(x):
        return pl.pallas_call(
            k_bitonic3,
            out_shape=jax.ShapeDtypeStruct((32, 512, 128), jnp.int32),
            grid=(32,),
            in_specs=[pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    big32 = jax.random.randint(key, (32, 512, 128), 0, 1 << 30, dtype=jnp.int32)
    report("bitonic_grid32", lambda: "ok" if np.all(np.diff(
        np.asarray(jax.jit(p_bitonic_grid2)(big32))[5].reshape(-1)) >= 0) else "NOT SORTED")
    try:
        dt = timeit(jax.jit(p_bitonic_grid2), big32)
        print(f"TIME bitonic grid 32x64k (2M keys): {dt*1e3:.2f} ms "
              f"({32*64*1024*4/dt/1e9:.2f} GB/s keys; ~{32*64*1024/dt/1e9:.3f} Gelem/s)",
              flush=True)
    except Exception as e:
        print("FAIL bitonic grid timing:", e, flush=True)

    # 8. one-hot matmul lookup throughput (table lookup via MXU)
    def oh_lookup(idx, tblv):
        oh = (idx[:, :, None] == jnp.arange(1024, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, tblv, (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    idxs = jax.random.randint(key, (512, 1024), 0, 1024, dtype=jnp.int32)
    tblv = jax.random.normal(key, (1024, 2), dtype=jnp.bfloat16)
    try:
        dt = timeit(jax.jit(oh_lookup), idxs, tblv)
        print(f"TIME onehot lookup 512K elems from 1024-table: {dt*1e3:.2f} ms "
              f"({512*1024/dt/1e9:.2f} Gelem/s)", flush=True)
    except Exception as e:
        print("FAIL onehot:", e, flush=True)


if __name__ == "__main__":
    main()
