"""Probe 3: isolate the device bitonic mis-sort — test rolls on axes and
small sorts against numpy."""
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
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def pallas_roll(x, shift, axis):
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=shift, axis=axis)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for (S, shift, axis) in [(16, 1, 0), (16, 4, 0), (512, 1, 0),
                             (512, 64, 0), (512, 256, 0), (512, 448, 0),
                             (8, 32, 1), (8, 96, 1), (8, 127, 1)]:
        x = jnp.asarray(rng.integers(0, 1 << 30, (S, 128), dtype=np.int32))
        def chk(x=x, shift=shift, axis=axis):
            got = np.asarray(jax.jit(lambda a: pallas_roll(a, shift, axis))(x))
            want = np.roll(np.asarray(x), shift, axis=axis)
            return f"match={bool((got == want).all())}"
        report(f"roll S={S} shift={shift} axis={axis}", chk)

    # small bitonic n=1024 on [8,128]
    S, L = 8, 128

    def k_bitonic(x_ref, o_ref):
        v = x_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        lin = rows * L + cols
        n = S * L
        k = 2
        while k <= n:
            j = k // 2
            while j >= 1:
                if j < L:
                    up = pltpu.roll(v, shift=L - j, axis=1)
                    dn = pltpu.roll(v, shift=j, axis=1)
                else:
                    r = j // L
                    up = pltpu.roll(v, shift=S - r, axis=0)
                    dn = pltpu.roll(v, shift=r, axis=0)
                bit = (lin & j) != 0
                partner = jnp.where(bit, dn, up)
                asc = (lin & k) == 0
                want_min = bit == jnp.logical_not(asc)
                chosen = jnp.where(want_min, partner < v, partner > v)
                v = jnp.where(chosen, partner, v)
                j //= 2
            k *= 2
        o_ref[:] = v

    def p_bitonic(x):
        return pl.pallas_call(
            k_bitonic, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    x = jnp.asarray(rng.integers(0, 1 << 30, (S, L), dtype=np.int32))
    def chk_sort():
        got = np.asarray(jax.jit(p_bitonic)(x)).reshape(-1)
        want = np.sort(np.asarray(x).reshape(-1))
        n_mismatch = int((got != want).sum())
        first = int(np.argmax(got != want)) if n_mismatch else -1
        return f"mismatches={n_mismatch} first={first}"
    report("bitonic1024", chk_sort)

    # same but only lane strides (n=128 per row, 8 independent rows)
    def k_bitonic_rows(x_ref, o_ref):
        v = x_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
        n = L
        k = 2
        while k <= n:
            j = k // 2
            while j >= 1:
                up = pltpu.roll(v, shift=L - j, axis=1)
                dn = pltpu.roll(v, shift=j, axis=1)
                bit = (cols & j) != 0
                partner = jnp.where(bit, dn, up)
                asc = (cols & k) == 0
                want_min = bit == jnp.logical_not(asc)
                chosen = jnp.where(want_min, partner < v, partner > v)
                v = jnp.where(chosen, partner, v)
                j //= 2
            k *= 2
        o_ref[:] = v

    def p_rows(x):
        return pl.pallas_call(
            k_bitonic_rows, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    def chk_rows():
        got = np.asarray(jax.jit(p_rows)(x))
        want = np.sort(np.asarray(x), axis=1)
        return f"mismatches={int((got != want).sum())}"
    report("bitonic_rows128", chk_rows)

    # sublane strides only: sort each column of [8,128] (n=8 per column)
    def k_bitonic_cols(x_ref, o_ref):
        v = x_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        k = 2
        while k <= S:
            j = k // 2
            while j >= 1:
                up = pltpu.roll(v, shift=S - j, axis=0)
                dn = pltpu.roll(v, shift=j, axis=0)
                bit = (rows & j) != 0
                partner = jnp.where(bit, dn, up)
                asc = (rows & k) == 0
                want_min = bit == jnp.logical_not(asc)
                chosen = jnp.where(want_min, partner < v, partner > v)
                v = jnp.where(chosen, partner, v)
                j //= 2
            k *= 2
        o_ref[:] = v

    def p_cols(x):
        return pl.pallas_call(
            k_bitonic_cols, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    def chk_cols():
        got = np.asarray(jax.jit(p_cols)(x))
        want = np.sort(np.asarray(x), axis=0)
        return f"mismatches={int((got != want).sum())}"
    report("bitonic_cols8", chk_cols)


if __name__ == "__main__":
    main()
