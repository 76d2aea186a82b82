"""Pallas candidate-select kernel for the hybrid match-finder.

Sits between sort1 and sort2 of ops/match_finder.py: given the hash-sorted
keys and the two prefix-word payloads, evaluates the depth-dd sorted
neighbours and picks the best candidate distance per record — ~40
elementwise passes in v2's XLA form, one VMEM-resident kernel here.

The sorted arrays are [B, n] reshaped to [S, 128] tiles per block; the
"dd-back neighbour" is a shift along the linear index, realized as a lane
roll combined with a sublane roll for the lanes that cross the tile row
boundary (pltpu.roll takes non-negative shifts only).

Runs on TPU; the XLA path in match_finder stays as the fallback for
non-TPU platforms (the CPU test mesh) and is the reference implementation
the kernel is tested against (tests/test_match_finder.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

L = 128


def _shift_right_lin(v, dd: int, fill, S: int):
    """value at linear index i <- index i-dd (first dd entries = fill)."""
    from jax.experimental.pallas import tpu as pltpu

    cols = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    lane = pltpu.roll(v, shift=dd, axis=1)          # i-dd same row
    both = pltpu.roll(lane, shift=1, axis=0)        # i-dd previous row
    out = jnp.where(cols >= dd, lane, both)
    lin = rows * L + cols
    return jnp.where(lin >= dd, out, fill)


def _mk_kernel(S: int, depth: int):
    _INV = -1  # INVALID key 0xFFFFFFFF viewed as int32

    def kernel(sk_ref, sb4_ref, sb4b_ref, out_ref):
        sk = sk_ref[0]
        sb4 = sb4_ref[0]
        sb4b = sb4b_ref[0]
        cur_pos = sk & 0xFFFF
        cur_h = jax.lax.shift_right_logical(sk, 16)
        cur_ok = sk != _INV
        best8 = jnp.zeros((S, L), jnp.int32)
        best4 = jnp.zeros((S, L), jnp.int32)
        best3 = jnp.zeros((S, L), jnp.int32)
        for dd in range(1, depth + 1):
            ck = _shift_right_lin(sk, dd, _INV, S)
            cb4 = _shift_right_lin(sb4, dd, 0, S)
            cb4b = _shift_right_lin(sb4b, dd, 0, S)
            cpos = ck & 0xFFFF
            dist = cur_pos - cpos
            ok = (cur_ok & (ck != _INV)
                  & (jax.lax.shift_right_logical(ck, 16) == cur_h)
                  & (dist >= 1) & (dist <= 32767))
            eq4 = ok & (cb4 == sb4)
            eq8 = eq4 & (cb4b == sb4b)
            eq3 = ok & (((cb4 ^ sb4) & 0xFFFFFF) == 0)
            best8 = jnp.where((best8 == 0) & eq8, dist, best8)
            best4 = jnp.where((best4 == 0) & eq4, dist, best4)
            best3 = jnp.where((best3 == 0) & eq3, dist, best3)
        best3 = jnp.where(best3 < 4096, best3, 0)
        dist_best = jnp.where(best8 > 0, best8,
                              jnp.where(best4 > 0, best4, best3))
        # key2/payload packing for sort2 happens in the caller; emit dist
        out_ref[0] = dist_best

    return kernel


@functools.partial(jax.jit, static_argnames=("depth", "interpret"))
def select_candidates(sk, sb4, sb4b, depth: int = 4,
                      interpret: bool = False):
    """sk/sb4/sb4b: uint32[B, n] sorted arrays (n multiple of 128*8 pow2).
    Returns int32[B, n] best candidate distance per sorted record."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = sk.shape
    S = n // L
    spec = pl.BlockSpec((1, S, L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mk_kernel(S, depth),
        out_shape=jax.ShapeDtypeStruct((B, S, L), jnp.int32),
        grid=(B,),
        in_specs=[spec] * 3,
        out_specs=spec,
        interpret=interpret,
    )(sk.astype(jnp.int32).reshape(B, S, L),
      sb4.astype(jnp.int32).reshape(B, S, L),
      sb4b.astype(jnp.int32).reshape(B, S, L))
    return out.reshape(B, n)
