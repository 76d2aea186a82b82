"""In-VMEM bitonic sort Pallas kernels — the first "ASIC" kernels.

The encoder/decoder pipelines are built on per-64KB-block sorts of u32
keys (SURVEY.md §7 hard-part (a); the role the QAT ASIC's hardware LZ77
unit plays at reference src/qatzip.c:1542).  XLA's sort lowers to a
bitonic network over HBM — every compare-exchange pass round-trips the
full array through HBM, ~136 passes for 64K elements.  These kernels keep
the whole block resident in VMEM for all passes, so HBM traffic drops to
one read + one write per block and the passes run at VPU speed.

Layout: a block of n = S*128 elements lives as [S, 128] int32 in VMEM with
linear index lin = row*128 + col.  A compare-exchange at stride 2^j is a
cyclic roll (lanes for strides < 128, sublanes otherwise) plus a select —
`pltpu.roll` only accepts non-negative shifts, so the "up" partner rolls
by (size - stride).

Keys are uint32 order; Mosaic compares int32, so keys are bias-flipped
(xor 0x80000000) on entry and exit.  Payload variants move payload lanes
with the key decision; keys must be unique for payload routing (ours pack
the position into the low bits, so they are).

On non-TPU platforms (the CPU test mesh) callers get a jnp.sort/lax.sort
fallback — same contract, XLA implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

L = 128  # lane count (fixed by hardware)

_SIGN = jnp.int32(-0x80000000)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _ce_indices(S: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    return rows * L + cols


def _partner(v, S: int, stride: int, bit):
    from jax.experimental.pallas import tpu as pltpu

    if stride < L:
        up = pltpu.roll(v, shift=L - stride, axis=1)
        dn = pltpu.roll(v, shift=stride, axis=1)
    else:
        r = stride // L
        up = pltpu.roll(v, shift=S - r, axis=0)
        dn = pltpu.roll(v, shift=r, axis=0)
    return jnp.where(bit, dn, up)


def _bitonic_body(v, pays, S: int):
    """Full ascending bitonic sort of v (int32 order) with payloads."""
    lin = _ce_indices(S)
    n = S * L
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            bit = (lin & j) != 0
            pv = _partner(v, S, j, bit)
            asc = (lin & k) == 0
            want_min = bit == jnp.logical_not(asc)
            # chosen=True -> this slot takes the partner's record
            chosen = jnp.where(want_min, pv < v, pv > v)
            new_v = jnp.where(chosen, pv, v)
            new_pays = []
            for p in pays:
                pp = _partner(p, S, j, bit)
                new_pays.append(jnp.where(chosen, pp, p))
            v, pays = new_v, new_pays
            j //= 2
        k *= 2
    return v, pays


def _mk_kernel(S: int, npay: int):
    def kernel(*refs):
        in_refs = refs[: 1 + npay]
        out_refs = refs[1 + npay:]
        v = in_refs[0][0] ^ _SIGN  # uint32 order as int32
        pays = [r[0] for r in in_refs[1:]]
        v, pays = _bitonic_body(v, pays, S)
        out_refs[0][0] = v ^ _SIGN
        for r, p in zip(out_refs[1:], pays):
            r[0] = p
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort_pallas(keys, *pays, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, _ = keys.shape
    npay = len(pays)
    kern = _mk_kernel(S, npay)
    spec = pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shapes = tuple(jax.ShapeDtypeStruct((B, S, L), jnp.int32)
                   for _ in range(1 + npay))
    outs = pl.pallas_call(
        kern,
        out_shape=shapes,
        grid=(B,),
        in_specs=[spec] * (1 + npay),
        out_specs=tuple([spec] * (1 + npay)),
        interpret=interpret,
    )(keys.astype(jnp.int32),
      *[p.astype(jnp.int32) for p in pays])
    return outs


def sort_u32(keys: jnp.ndarray, *pays: jnp.ndarray, force_xla: bool = False,
             interpret: bool = False):
    """Ascending sort of uint32 keys [B, n] (n = pow2 multiple of 128*8)
    with same-permutation uint32 payloads.  Returns (keys, *pays) sorted.

    Pallas in-VMEM bitonic on TPU; lax.sort elsewhere.  Keys must be
    unique when payloads are passed.
    """
    B, n = keys.shape
    use_pallas = (not force_xla) and (interpret or _on_tpu()) \
        and n % (8 * L) == 0 and (n & (n - 1)) == 0
    if not use_pallas:
        if pays:
            res = jax.lax.sort((keys,) + tuple(pays), num_keys=1,
                               is_stable=False)
            return res
        return (jnp.sort(keys, axis=-1),)
    S = n // L
    outs = _sort_pallas(keys.reshape(B, S, L),
                        *[p.reshape(B, S, L) for p in pays],
                        interpret=interpret)
    return tuple(o.reshape(B, n).astype(jnp.uint32) for o in outs)
