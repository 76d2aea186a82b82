"""Merge-tree bitstream packer (JAX, per block, vmappable) — gather-free.

The scatter-add packer (ops/bitpack.py) costs ~40ms per 1M fields on TPU
because XLA scatters serialize.  This packer assembles the bitstream with a
binary merge tree instead: each position holds one fused field of up to 48
bits; adjacent buffers are concatenated by (a) an elementwise per-lane
bit-shift and (b) a variable word-offset roll decomposed into log2(W)
masked static rolls.  Everything is VPU-friendly: elementwise ops and
static shifts only — no gather, no scatter, no sort.

Bit order matches DEFLATE: LSB-first; bit i of the stream is word[i>>5]
bit (i & 31).

Capacity invariant: any window of 2^s positions emits at most
16·2^s + 33 bits (literals are <= 15 bits; a 48-bit match-start field
covers >= 3 positions, so the amortized rate is <= 16 bits/position with
a 33-bit boundary term), so level buffers are sized
W(s) = ceil((16·2^s + 33)/32) + 1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _level_words(s: int) -> int:
    return (16 * (1 << s) + 33 + 31) // 32 + 1


def _shift_words(buf: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift words toward higher indices by static k, zero-filling."""
    if k == 0:
        return buf
    pad = [(0, 0)] * (buf.ndim - 1) + [(k, 0)]
    return jnp.pad(buf, pad)[..., : buf.shape[-1]]


def _place(buf: jnp.ndarray, bit_offset: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """Shift each lane's bitstream left by bit_offset (int32 per lane).

    buf: uint32[L, W] -> uint32[L, out_w]; bit_offset[L] in [0, 32*out_w).
    """
    w = buf.shape[-1]
    if out_w > w:
        buf = jnp.pad(buf, [(0, 0)] * (buf.ndim - 1) + [(0, out_w - w)])
    bo = (bit_offset & 31).astype(jnp.uint32)[..., None]
    prev = _shift_words(buf, 1)
    # (x >> 32) is undefined; guard bo == 0
    carry = jnp.where(bo == 0, jnp.uint32(0),
                      prev >> (jnp.uint32(32) - bo))
    buf = (buf << bo) | carry
    word_off = (bit_offset >> 5).astype(jnp.int32)
    k = 1
    while k < out_w:
        shifted = _shift_words(buf, k)
        buf = jnp.where(((word_off[..., None] >> _log2(k)) & 1) == 1,
                        shifted, buf)
        k <<= 1
    return buf


def _log2(k: int) -> int:
    return k.bit_length() - 1


def tree_pack(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray):
    """Pack F fused fields (F a power of two) into one bitstream.

    lo/hi: uint32[F] — low/high value bits (bits >= nbits must be zero;
    masked here for safety).  nbits: int32[F] in [0, 48].

    Returns (words uint32[W_top], total_bits int32) where
    W_top = _level_words(log2(F)).
    """
    f = lo.shape[-1]
    s_top = _log2(f)
    assert (1 << s_top) == f, "field count must be a power of two"

    nb = nbits.astype(jnp.int32)
    mask_lo = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF),
                        (jnp.uint32(1) << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    hi_bits = jnp.clip(nb - 32, 0, 31).astype(jnp.uint32)
    mask_hi = jnp.where(nb >= 64, jnp.uint32(0xFFFFFFFF),
                        (jnp.uint32(1) << hi_bits) - 1)
    lo = lo.astype(jnp.uint32) & mask_lo
    hi = hi.astype(jnp.uint32) & jnp.where(nb > 32, mask_hi, 0)

    # level 0 -> 1 fused: merge adjacent (lo,hi,bits) pairs into 3-word
    # buffers (two 48-bit fields <= 96 bits)
    l_lo, r_lo = lo[0::2], lo[1::2]
    l_hi, r_hi = hi[0::2], hi[1::2]
    l_nb, r_nb = nb[0::2], nb[1::2]
    right = jnp.stack([r_lo, r_hi, jnp.zeros_like(r_lo)], axis=-1)
    w1 = max(_level_words(1), 3)
    placed = _place(right, l_nb, w1)
    left = jnp.stack([l_lo, l_hi] + [jnp.zeros_like(l_lo)] * (w1 - 2),
                     axis=-1)
    buf = left | placed
    bits = l_nb + r_nb

    for s in range(2, s_top + 1):
        l_buf, r_buf = buf[0::2], buf[1::2]
        l_bits, r_bits = bits[0::2], bits[1::2]
        w_out = _level_words(s)
        placed = _place(r_buf, l_bits, w_out)
        if w_out > l_buf.shape[-1]:
            l_buf = jnp.pad(l_buf, [(0, 0)] * (l_buf.ndim - 1)
                            + [(0, w_out - l_buf.shape[-1])])
        buf = l_buf | placed
        bits = l_bits + r_bits

    return buf[0], bits[0]


@functools.partial(jax.jit, static_argnames=())
def tree_pack_blocks(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray):
    """Batched tree_pack: lo/hi uint32[B, F], nbits int32[B, F]."""
    return jax.vmap(tree_pack)(lo, hi, nbits)
