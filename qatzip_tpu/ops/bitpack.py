"""Prefix-sum bitstream packer (JAX, per block, vmappable).

Deflate packs fields LSB-first.  Each field is (value, nbits<=16); field bit
offsets come from an exclusive prefix sum, and every field contributes to at
most two 32-bit words via scatter-add (contributions to a word occupy
disjoint bit ranges, so integer add == bitwise or).
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_fields(values: jnp.ndarray, nbits: jnp.ndarray, m_words: int):
    """values/nbits: int32[F] (values must fit in nbits; nbits==0 => no-op).

    Returns (words uint32[m_words], total_bits int32).
    """
    nb = nbits.astype(jnp.int32)
    off = jnp.cumsum(nb) - nb            # exclusive prefix sum
    total_bits = off[-1] + nb[-1]

    v = values.astype(jnp.uint32)
    v = jnp.where(nb > 0, v, 0)
    word_idx = (off >> 5).astype(jnp.int32)
    bit = (off & 31).astype(jnp.uint32)

    lo = v << bit                         # uint32 wraparound keeps low part
    hi = jnp.where(bit == 0, jnp.uint32(0), v >> (jnp.uint32(32) - bit))

    words = jnp.zeros(m_words + 1, dtype=jnp.uint32)
    safe_lo = jnp.clip(word_idx, 0, m_words)
    safe_hi = jnp.clip(word_idx + 1, 0, m_words)
    words = words.at[safe_lo].add(lo)
    words = words.at[safe_hi].add(hi)
    return words[:m_words], total_bits
