"""On-device canonical Huffman construction (JAX, vmappable, jit-friendly).

Replaces the QAT ASIC's dynamic-Huffman header generation.  Code lengths are
assigned by integer ceil-log2 with two bounded repair loops that make the
Kraft sum exactly 2^max_len (deflate requires complete codes); the result is
a valid — near-optimal — length-limited prefix code without any sequential
tree build, so the whole pipeline stays on device.

Optimality note: ceil-log2 lengths are within 1 bit/symbol of Huffman; the
repair loops only move lengths toward completeness.  Block-mode selection
(stored/static/dynamic, deflate_encode.py) bounds any regression.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def assign_code_lengths(freqs: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """freqs: int32[n] symbol frequencies -> int32[n] code lengths (0=unused).

    Guarantees: lengths in [1, max_len] for used symbols, >=2 used symbols
    (phantoms added if needed), and sum(2^(max_len - l)) == 2^max_len.
    """
    n = freqs.shape[0]
    used_count = jnp.sum((freqs > 0).astype(jnp.int32))
    # guarantee >=2 used symbols so a complete code exists
    phantom = jnp.zeros(n, dtype=jnp.int32).at[0].set(1).at[1].set(1)
    freqs = jnp.where(used_count >= 2, freqs, freqs + phantom)
    used = freqs > 0
    total = jnp.sum(freqs)

    # l_i = min{l : freq_i * 2^l >= total} computed via thresholds
    # t_l = ceil(total / 2^l) to stay inside int32
    levels = jnp.arange(max_len + 1, dtype=jnp.int32)
    t = (total + (1 << levels) - 1) >> levels          # [max_len+1]
    cond = freqs[:, None] >= t[None, :]                 # [n, max_len+1]
    l = jnp.sum(~cond, axis=1).astype(jnp.int32)        # first l with cond
    l = jnp.clip(l, 1, max_len)
    l = jnp.where(used, l, 0)

    kraft_target = 1 << max_len

    def kraft_sum(lengths):
        return jnp.sum(jnp.where(lengths > 0,
                                 1 << (max_len - lengths), 0))

    # --- repair overfull: lengthen the shortest code until S <= 2^max_len
    def over_cond(state):
        lengths, s = state
        return s > kraft_target

    def over_body(state):
        lengths, s = state
        cand = jnp.where((lengths > 0) & (lengths < max_len), lengths,
                         jnp.int32(max_len + 1))
        i = jnp.argmin(cand)
        dec = 1 << (max_len - lengths[i] - 1)
        lengths = lengths.at[i].add(1)
        return lengths, s - dec

    l, s = jax.lax.while_loop(over_cond, over_body, (l, kraft_sum(l)))

    # --- repair underfull: shorten the longest affordable code to exactness
    def under_cond(state):
        lengths, s = state
        return s < kraft_target

    def under_body(state):
        lengths, s = state
        add = kraft_target - s
        inc = jnp.where(lengths > 1, 1 << (max_len - lengths), 0)
        affordable = (inc > 0) & (inc <= add)
        cand = jnp.where(affordable, lengths, jnp.int32(-1))
        i = jnp.argmax(cand)
        gain = 1 << (max_len - lengths[i])
        lengths = lengths.at[i].add(-1)
        return lengths, s + gain

    l, _ = jax.lax.while_loop(under_cond, under_body, (l, s))
    return l


def canonical_codes_reversed(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Canonical code values, bit-reversed for LSB-first deflate emission."""
    n = lengths.shape[0]
    # bl_count[l] = number of codes of length l
    bl_count = jnp.zeros(max_len + 1, dtype=jnp.int32)
    bl_count = bl_count.at[jnp.clip(lengths, 0, max_len)].add(
        (lengths > 0).astype(jnp.int32))
    # next_code[l] = (next_code[l-1] + bl_count[l-1]) << 1 — compute by scan
    def nc_body(carry, x):
        code = (carry + x) << 1
        return code, code

    _, codes_per_len = jax.lax.scan(
        nc_body, jnp.int32(0),
        jnp.concatenate([jnp.zeros(1, jnp.int32), bl_count[:-1]]))
    # codes_per_len[l] = first canonical code of length l (for l>=1 at index l)

    # rank of each symbol within its length class (symbol order)
    def rank_body(lvl, ranks):
        mask = lengths == lvl
        r = jnp.cumsum(mask.astype(jnp.int32)) - 1
        return jnp.where(mask, r, ranks)

    ranks = jax.lax.fori_loop(1, max_len + 1, rank_body,
                              jnp.zeros(n, dtype=jnp.int32))

    first = codes_per_len[jnp.clip(lengths, 0, max_len)]
    codes = jnp.where(lengths > 0, first + ranks, 0)

    # bit-reverse each code over its length
    def rev_body(_, state):
        rev, tmp = state
        return (rev << 1) | (tmp & 1), tmp >> 1

    rev, _ = jax.lax.fori_loop(0, max_len, rev_body,
                               (jnp.zeros_like(codes), codes))
    # rev holds the code reversed within max_len bits; shift out padding
    rev = rev >> (max_len - jnp.where(lengths > 0, lengths, max_len))
    return jnp.where(lengths > 0, rev, 0)
