"""Vectorized LZ77 match finding and greedy parse (JAX, per block, vmappable).

Replaces the QAT ASIC's hash-chain search (the reference's HW search depth
maps from compression level, README.md:133-148) with a sort-based
nearest-previous-occurrence: one (hash,pos) sort per block yields depth-d
hash chains as d-step lookbacks in sorted order.  Match lengths are computed
with packed 4-byte word compares; the greedy cover is resolved with
pointer-doubling reachability — no sequential scan anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HASH_BITS = 15
POS_BITS = 17  # block positions up to 128K
POS_MASK = (1 << POS_BITS) - 1
WINDOW = 32768


def _pack_b4(data_u32: jnp.ndarray, n: int) -> jnp.ndarray:
    """4 little-endian bytes starting at each position; data padded by >=4."""
    return (data_u32[0:n]
            | (data_u32[1:n + 1] << 8)
            | (data_u32[2:n + 2] << 16)
            | (data_u32[3:n + 3] << 24))


def _hash(b4: jnp.ndarray) -> jnp.ndarray:
    return (b4 * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASH_BITS)


@functools.partial(jax.jit, static_argnames=("depth", "max_match_words"))
def find_matches(data: jnp.ndarray, length: jnp.ndarray, depth: int = 1,
                 max_match_words: int = 16):
    """One block. data: uint8[N+8] (zero padded), length: int32 scalar.

    Returns (match_len int32[N], match_dist int32[N]); match_len==0 where no
    usable match (>=4 bytes, distance<=32768) exists.
    """
    n = data.shape[0] - 8
    d32 = data.astype(jnp.uint32)
    b4 = _pack_b4(d32, n)  # uint32[N]
    h = _hash(b4)
    pos = jnp.arange(n, dtype=jnp.uint32)
    valid_pos = pos + 3 < length.astype(jnp.uint32)
    keys = jnp.where(valid_pos, (h << POS_BITS) | pos, jnp.uint32(0xFFFFFFFF))
    skeys = jnp.sort(keys)

    cur_pos = (skeys & POS_MASK).astype(jnp.int32)
    cur_hash = skeys >> POS_BITS

    maxm = jnp.minimum(jnp.int32(258), (length - cur_pos).astype(jnp.int32))
    idx = jnp.arange(n)

    def depth_body(d, state):
        best_len, best_dist = state
        cand = jnp.roll(skeys, d)
        cand_pos = (cand & POS_MASK).astype(jnp.int32)
        cand_hash = cand >> POS_BITS
        ok = ((idx >= d) & (cand_hash == cur_hash)
              & (cand_pos < cur_pos)
              & (cur_pos - cand_pos <= WINDOW))
        mlen = _match_length(b4, cand_pos, cur_pos, maxm, max_match_words)
        mlen = jnp.where(ok, mlen, 0)
        better = mlen > best_len
        dist = cur_pos - cand_pos
        best_len = jnp.where(better, mlen, best_len)
        best_dist = jnp.where(better, dist, best_dist)
        return best_len, best_dist

    best_len, best_dist = jax.lax.fori_loop(
        1, depth + 1, depth_body,
        (jnp.zeros(n, dtype=jnp.int32), jnp.zeros(n, dtype=jnp.int32)))

    # scatter back to position order; each real position appears exactly once
    # in skeys, so the only potential collisions are masked invalid entries.
    # combo packs (len, 32768-dist) so ties prefer the smaller distance.
    safe = jnp.clip(cur_pos, 0, n - 1)
    combo = jnp.where(best_len >= 4,
                      (best_len << 16) | (WINDOW - best_dist), 0)
    out_combo = jnp.zeros(n, dtype=jnp.int32).at[safe].max(combo)
    out_len = out_combo >> 16
    out_dist = jnp.where(out_len > 0, WINDOW - (out_combo & 0xFFFF), 0)
    return out_len, out_dist


def _match_length(b4: jnp.ndarray, j: jnp.ndarray, i: jnp.ndarray,
                  maxm: jnp.ndarray, k_words: int) -> jnp.ndarray:
    """Common-prefix length of data[i:] vs data[j:] in 4-byte granules.

    Compares k_words packed words (max match = 4*k_words), then refines the
    first mismatching word byte-wise; clamps to maxm.
    """
    n = b4.shape[0]

    def body(t, state):
        matched, alive, partial = state
        ii = jnp.clip(i + 4 * t, 0, n - 1)
        jj = jnp.clip(j + 4 * t, 0, n - 1)
        wi = b4[ii]
        wj = b4[jj]
        eq = (wi == wj) & (i + 4 * t + 4 <= n)
        x = wi ^ wj
        p = ((x & 0xFF) == 0).astype(jnp.int32) \
            + ((x & 0xFFFF) == 0).astype(jnp.int32) \
            + ((x & 0xFFFFFF) == 0).astype(jnp.int32)
        first_bad = alive & ~eq
        partial = jnp.where(first_bad, p, partial)
        matched = matched + jnp.where(alive & eq, 4, 0)
        alive = alive & eq
        return matched, alive, partial

    matched, alive, partial = jax.lax.fori_loop(
        0, k_words, body,
        (jnp.zeros(j.shape[0], jnp.int32),
         jnp.ones(j.shape[0], jnp.bool_),
         jnp.zeros(j.shape[0], jnp.int32)))
    total = matched + jnp.where(alive, 0, partial)
    return jnp.minimum(total, maxm)


@jax.jit
def greedy_select(match_len: jnp.ndarray, match_dist: jnp.ndarray,
                  length: jnp.ndarray):
    """Greedy parse via pointer-doubling reachability from position 0.

    Returns (selected bool[N], take_match bool[N]).  selected[i] means a
    symbol is emitted at i (literal or match); take_match[i] means that
    symbol is the match (match_len[i], match_dist[i]).
    """
    n = match_len.shape[0]
    take = match_len >= 4
    step = jnp.where(take, match_len, 1)
    idx = jnp.arange(n, dtype=jnp.int32)
    nxt = jnp.minimum(idx + step, n)
    f = jnp.concatenate([nxt, jnp.array([n], dtype=jnp.int32)])  # f[n] = n

    reach = jnp.zeros(n + 1, dtype=jnp.bool_).at[0].set(True)
    steps = max(1, (n).bit_length())

    def body(_, state):
        reach, f = state
        targets = jnp.where(reach, f, n)
        reach = reach.at[targets].set(True)
        return reach, f[f]

    reach, _ = jax.lax.fori_loop(0, steps, body, (reach, f))
    sel = reach[:n] & (idx < length)
    return sel, sel & take
