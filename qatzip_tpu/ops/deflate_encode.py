"""DEFLATE block encoder on device (JAX; the TPU analog of the QAT
compression engine's deflate path).

Each hw_buff_sz chunk becomes one deflate block; blocks are batch-encoded
fully vectorized: LZ77 (ops/lz77.py), per-block histograms, on-device
dynamic-Huffman construction (ops/huffman.py), static/dynamic/stored
auto-selection (the CPA auto-select-best behavior, reference
src/qatzip_utils.c:284-285), and prefix-sum bit packing (ops/bitpack.py).

The dynamic header always transmits full code-length tables (HLIT=29,
HDIST=29, HCLEN=15, no 16/17/18 run-length symbols) — a few dozen bytes of
header per 64KB block traded for fully static shapes on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops import deflate_tables as T
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.huffman import assign_code_lengths, canonical_codes_reversed
from qatzip_tpu.ops.lz77 import find_matches, greedy_select

MODE_DYNAMIC = 0
MODE_STATIC = 1
MODE_STORED = 2

_NUM_HEADER_FIELDS = 1 + 3 + 19 + 316  # combined first field + hlit/hdist/hclen

# constant tables as jnp (captured by the jitted encoder)
_LENGTH_CODE = jnp.asarray(T.LENGTH_CODE)
_LENGTH_EB = jnp.asarray(T.LENGTH_EXTRA_BITS)
_LENGTH_EV = jnp.asarray(T.LENGTH_EXTRA_VAL)
_DIST_CODE = jnp.asarray(T.DIST_CODE)
_DIST_EB = jnp.asarray(T.DIST_EXTRA_BITS)
_DIST_EV = jnp.asarray(T.DIST_EXTRA_VAL)
_STATIC_LL_LEN = jnp.asarray(T.STATIC_LITLEN_LEN)
_STATIC_LL_CODE = jnp.asarray(T.STATIC_LITLEN_CODE_REV)
_STATIC_D_LEN = jnp.asarray(np.concatenate([T.STATIC_DIST_LEN,
                                            np.zeros(2, np.int32)]))[:30]
_STATIC_D_CODE = jnp.asarray(np.concatenate([T.STATIC_DIST_CODE_REV,
                                             np.zeros(2, np.int32)]))[:30]
_CL_ORDER = jnp.asarray(T.CLCODE_ORDER)


def words_bound(n: int) -> int:
    """Output words per block: static-mode worst case plus slack."""
    return (9 * n + n // 4 + 8192) // 32


def _encode_one(data_pad: jnp.ndarray, length: jnp.ndarray, depth: int,
                kwords: int, allow_dynamic: bool, m_words: int):
    n = data_pad.shape[0] - 8
    lit = data_pad[:n].astype(jnp.int32)

    mlen, mdist = find_matches(data_pad, length, depth=depth,
                               max_match_words=kwords)
    sel, take = greedy_select(mlen, mdist, length)

    len_code = _LENGTH_CODE[mlen]
    len_eb = _LENGTH_EB[mlen]
    len_ev = _LENGTH_EV[mlen]
    d_code = _DIST_CODE[mdist]
    d_eb = _DIST_EB[mdist]
    d_ev = _DIST_EV[mdist]

    sym = jnp.where(take, len_code, lit)           # litlen symbol per position
    seli = sel.astype(jnp.int32)
    takei = (sel & take).astype(jnp.int32)

    freq_ll = jnp.zeros(286, jnp.int32).at[jnp.clip(sym, 0, 285)].add(seli)
    freq_ll = freq_ll.at[256].add(1)               # EOB
    freq_d = jnp.zeros(30, jnp.int32).at[jnp.clip(d_code, 0, 29)].add(takei)

    # --- dynamic Huffman tables
    ll_len = assign_code_lengths(freq_ll, 15)
    d_len = assign_code_lengths(freq_d, 15)
    ll_code = canonical_codes_reversed(ll_len, 15)
    d_code_tbl = canonical_codes_reversed(d_len, 15)

    all_lengths = jnp.concatenate([ll_len, d_len])  # [316]
    freq_cl = jnp.zeros(19, jnp.int32).at[all_lengths].add(1)
    cl_len = assign_code_lengths(freq_cl, 7)
    cl_code = canonical_codes_reversed(cl_len, 7)

    # --- bit costs
    def sym_bits(ll_l, d_l):
        per_pos = jnp.where(
            take,
            ll_l[jnp.clip(len_code, 0, 285)] + len_eb
            + d_l[jnp.clip(d_code, 0, 29)] + d_eb,
            ll_l[jnp.clip(lit, 0, 285)])
        return jnp.sum(per_pos * seli) + ll_l[256]

    dyn_hdr_bits = (3 + 5 + 5 + 4 + 19 * 3
                    + jnp.sum(cl_len[all_lengths]))
    dyn_bits = dyn_hdr_bits + sym_bits(ll_len, d_len)
    # static tables are 288-wide; slice for cost helper compatibility
    static_bits = 3 + sym_bits(_STATIC_LL_LEN[:286], _STATIC_D_LEN)
    stored_bits = 40 + 8 * length

    dyn_ok = jnp.bool_(allow_dynamic)
    dyn_cost = jnp.where(dyn_ok, dyn_bits, jnp.int32(1 << 30))
    costs = jnp.stack([dyn_cost, static_bits, stored_bits])
    mode = jnp.argmin(costs).astype(jnp.int32)

    use_dyn = mode == MODE_DYNAMIC

    # --- choose emission tables (per-block scalar select)
    emit_ll_len = jnp.where(use_dyn, ll_len, _STATIC_LL_LEN[:286])
    emit_ll_code = jnp.where(use_dyn, ll_code, _STATIC_LL_CODE[:286])
    emit_d_len = jnp.where(use_dyn, d_len, _STATIC_D_LEN)
    emit_d_code = jnp.where(use_dyn, d_code_tbl, _STATIC_D_CODE)

    # --- header fields
    first_val = jnp.where(use_dyn, 5, 3)   # BFINAL=1 | BTYPE<<1 (10b or 01b)
    hv = jnp.concatenate([
        jnp.stack([first_val, jnp.int32(29), jnp.int32(29), jnp.int32(15)]),
        cl_len[_CL_ORDER],
        cl_code[all_lengths],
    ])
    hn = jnp.concatenate([
        jnp.array([3, 5, 5, 4], jnp.int32),
        jnp.full((19,), 3, jnp.int32),
        cl_len[all_lengths],
    ])
    # static/stored mode: only the first 3-bit field remains
    keep = jnp.arange(_NUM_HEADER_FIELDS) == 0
    hv = jnp.where(use_dyn, hv, jnp.where(keep, hv, 0))
    hn = jnp.where(use_dyn, hn, jnp.where(keep, hn, 0))

    # --- symbol fields (4 per position, interleaved in stream order)
    c0v = jnp.where(sel, emit_ll_code[jnp.clip(sym, 0, 285)], 0)
    c0n = jnp.where(sel, emit_ll_len[jnp.clip(sym, 0, 285)], 0)
    c1v = jnp.where(sel & take, len_ev, 0)
    c1n = jnp.where(sel & take, len_eb, 0)
    c2v = jnp.where(sel & take, emit_d_code[jnp.clip(d_code, 0, 29)], 0)
    c2n = jnp.where(sel & take, emit_d_len[jnp.clip(d_code, 0, 29)], 0)
    c3v = jnp.where(sel & take, d_ev, 0)
    c3n = jnp.where(sel & take, d_eb, 0)
    sym_v = jnp.stack([c0v, c1v, c2v, c3v], axis=1).reshape(-1)
    sym_n = jnp.stack([c0n, c1n, c2n, c3n], axis=1).reshape(-1)

    eob_v = emit_ll_code[256][None]
    eob_n = emit_ll_len[256][None]

    values = jnp.concatenate([hv, sym_v, eob_v])
    nbits = jnp.concatenate([hn, sym_n, eob_n])

    words, total_bits = pack_fields(values, nbits, m_words)
    return words, total_bits, mode


@functools.partial(jax.jit,
                   static_argnames=("depth", "kwords", "allow_dynamic",
                                    "m_words"))
def encode_blocks(data_pad: jnp.ndarray, lengths: jnp.ndarray, depth: int,
                  kwords: int, allow_dynamic: bool, m_words: int):
    """data_pad: uint8[B, N+8] zero-padded blocks; lengths: int32[B].

    Returns (words uint32[B, m_words], bits int32[B], mode int32[B]).
    """
    fn = functools.partial(_encode_one, depth=depth, kwords=kwords,
                           allow_dynamic=allow_dynamic, m_words=m_words)
    return jax.vmap(fn)(data_pad, lengths)


def level_params(level: int) -> tuple[int, int]:
    """Map compression level to (search depth, match words) — the analog of
    the reference's level->HW-search-depth table (README.md:133-148)."""
    if level <= 3:
        return 1, 16
    if level <= 6:
        return 4, 32
    return 8, 64
