"""Gather-free DEFLATE block encoder (v2) — the TPU "compression ASIC".

Replaces ops/deflate_encode.py's design whose hot loops (match-length
gathers, pointer-doubling greedy, scatter packing) serialize on TPU.
Honest on-device profiling (tools/prim_honest2.py) shows sorts at ~1.3ms
and elementwise at ~1ms per 1M positions while any 1M-element gather or
scatter costs ~10ms; v2 therefore uses only sorts, elementwise ops, static
shifts, one-hot MXU lookups, and the merge-tree packer:

  1. match find   — ONE sort of (hash,pos) keys carrying the data itself
                    as payload words, so candidate match lengths come from
                    elementwise payload compares (no gathers); a second
                    sort restores position order (no scatter).
  2. run matches  — distances 1..4 via shift-compare + log-doubling run
                    lengths (captures RLE / long matches the payload cap
                    misses).
  3. parse        — anchored greedy: symbol boundaries restart at every
                    A=128 tile; within a tile a fori_loop walks the greedy
                    cover with one-hot reads (fused elementwise, no
                    gather).  Matches truncate at tile ends (the
                    per-anchor independence also gives decode-side
                    random-access points).
  4. entropy      — per-block histograms (one-hot MXU), on-device
                    canonical Huffman (ops/huffman.py), arithmetic
                    length/dist codes (ops/codes.py), one-hot code lookup.
  5. bitpack      — merge-tree packer (ops/bitpack_tree.py).

Mirrors the reference QAT deflate path behavior: each hw_buff_sz chunk is
one deflate member (BFIN set), CPA_DC auto-select-best static/dynamic/
stored (reference src/qatzip_utils.c:284-285).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops import codes as C
from qatzip_tpu.ops import deflate_tables as T
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.bitpack_tree import tree_pack
from qatzip_tpu.ops.huffman import assign_code_lengths, canonical_codes_reversed

MODE_DYNAMIC = 0
MODE_STATIC = 1
MODE_STORED = 2

ANCHOR = 128                      # parse tile; matches truncate here
_PARSE_STEPS = 2 * (ANCHOR + 4) // 5 + 4

HASH_BITS = 15
WINDOW = 32768

_STATIC_LL_LEN = jnp.asarray(T.STATIC_LITLEN_LEN[:286])
_STATIC_LL_CODE = jnp.asarray(T.STATIC_LITLEN_CODE_REV[:286])
_STATIC_D_LEN = jnp.asarray(np.concatenate(
    [T.STATIC_DIST_LEN, np.zeros(max(0, 30 - len(T.STATIC_DIST_LEN)), np.int32)])[:30])
_STATIC_D_CODE = jnp.asarray(np.concatenate(
    [T.STATIC_DIST_CODE_REV, np.zeros(max(0, 30 - len(T.STATIC_DIST_CODE_REV)), np.int32)])[:30])
_CL_ORDER = jnp.asarray(T.CLCODE_ORDER)

_NUM_HEADER_FIELDS = 1 + 3 + 19 + 316


def words_bound(n: int) -> int:
    """Device output words per block (worst case + header slack)."""
    from qatzip_tpu.ops.bitpack_tree import _level_words
    s = max(1, (n - 1).bit_length())
    return _level_words(s) + 64


def _pack_b4(d32: jnp.ndarray, n: int) -> jnp.ndarray:
    return (d32[0:n] | (d32[1:n + 1] << 8) | (d32[2:n + 2] << 16)
            | (d32[3:n + 3] << 24))


def _hash(b4: jnp.ndarray) -> jnp.ndarray:
    return (b4 * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASH_BITS)


def _shift_fwd(x: jnp.ndarray, k: int, fill):
    """x[i+k] with fill at the tail (1-D, static k)."""
    if k == 0:
        return x
    if k >= x.shape[0]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate([x[k:], jnp.full((k,), fill, x.dtype)])


def _shift_back(x: jnp.ndarray, k: int, fill):
    """x[i-k] with fill at the head (1-D, static k)."""
    if k == 0:
        return x
    if k >= x.shape[0]:
        return jnp.full(x.shape, fill, x.dtype)
    return jnp.concatenate([jnp.full((k,), fill, x.dtype), x[:-k]])


# ---------------------------------------------------------------------------
# match finding
# ---------------------------------------------------------------------------
def _sort_matches(b4, h, length, n, depth: int, kwords: int):
    """Arbitrary-distance candidates via one payload-carrying sort.

    Returns (mlen, mdist) int32[N] in position order; mlen==0 where no
    match >= 4 bytes within the 32KB window exists.  Max detected length
    is 4*kwords - 1 (longer matches are found by the run path or split
    by the parse anyway).
    """
    pos = jnp.arange(n, dtype=jnp.uint32)
    valid = pos + 3 < length.astype(jnp.uint32)
    key = jnp.where(valid, (h << jnp.uint32(32 - HASH_BITS)) | pos,
                    jnp.uint32(0xFFFFFFFF))
    # payload words: data quads at i, i+4, ..., i+4*(kwords-1)
    payloads = [jnp.where(valid, _shift_fwd(b4, 4 * t, jnp.uint32(0)),
                          jnp.uint32(t))  # distinct fills avoid fake matches
                for t in range(kwords)]
    sorted_ops = jax.lax.sort((key, *payloads), num_keys=1)
    skey = sorted_ops[0]
    sw = sorted_ops[1:]

    cur_pos = (skey & jnp.uint32((1 << (32 - HASH_BITS)) - 1)).astype(jnp.int32)
    cur_hash = skey >> jnp.uint32(32 - HASH_BITS)
    cur_valid = skey != jnp.uint32(0xFFFFFFFF)

    maxm = jnp.minimum(jnp.int32(258), length - cur_pos)

    best = jnp.zeros(n, jnp.int32)  # packed (len<<16)|(WINDOW-dist)
    for j in range(1, depth + 1):
        cand_key = _shift_back(skey, j, jnp.uint32(0xFFFFFFFF))
        cand_pos = (cand_key
                    & jnp.uint32((1 << (32 - HASH_BITS)) - 1)).astype(jnp.int32)
        cand_hash = cand_key >> jnp.uint32(32 - HASH_BITS)
        ok = (cur_valid & (cand_key != jnp.uint32(0xFFFFFFFF))
              & (cand_hash == cur_hash)
              & (cur_pos - cand_pos <= WINDOW) & (cand_pos < cur_pos))
        # leading equal payload words + byte refinement on the first diff
        lead = jnp.zeros(n, jnp.int32)
        alive = jnp.ones(n, jnp.bool_)
        partial = jnp.zeros(n, jnp.int32)
        for t in range(kwords):
            cw = _shift_back(sw[t], j, jnp.uint32(t + 777))
            eq = sw[t] == cw
            x = sw[t] ^ cw
            p = (((x & 0xFF) == 0).astype(jnp.int32)
                 + ((x & 0xFFFF) == 0).astype(jnp.int32)
                 + ((x & 0xFFFFFF) == 0).astype(jnp.int32))
            first_bad = alive & ~eq
            partial = jnp.where(first_bad, p, partial)
            lead = lead + (alive & eq).astype(jnp.int32)
            alive = alive & eq
        mlen = jnp.minimum(4 * lead + jnp.where(alive, 0, partial), maxm)
        dist = cur_pos - cand_pos
        combo = jnp.where(ok & (mlen >= 4),
                          (mlen << 16) | (WINDOW - dist), 0)
        best = jnp.maximum(best, combo)

    # back to position order: sort by position (second sort, no scatter)
    pos_key = jnp.where(cur_valid, cur_pos, jnp.int32(n) + jnp.arange(n))
    _, combo_sorted = jax.lax.sort((pos_key, best), num_keys=1)
    mlen = combo_sorted >> 16
    mdist = jnp.where(mlen > 0, WINDOW - (combo_sorted & 0xFFFF), 0)
    return mlen, mdist


def _run_matches(data_u8, length, n):
    """Short-distance (1..4) run matches with full 258-byte extension.

    eq_d[i] = data[i] == data[i-d]; the run length of eq_d starting at i
    is the match length at i with distance d (doubling, no gathers).
    """
    best = jnp.zeros(n, jnp.int32)
    d8 = data_u8[:n].astype(jnp.int32)
    idx = jnp.arange(n)
    for d in (1, 2, 3, 4):
        eq = (d8 == _shift_back(d8, d, jnp.int32(-1))) & (idx >= d)
        run = eq.astype(jnp.int32)
        step = 1
        while step < 258:
            nxt = _shift_fwd(run, step, jnp.int32(0))
            run = run + jnp.where(run == step, nxt, 0)
            step <<= 1
        mlen = jnp.minimum(jnp.minimum(run, 258), length - idx)
        combo = jnp.where(mlen >= 4, (mlen << 16) | (WINDOW - d), 0)
        best = jnp.maximum(best, combo)
    mlen = best >> 16
    mdist = jnp.where(mlen > 0, WINDOW - (best & 0xFFFF), 0)
    return mlen, mdist


# ---------------------------------------------------------------------------
# anchored greedy parse
# ---------------------------------------------------------------------------
def _parse(mlen, mdist, length, n):
    """Greedy cover with symbol boundaries restarting every ANCHOR bytes.

    Returns (sel, take, tlen): sel marks emitted symbols, take marks
    match symbols, tlen is the tile-truncated match length.
    """
    a = min(ANCHOR, n)
    steps = 2 * (a + 4) // 5 + 4
    t = n // a
    off = jnp.arange(n) % a
    tlen = jnp.minimum(mlen, a - off)          # truncate at tile end
    take_ok = tlen >= 4
    tlen = jnp.where(take_ok, tlen, 0)

    lm = tlen.reshape(t, a)
    lit = ~take_ok.reshape(t, a)
    iota = jnp.arange(a)[None, :]

    # literal-run length within tile (doubling)
    run = lit.astype(jnp.int32)
    step = 1
    while step < a:
        nxt = jnp.concatenate(
            [run[:, step:], jnp.zeros((t, step), jnp.int32)], axis=1)
        run = run + jnp.where(run == step, nxt, 0)
        step <<= 1
    run = jnp.maximum(run, 1)

    def body(_, state):
        p, sel, take = state
        active = (p < a)[:, None]
        onehot = (iota == p[:, None]) & active
        len_p = jnp.sum(jnp.where(onehot, lm, 0), axis=1)
        run_p = jnp.sum(jnp.where(onehot, run, 0), axis=1)
        is_lit = len_p < 4
        adv = jnp.where(is_lit, run_p, len_p)
        mark = jnp.where(is_lit[:, None],
                         (iota >= p[:, None]) & (iota < (p + adv)[:, None])
                         & active,
                         onehot)
        sel = sel | mark
        take = take | (onehot & ~is_lit[:, None])
        return p + jnp.where(p < a, adv, 0), sel, take

    p0 = jnp.zeros(t, jnp.int32)
    sel0 = jnp.zeros((t, a), jnp.bool_)
    take0 = jnp.zeros((t, a), jnp.bool_)
    _, sel, take = jax.lax.fori_loop(0, steps, body, (p0, sel0, take0))

    in_range = jnp.arange(n) < length
    sel = sel.reshape(n) & in_range
    take = take.reshape(n) & in_range
    return sel, take, tlen


# ---------------------------------------------------------------------------
# block encoder
# ---------------------------------------------------------------------------
def _encode_one(data_pad, length, depth: int, kwords: int,
                allow_dynamic: bool, m_words: int):
    n = data_pad.shape[0] - 8
    d32 = data_pad.astype(jnp.uint32)
    b4 = _pack_b4(d32, n)
    h = _hash(b4)
    lit = data_pad[:n].astype(jnp.int32)

    s_len, s_dist = _sort_matches(b4, h, length, n, depth, kwords)
    r_len, r_dist = _run_matches(data_pad, length, n)
    use_r = r_len > s_len
    mlen = jnp.where(use_r, r_len, s_len)
    mdist = jnp.where(use_r, r_dist, s_dist)

    sel, take, tlen = _parse(mlen, mdist, length, n)

    # symbols
    len_code, len_eb, len_ev = C.length_code(jnp.maximum(tlen, 3))
    d_code, d_eb, d_ev = C.dist_code(jnp.maximum(mdist, 1))
    sym = jnp.where(take, len_code, lit)
    seli = sel.astype(jnp.int32)
    takei = take.astype(jnp.int32)

    freq_ll = C.onehot_histogram(jnp.clip(sym, 0, 285), seli, 286)
    freq_ll = freq_ll.at[256].add(1)  # EOB (scalar update: cheap)
    freq_d = C.onehot_histogram(jnp.clip(d_code, 0, 29), takei, 30)

    ll_len = assign_code_lengths(freq_ll, 15)
    d_len = assign_code_lengths(freq_d, 15)
    ll_code = canonical_codes_reversed(ll_len, 15)
    d_code_tbl = canonical_codes_reversed(d_len, 15)

    all_lengths = jnp.concatenate([ll_len, d_len])  # [316]
    freq_cl = C.onehot_histogram(all_lengths, jnp.ones(316, jnp.int32), 19)
    cl_len = assign_code_lengths(freq_cl, 7)
    cl_code = canonical_codes_reversed(cl_len, 7)

    # one one-hot per symbol stream, multi-column tables: the [N,286]
    # one-hot is the expensive artifact, so fetch dynamic/static code+len
    # in a single MXU pass and select per mode afterwards
    ll_tab = jnp.stack([ll_len, _STATIC_LL_LEN, ll_code, _STATIC_LL_CODE],
                       axis=1)  # [286, 4]
    d_tab = jnp.stack([d_len, _STATIC_D_LEN, d_code_tbl, _STATIC_D_CODE],
                      axis=1)   # [30, 4]
    ll_cols = C.onehot_lookup(jnp.clip(sym, 0, 285), ll_tab).astype(jnp.int32)
    d_cols = C.onehot_lookup(jnp.clip(d_code, 0, 29), d_tab).astype(jnp.int32)
    ll_dynlen, ll_stalen = ll_cols[..., 0], ll_cols[..., 1]
    ll_dyncode, ll_stacode = ll_cols[..., 2], ll_cols[..., 3]
    d_dynlen, d_stalen = d_cols[..., 0], d_cols[..., 1]
    d_dyncode, d_stacode = d_cols[..., 2], d_cols[..., 3]

    takei32 = take.astype(jnp.int32)
    extra = (len_eb + d_eb) * takei32
    dyn_sym = jnp.sum((ll_dynlen + d_dynlen * takei32 + extra) * seli) \
        + ll_len[256]
    sta_sym = jnp.sum((ll_stalen + d_stalen * takei32 + extra) * seli) \
        + _STATIC_LL_LEN[256]

    dyn_hdr_bits = 3 + 5 + 5 + 4 + 19 * 3 + jnp.sum(
        C.onehot_lookup1(all_lengths, cl_len))
    dyn_bits = dyn_hdr_bits + dyn_sym
    static_bits = 3 + sta_sym
    stored_bits = 40 + 8 * length

    dyn_cost = jnp.where(jnp.bool_(allow_dynamic), dyn_bits,
                         jnp.int32(1 << 30))
    costs = jnp.stack([dyn_cost, static_bits, stored_bits])
    mode = jnp.argmin(costs).astype(jnp.int32)
    use_dyn = mode == MODE_DYNAMIC

    emit_ll_len = jnp.where(use_dyn, ll_len, _STATIC_LL_LEN)
    emit_ll_code = jnp.where(use_dyn, ll_code, _STATIC_LL_CODE)

    # fused per-position field: litlen code + len extra + dist code + dist
    # extra, LSB-first, <= 48 bits
    c0v = jnp.where(use_dyn, ll_dyncode, ll_stacode)
    c0n = jnp.where(use_dyn, ll_dynlen, ll_stalen)
    c2v = jnp.where(use_dyn, d_dyncode, d_stacode)
    c2n = jnp.where(use_dyn, d_dynlen, d_stalen)

    def acc_part(lo, hi, off, val, nb):
        v = val.astype(jnp.uint32)
        o = off.astype(jnp.uint32)
        in_lo = o < 32
        sh = jnp.where(in_lo, o, 0).astype(jnp.uint32)
        lo = lo | jnp.where(in_lo, v << sh, 0)
        # spill into hi: bits beyond 32
        spill = jnp.where(in_lo & (o > 0), v >> (jnp.uint32(32) - sh),
                          jnp.uint32(0))
        hi_sh = jnp.where(in_lo, jnp.uint32(0),
                          (o - 32).astype(jnp.uint32))
        hi = hi | jnp.where(in_lo, spill, v << hi_sh)
        return lo, hi, off + nb

    lo = jnp.zeros(n, jnp.uint32)
    hi = jnp.zeros(n, jnp.uint32)
    off = jnp.zeros(n, jnp.int32)
    lo, hi, off = acc_part(lo, hi, off, c0v, c0n)
    tk = take
    lo, hi, off = acc_part(lo, hi, off,
                           jnp.where(tk, len_ev, 0), jnp.where(tk, len_eb, 0))
    lo, hi, off = acc_part(lo, hi, off,
                           jnp.where(tk, c2v, 0), jnp.where(tk, c2n, 0))
    lo, hi, off = acc_part(lo, hi, off,
                           jnp.where(tk, d_ev, 0), jnp.where(tk, d_eb, 0))
    nbits = jnp.where(sel, off, 0)

    body_words, body_bits = tree_pack(lo, hi, nbits)

    # header fields (same construction as v1: full 316-length CL payload)
    first_val = jnp.where(use_dyn, 5, 3)  # BFINAL=1 | BTYPE (10b / 01b)
    hv = jnp.concatenate([
        jnp.stack([first_val, jnp.int32(29), jnp.int32(29), jnp.int32(15)]),
        C.onehot_lookup1(_CL_ORDER, cl_len),
        C.onehot_lookup1(all_lengths, cl_code),
    ])
    hn = jnp.concatenate([
        jnp.array([3, 5, 5, 4], jnp.int32),
        jnp.full((19,), 3, jnp.int32),
        C.onehot_lookup1(all_lengths, cl_len),
    ])
    keep = jnp.arange(_NUM_HEADER_FIELDS) == 0
    hv = jnp.where(use_dyn, hv, jnp.where(keep, hv, 0))
    hn = jnp.where(use_dyn, hn, jnp.where(keep, hn, 0))
    hdr_words, hdr_bits = pack_fields(hv, hn, 64)

    eob_v = C.onehot_lookup1(jnp.full((1,), 256), emit_ll_code)
    eob_n = C.onehot_lookup1(jnp.full((1,), 256), emit_ll_len)

    # assemble: header || body || EOB into m_words
    from qatzip_tpu.ops.bitpack_tree import _place
    out = jnp.zeros(m_words, jnp.uint32)
    out = out.at[:64].set(hdr_words)
    body_w = body_words.shape[0]
    body_placed = _place(body_words[None, :], hdr_bits[None], m_words)[0]
    out = out | body_placed
    eob_buf = jnp.concatenate([eob_v.astype(jnp.uint32),
                               jnp.zeros(1, jnp.uint32)])
    eob_placed = _place(eob_buf[None, :], (hdr_bits + body_bits)[None],
                        m_words)[0]
    out = out | eob_placed
    total_bits = hdr_bits + body_bits + eob_n[0]
    return out, total_bits, mode


@functools.partial(jax.jit,
                   static_argnames=("depth", "kwords", "allow_dynamic",
                                    "m_words"))
def encode_blocks(data_pad, lengths, depth: int, kwords: int,
                  allow_dynamic: bool, m_words: int):
    """data_pad uint8[B, N+8] (N a power of two), lengths int32[B].

    Returns (words uint32[B, m_words], bits int32[B], mode int32[B]).
    """
    fn = functools.partial(_encode_one, depth=depth, kwords=kwords,
                           allow_dynamic=allow_dynamic, m_words=m_words)
    return jax.vmap(fn)(data_pad, lengths)


def level_params(level: int) -> tuple[int, int]:
    """level -> (sorted-neighbor search depth, payload words)."""
    if level <= 3:
        return 2, 8
    if level <= 6:
        return 4, 8
    return 8, 16
