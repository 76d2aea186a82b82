"""DEFLATE block encoder on device (JAX/XLA; the TPU analog of the QAT
compression engine's deflate path, reference src/qatzip.c:1483-1764).

Design notes (all numbers measured on the target chip with
tools/prof_primitives.py and recorded in PERF.md):

* take_along_axis gathers along the minor axis are fast (>20 Gelem/s) when
  kept un-fused (``optimization_barrier``) and when the source's minor dim
  is 128-aligned; fancy-indexed table gathers and axis-0 gathers are ~450x
  slower and are never used.
* ALL scatter forms (set/add/max, any dtype) serialize at ~10ns/element on
  this target, so the pipeline is scatter-free:
    - permutations are inverted with a second sort (payload packed in the
      low bits of the key),
    - histograms are int8 one-hot matmuls on the MXU,
    - the greedy parse materializes the selected-symbol list directly
      (segment-entry recurrence + parallel segment walks via lax.scan),
    - bit-packing uses prefix sums + hand-rolled binary search instead of
      scatter-add (vmapped searchsorted also lowers pathologically).

Two-dispatch hybrid:
  K1 ``analyze_blocks``  (device): LZ77 — sort-based hash chains (one u32
      key sort gives depth-d chains as d-step lookbacks), match extension
      in 4-byte granules, exact dist-1 run detection via log-doubling (RLE
      data reaches the full 258 match), greedy parse, per-block symbol
      histograms.
  Host ``qz_huff_build_batch`` (native C++): true length-limited Huffman,
      RLE-compressed dynamic headers, stored/static/dynamic mode decision
      from exact bit costs (the CPA auto-select-best behavior, reference
      src/qatzip_utils.c:284-341).
  K2 ``pack_blocks``  (device): map symbols through the host-built code
      tables and bit-pack scatter-free.

Length/distance codes are computed arithmetically (ops/codes.py), never by
table gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops.codes import dist_code, length_code

MODE_DYNAMIC = 0
MODE_STATIC = 1
MODE_STORED = 2

WINDOW = 32767  # dist fits 15 key-payload bits; deflate allows 32768
SEG = 256       # greedy-parse segment width
HDR_MAX = 672   # 4 + 19 + 2*316 header fields + slack
MAX_BLOCK = 1 << 17  # keys pack pos into 17 bits

_U32 = jnp.uint32
_INVALID = jnp.uint32(0xFFFFFFFF)
_OB = jax.lax.optimization_barrier


def words_bound(n: int) -> int:
    """Output words per block: static-mode worst case plus slack, padded to
    the 128-lane tile (the host mode decision guarantees dynamic/static
    blocks fit; stored blocks are emitted on the host)."""
    return ((9 * n + n // 4 + 8192) // 32 + 127) & ~127


def level_params(level: int) -> tuple[int, int]:
    """Map compression level to (hash-chain depth, match words) — the analog
    of the reference's level->HW-search-depth table (README.md:133-148)."""
    if level <= 3:
        return 1, 16
    if level <= 6:
        return 3, 32
    return 6, 64


def _take(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched minor-axis gather, fenced so XLA keeps the fast gather kernel
    instead of fusing it into a serial loop.  mode='clip': jnp's default
    fills out-of-bounds reads with a sentinel instead of clamping."""
    a, idx = _OB((a, idx))
    return _OB(jnp.take_along_axis(a, idx, axis=-1, mode="clip"))


def _sort(x: jnp.ndarray) -> jnp.ndarray:
    x = _OB(x)
    return _OB(jnp.sort(x, axis=-1))


def _shift_right(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    pad = jnp.full(a.shape[:-1] + (k,), fill, a.dtype)
    return jnp.concatenate([pad, a[..., :-k]], axis=-1)


def _shift_left(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    pad = jnp.full(a.shape[:-1] + (k,), fill, a.dtype)
    return jnp.concatenate([a[..., k:], pad], axis=-1)


def _hist_onehot(idx: jnp.ndarray, valid: jnp.ndarray, nbins: int,
                 hi_w: int = 32) -> jnp.ndarray:
    """Histogram of idx (int32 [B,N]) where valid, as int8 one-hot MXU
    matmuls factorized over hi/lo digits — scatter-free and exact for
    counts < 2^31."""
    nb_hi = (nbins + hi_w - 1) // hi_w
    hi = idx // hi_w
    lo = idx - hi * hi_w
    oh_hi = ((hi[..., None] == jnp.arange(nb_hi)[None, None, :])
             & valid[..., None]).astype(jnp.int8)
    oh_lo = (lo[..., None] == jnp.arange(hi_w)[None, None, :]).astype(jnp.int8)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)        # [B, nb_hi, hi_w]
    return counts.reshape(idx.shape[0], nb_hi * hi_w)[:, :nbins]


def _pos_bits(n: int) -> int:
    b = 17
    while (1 << b) < n:
        b += 1
    return b


@functools.partial(jax.jit, static_argnames=("depth", "kwords"))
def analyze_blocks(data: jnp.ndarray, lengths: jnp.ndarray, depth: int,
                   kwords: int):
    """K1: LZ77 + greedy parse + histograms for a batch of blocks.

    data: uint8[B, N+8] zero-padded; lengths: int32[B]; N <= 128K.
    Returns (slots int32[B,N] — selected-symbol positions in stream order
    with -1 for unused slots, mlen int32[B,N], mdist int32[B,N],
    freq_ll int32[B,286], freq_d int32[B,30]).
    """
    B = data.shape[0]
    n = data.shape[1] - 8
    assert n <= MAX_BLOCK, "device deflate blocks are limited to 128KB"
    pos_bits = _pos_bits(n)
    pos_mask = (1 << pos_bits) - 1
    hash_bits = min(15, 32 - pos_bits)

    d32 = data.astype(_U32)
    b4 = (d32[:, 0:n] | (d32[:, 1:n + 1] << 8)
          | (d32[:, 2:n + 2] << 16) | (d32[:, 3:n + 3] << 24))
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    L = lengths[:, None]

    # --- hash-chain candidates via one sort (nearest previous occurrence)
    h = (b4 * _U32(2654435761)) >> _U32(32 - hash_bits)
    valid = (pos + 3) < L
    keys = jnp.where(valid, (h << pos_bits) | pos.astype(_U32), _INVALID)
    sk = _sort(keys)
    cur_pos = (sk & pos_mask).astype(jnp.int32)
    cur_ok = sk != _INVALID
    cur_hash = sk >> pos_bits

    def _cand(dd):
        cand = _shift_right(sk, dd, _INVALID)
        cand_pos = (cand & pos_mask).astype(jnp.int32)
        dist = cur_pos - cand_pos
        ok = (cur_ok & (cand != _INVALID) & ((cand >> pos_bits) == cur_hash)
              & (dist >= 1) & (dist <= WINDOW))
        return dist, ok

    if depth == 1:
        dist, ok = _cand(1)
        best_dist15 = jnp.where(ok, dist - 1, 32767)
    else:
        # score candidates by 2-granule prefix equality, tie-break nearest
        b4c = _take(b4, jnp.clip(cur_pos, 0, n - 1))
        b4c2 = _take(b4, jnp.clip(cur_pos + 4, 0, n - 1))
        best = jnp.zeros((B, n), jnp.int32)
        for dd in range(1, depth + 1):
            dist, ok = _cand(dd)
            cp = jnp.clip(cur_pos - dist, 0, n - 1)
            w0 = _take(b4, cp)
            w1 = _take(b4, jnp.clip(cp + 4, 0, n - 1))
            eq0 = w0 == b4c
            score = eq0.astype(jnp.int32) + (eq0 & (w1 == b4c2)).astype(jnp.int32)
            cval = jnp.where(ok & eq0, (score << 15) | (32767 - (dist - 1)), 0)
            best = jnp.maximum(best, cval)
        best_dist15 = jnp.where(best > 0, 32767 - (best & 0x7FFF), 32767)

    # --- unscramble to position order with a second sort: positions with
    # pos+3 >= length were masked out of the first sort, so sorted entries
    # align with positions [0, length-3) exactly; the tail has no matches.
    keys2 = jnp.where(cur_ok,
                      (cur_pos.astype(_U32) << 15) | best_dist15.astype(_U32),
                      _INVALID)
    sk2 = _sort(keys2)
    low = (sk2 & _U32(0x7FFF)).astype(jnp.int32)
    dist_p = jnp.where((low != 32767) & (pos + 3 < L) & (sk2 != _INVALID),
                       low + 1, 0)

    # --- match extension in position order (one fast gather per granule;
    # the current-side word is a static slice of the padded stream)
    cap = min(4 * kwords + 3, 258)
    maxm = jnp.minimum(jnp.int32(258), L - pos)
    b4p = jnp.pad(b4, ((0, 0), (0, 4 * kwords + 8)))
    has = dist_p > 0
    matched = jnp.zeros((B, n), jnp.int32)
    alive = has
    partial = jnp.zeros((B, n), jnp.int32)
    src_base = pos - dist_p
    for t in range(kwords):
        wi = b4p[:, 4 * t:4 * t + n]
        wj = _take(b4, jnp.clip(src_base + 4 * t, 0, n - 1))
        eq = wi == wj
        x = wi ^ wj
        p3 = (((x & 0xFF) == 0).astype(jnp.int32)
              + ((x & 0xFFFF) == 0).astype(jnp.int32)
              + ((x & 0xFFFFFF) == 0).astype(jnp.int32))
        partial = jnp.where(alive & ~eq, p3, partial)
        matched = matched + jnp.where(alive & eq, 4, 0)
        alive = alive & eq
    mlen_h = matched + jnp.where(alive, 0, partial)
    mlen_h = jnp.where(has, jnp.minimum(mlen_h, jnp.minimum(maxm, cap)), 0)

    # --- exact dist-1 runs via log-doubling (gather-free): covers RLE data
    # beyond the hash-match cap, up to the full 258
    eq_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.bool_), data[:, 1:n] == data[:, 0:n - 1]],
        axis=-1)
    r = eq_prev.astype(jnp.int16)
    s = 1
    while s < 258:
        r_sh = _shift_left(r, s, jnp.int16(0))
        r = jnp.where(r >= s, jnp.minimum(s + r_sh, jnp.int16(258)), r)
        s <<= 1
    mlen_rle = jnp.minimum(r.astype(jnp.int32), jnp.minimum(maxm, 258))

    use_rle = (mlen_rle >= 4) & (mlen_rle >= mlen_h)
    mlen = jnp.where(use_rle, mlen_rle, mlen_h)
    mdist = jnp.where(use_rle, 1, dist_p)
    take_pos = (mlen >= 4) & (mdist >= 1)
    mlen = jnp.where(take_pos, mlen, 0)
    mdist = jnp.where(take_pos, mdist, 0)

    # --- greedy parse, scatter-free: the chain 0 -> f(0) -> ... is
    # materialized directly as a slot list.  f jumps are <= 258 < SEG, so
    # the chain's entry into each SEG-segment is computed by a short
    # recurrence and all segments then walk in parallel.
    step = jnp.where(take_pos, mlen, 1)
    f = jnp.minimum(pos + step, n)
    nseg = n // SEG
    seg_end = ((pos // SEG) + 1) * SEG

    # X(i) = first chain position >= seg_end(i), via clamped doubling
    X = f
    hops = 1
    while hops < SEG:
        nxt = _take(X, jnp.clip(X, 0, n - 1))
        X = jnp.where(X >= seg_end, X, jnp.where(X >= n, n, nxt))
        hops <<= 1

    # entry recurrence over segments (lax.scan stacks outputs, no scatter)
    def entry_step(e, s):
        bound = (s + 1) * SEG
        nxt = _take(X, jnp.clip(e, 0, n - 1))[:, 0]
        e2 = jnp.where(e[:, 0] >= bound, e[:, 0],
                       jnp.where(e[:, 0] >= n, n, nxt))
        return e2[:, None], e[:, 0]

    _, entries = jax.lax.scan(entry_step, jnp.zeros((B, 1), jnp.int32),
                              jnp.arange(nseg, dtype=jnp.int32))
    entries = jnp.moveaxis(entries, 0, 1)  # [B, nseg]

    # parallel segment walks: emit the chain position at every step
    seg_hi = (jnp.arange(nseg, dtype=jnp.int32) + 1)[None, :] * SEG

    def walk_step(p, _):
        out = p
        nxt = _take(f, jnp.clip(p, 0, n - 1))
        p2 = jnp.where(p < seg_hi, nxt, p)
        return p2, out

    _, visited = jax.lax.scan(walk_step, entries, None, length=SEG)
    # visited: [SEG, B, nseg] -> slots [B, nseg*SEG] in stream order
    visited = jnp.moveaxis(visited, 0, 2)  # [B, nseg, SEG]
    seg_lo = (jnp.arange(nseg, dtype=jnp.int32) * SEG)[None, :, None]
    seg_hi3 = seg_lo + SEG
    ok_slot = (visited >= seg_lo) & (visited < seg_hi3) & (visited < L[:, :, None])
    slots = jnp.where(ok_slot, visited, -1).reshape(B, n)

    # --- histograms over slots (must match K2's emission exactly)
    sl = jnp.clip(slots, 0, n - 1)
    v = slots >= 0
    s_mlen = _take(mlen, sl)
    s_take = (_take(take_pos.astype(jnp.int32), sl) > 0) & v
    lc, _, _ = length_code(s_mlen)
    lit = _take(data[:, :n].astype(jnp.int32), sl)
    sym = jnp.where(s_take, lc, lit)
    freq_ll = _hist_onehot(jnp.clip(sym, 0, 285), v, 286)
    freq_ll = freq_ll.at[:, 256].add(1)  # EOB (scalar update, not a scatter)
    dc, _, _ = dist_code(_take(mdist, sl))
    freq_d = _hist_onehot(jnp.clip(dc, 0, 29), s_take, 30)
    return slots, mlen, mdist, freq_ll, freq_d


def _binary_search(sorted_vals: jnp.ndarray, queries: jnp.ndarray,
                   hi_bound: int) -> jnp.ndarray:
    """For each query q: count of entries < q in sorted_vals (per row).
    Hand-rolled so it lowers to fast minor-axis gathers (jnp.searchsorted
    under vmap lowers pathologically on this target)."""
    B, F = sorted_vals.shape
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, hi_bound, jnp.int32)
    steps = int(hi_bound).bit_length()
    for _ in range(steps):
        mid = (lo + hi) >> 1
        v = _take(sorted_vals, jnp.clip(mid, 0, F - 1))
        less = (v < queries) & (mid < F)  # treat positions >= F as +inf
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=("m_words",))
def pack_blocks(data: jnp.ndarray, slots: jnp.ndarray,
                mlen: jnp.ndarray, mdist: jnp.ndarray,
                hdr_vals: jnp.ndarray, hdr_nbits: jnp.ndarray,
                ll_len: jnp.ndarray, ll_code: jnp.ndarray,
                d_len: jnp.ndarray, d_code: jnp.ndarray, m_words: int):
    """K2: emit the deflate bitstream for a batch of blocks, scatter-free.

    Code tables are host-built per block ([B,286]/[B,30] int32 padded to
    [B,384]/[B,128] by the caller, already mode-selected).  Returns
    (words uint32[B, m_words], bits int32[B]).
    """
    B, n = slots.shape
    sl = jnp.clip(slots, 0, n - 1)
    v = slots >= 0

    s_mlen = _take(mlen, sl)
    s_mdist = _take(mdist, sl)
    s_take = (s_mlen >= 4) & (s_mdist >= 1) & v
    lit = _take(data[:, :n].astype(jnp.int32), sl)

    lc, leb, lev = length_code(s_mlen)
    dc, deb, dev = dist_code(s_mdist)
    sym = jnp.clip(jnp.where(s_take, lc, lit), 0, 285)
    dcc = jnp.clip(dc, 0, 29)

    c0v = jnp.where(v, _take(ll_code, sym), 0)
    c0n = jnp.where(v, _take(ll_len, sym), 0)
    c1v = jnp.where(s_take, lev, 0)
    c1n = jnp.where(s_take, leb, 0)
    c2v = jnp.where(s_take, _take(d_code, dcc), 0)
    c2n = jnp.where(s_take, _take(d_len, dcc), 0)
    c3v = jnp.where(s_take, dev, 0)
    c3n = jnp.where(s_take, deb, 0)

    # fuse per-slot fields into two u32 fields: (litlen|len-extra) <= 20b,
    # (dist|dist-extra) <= 28b — halves the pack field count
    aV = (c0v | (c1v << c0n)).astype(_U32)
    aN = c0n + c1n
    bV = (c2v | (c3v << c2n)).astype(_U32)
    bN = c2n + c3n
    sym_v = jnp.stack([aV, bV], axis=2).reshape(B, 2 * n)
    sym_n = jnp.stack([aN, bN], axis=2).reshape(B, 2 * n)

    eob_v = ll_code[:, 256:257].astype(_U32)
    eob_n = ll_len[:, 256:257]

    values = jnp.concatenate([hdr_vals, sym_v, eob_v], axis=-1)
    nbits = jnp.concatenate([hdr_nbits, sym_n, eob_n], axis=-1)
    fpad = (-values.shape[1]) % 128  # keep gather sources 128-lane aligned
    if fpad:
        values = jnp.pad(values, ((0, 0), (0, fpad)))
        nbits = jnp.pad(nbits, ((0, 0), (0, fpad)))
    F = values.shape[1]

    # --- scatter-free packing: fields are in stream order, so their word
    # indices are sorted; per-word values come from modular prefix-sum
    # differences at boundaries found by binary search.  Contributions to a
    # word occupy disjoint bit ranges (sum == or) and u32 wraparound
    # subtraction recovers exact segment sums.
    nb = nbits.astype(jnp.int32)
    cum = jnp.cumsum(nb, axis=-1)
    off = cum - nb
    total_bits = cum[:, -1]

    vmask = jnp.where(nb > 0, values.astype(_U32), _U32(0))
    word_idx = off >> 5
    bit = (off & 31).astype(_U32)
    lo = vmask << bit
    hi = jnp.where(bit == 0, _U32(0), vmask >> (_U32(32) - bit))
    # empty fields must not contribute; they share offsets with neighbors
    ps_lo = jnp.cumsum(lo, axis=-1)
    ps_hi = jnp.cumsum(hi, axis=-1)
    ps_lo = jnp.concatenate([jnp.zeros((B, 1), _U32), ps_lo], axis=-1)
    ps_hi = jnp.concatenate([jnp.zeros((B, 1), _U32), ps_hi], axis=-1)

    wq = jnp.arange(m_words, dtype=jnp.int32)[None, :].repeat(B, 0)
    b_lo = _binary_search(word_idx, wq, F)        # first field with widx >= w
    b_hi = _binary_search(word_idx, wq + 1, F)    # first field with widx > w
    seg = lambda ps, a, b: _take(ps, b) - _take(ps, a)
    w_direct = seg(ps_lo, b_lo, b_hi)
    # hi parts land one word later: contributions from fields of word w-1
    b_lo_m1 = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), b_lo[:, :-1]],
                              axis=-1)
    w_carry = seg(ps_hi, b_lo_m1, b_lo)
    words = w_direct + w_carry
    return words, total_bits


def encode_blocks(data, lengths, depth: int, kwords: int,
                  allow_dynamic: bool, m_words: int):
    """One-call convenience: K1 -> host Huffman build -> K2.

    data: uint8[B, N+8]; lengths: int32[B].
    Returns (words uint32[B, m_words], bits int32[B], mode int32[B]) as
    numpy arrays.  Blocks with mode==MODE_STORED must be emitted by the
    caller (host stored-block framing).
    """
    from qatzip_tpu.native import qzcore as native

    data = jnp.asarray(data)
    lengths = jnp.asarray(lengths)
    slots, mlen, mdist, freq_ll, freq_d = analyze_blocks(
        data, lengths, depth, kwords)
    mode, ll_len, ll_code, d_len, d_code, hv, hn, _est = \
        native.huff_build_batch(np.asarray(freq_ll), np.asarray(freq_d),
                                np.asarray(lengths), allow_dynamic,
                                32 * m_words, HDR_MAX)

    def pad128(a):
        w = (a.shape[1] + 127) & ~127
        out = np.zeros((a.shape[0], w), a.dtype)
        out[:, :a.shape[1]] = a
        return jnp.asarray(out)

    words, bits = pack_blocks(
        data, slots, mlen, mdist,
        jnp.asarray(hv.astype(np.uint32)), jnp.asarray(hn),
        pad128(ll_len), pad128(ll_code), pad128(d_len), pad128(d_code),
        m_words)
    return np.asarray(words), np.asarray(bits), mode
