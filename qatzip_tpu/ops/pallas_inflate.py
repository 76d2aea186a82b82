"""Lockstep DEFLATE entropy decoder — the device half of the hybrid
inflate pipeline (round-4 replacement for the speculative per-bit decoder).

Design (mirrors the hybrid ENCODER's device/host split): the device decodes
the serial Huffman/entropy half of DEFLATE for up to 128 independent blocks
in lockstep — one block per sublane row, every step decoding one symbol per
block — and emits fixed-width token records at regular [step, block] slots.
The host then applies tokens (the LZ77 window-copy half the QAT ASIC has
dedicated silicon for: native qz_apply_tokens, qzcore.cpp) and carries the
32KB history between rounds.  Reference HW decompress role:
src/qatzip.c:2103-2355.

Two drivers share one step function (`decode_step`):
  * XLA driver (`_decode_xla`): lax.while_loop + take_along_axis — runs
    anywhere (the CPU test mesh) and is the reference implementation.
  * Pallas driver (ops/pallas_inflate_kernel.py): per-block table regions
    as 128-wide VMEM slabs, one-hot masked-reduction window refill (no
    dynamic addressing — every dynamic-offset construct crashes Mosaic on
    this target; tools/probe_inflate_step*.py), token tiles DMA'd to HBM.

Wire knowledge (RFC1951): per-block two-level Huffman tables — 9-bit root
+ subtables for codes >9 bits — built host-side per deflate block.  Entries
are u16, packed two per u32 cell so a 512-entry root costs two 128-wide
gathers:

  region: u32[512] cells = root u16[512] (cells 0..255)
                         + subtable area u16[512] (cells 256..511)
  litlen u16:  clen[0:4] kind[4:6] payload[6:14]
     kind 0 literal : payload = byte (low 8 of [6:14])
     kind 1 length  : payload = length symbol index 0..28
     kind 2 EOB
     kind 3 subptr  : clen field = subbits, payload = sub_base/2
  dist u16:    clen[0:4] kind[4:6] payload[6:11] = dist symbol 0..29
     kind 3 subptr as above
  u16 == 0 -> invalid (corrupt stream; lane errors, CPU fallback)
  length/dist (base, extra) resolve arithmetically from RFC1951's
  geometric closed forms (no constant-table gathers; see decode_step).

Token format (shared with qz_apply_tokens, qzcore.cpp):
  0                  inactive (lane done / padding)
  bit0=1             literal, byte in bits 1..8; bit9=1 marks a PAIRED
                     second literal (byte in bits 10..17) decoded in the
                     same lockstep step (root-resolved pairs only)
  bit0=0,bit1=1      match, len(3..258) in bits 2..10, dist-1 in bits 11..25
"""
from __future__ import annotations

import functools

import numpy as np

from qatzip_tpu.ops import deflate_tables as T

LANES = 128          # blocks decoded in lockstep
CELLS = 512          # u32 cells per XLA-driver region (root 256 + sub 256)
ROOT_BITS = 9        # XLA-driver root bits
SUB_ENTRIES = 512    # sub-area entries (256 cells) in every region layout

# Pallas (lane-major) driver region layout: the one-hot fetch cost is
# proportional to the area's ROW count, so both roots and sub areas
# shrink to measured demand.  On real zlib tables (L1/6/9, three
# corpora) the worst-case sub demand is 278 entries for an 8-bit litlen
# root and 22 for a 7-bit dist root; the 384/64-entry sub areas leave
# headroom, and overflow on adversarial-but-legal tables falls back to
# the CPU path per block.
PALLAS_LL_ROOT_BITS = 8
PALLAS_D_ROOT_BITS = 7
PALLAS_LL_SUB_ENTRIES = 384
PALLAS_D_SUB_ENTRIES = 64
PALLAS_LL_CELLS = ((1 << PALLAS_LL_ROOT_BITS) // 2
                   + PALLAS_LL_SUB_ENTRIES // 2)   # 320
PALLAS_D_CELLS = ((1 << PALLAS_D_ROOT_BITS) // 2
                  + PALLAS_D_SUB_ENTRIES // 2)     # 96


def pallas_active() -> bool:
    """True when decode_blocks will dispatch to the Pallas driver (the
    region layout the caller must build depends on this)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def region_spec(use_pallas: bool):
    """(ll_root_bits, d_root_bits, ll_cells, d_cells) for the driver."""
    if use_pallas:
        return (PALLAS_LL_ROOT_BITS, PALLAS_D_ROOT_BITS,
                PALLAS_LL_CELLS, PALLAS_D_CELLS)
    return (ROOT_BITS, ROOT_BITS, CELLS, CELLS)


# ---------------------------------------------------------------------------
# Host: two-level packed table build
# ---------------------------------------------------------------------------
def _bitrev_vec(v: np.ndarray, l: np.ndarray) -> np.ndarray:
    """Bit-reverse each v[i] over its own length l[i] (vectorized)."""
    out = np.zeros_like(v)
    work = v.copy()
    maxl = int(l.max()) if l.size else 0
    for _ in range(maxl):
        out = (out << 1) | (work & 1)
        work >>= 1
    return out >> (maxl - l)


def _pack_cells(u16: np.ndarray) -> np.ndarray:
    """u16[1024] -> u32[512] cells (little-endian pair packing)."""
    return (u16[0::2].astype(np.uint32)
            | (u16[1::2].astype(np.uint32) << 16))


def _build_twolevel(lens: np.ndarray, entry16: np.ndarray,
                    valid: np.ndarray, root_bits: int = ROOT_BITS,
                    sub_entries: int = SUB_ENTRIES) -> np.ndarray:
    """Build the packed region from per-symbol code lengths and u16 entries
    (clen/kind/payload already packed; clen filled in here).  ``valid``
    marks symbols legal in a stream — invalid ones (286/287, dist 30/31)
    may own code space (the static code assigns them lengths) but decode to
    the 0 entry, erroring the lane per RFC1951.  Raises ValueError on
    over-subscribed codes or subtable overflow (caller falls back to the
    CPU path).  Vectorized per code length — one build per dynamic deflate
    block is on the round-trip hot path."""
    lens = lens.astype(np.int64)
    codes = T.canonical_codes(lens.astype(np.int32)).astype(np.int64)
    if ((codes >> np.maximum(lens, 1)) != 0).any():
        raise ValueError("over-subscribed Huffman code")
    entries = np.where((lens > 0) & valid, entry16 | lens.astype(np.uint16),
                       0).astype(np.uint16)
    root = np.zeros(1 << root_bits, np.uint16)
    sub = np.zeros(sub_entries, np.uint16)
    for l in range(1, root_bits + 1):
        syms = np.nonzero(lens == l)[0]
        if syms.size == 0:
            continue
        rc = _bitrev_vec(codes[syms], np.full(syms.size, l, np.int64))
        fills = np.arange(1 << (root_bits - l), dtype=np.int64) << l
        idx = (rc[:, None] | fills[None, :]).reshape(-1)
        root[idx] = np.repeat(entries[syms], 1 << (root_bits - l))
    long_syms = np.nonzero(lens > root_bits)[0]
    if long_syms.size:
        rcf = _bitrev_vec(codes[long_syms], lens[long_syms])
        slots = rcf & ((1 << root_bits) - 1)
        next_free = 0
        for slot in np.unique(slots):
            sel = slots == slot
            syms = long_syms[sel]
            rcs = rcf[sel]
            subbits = int(lens[syms].max()) - root_bits
            size = 1 << subbits
            if next_free + size > sub_entries:
                raise ValueError("subtable overflow")
            if root[slot] != 0:
                raise ValueError("root/sub collision")  # over-subscription
            root[slot] = np.uint16(subbits | (3 << 4) | ((next_free >> 1) << 6))
            for l in range(root_bits + 1, 16):
                lsel = lens[syms] == l
                if not lsel.any():
                    continue
                rc = rcs[lsel] >> root_bits
                fills = (np.arange(1 << (subbits - (l - root_bits)),
                                   dtype=np.int64) << (l - root_bits))
                idx = next_free + (rc[:, None] | fills[None, :]).reshape(-1)
                sub[idx] = np.repeat(entries[syms[lsel]], fills.size)
            next_free += size
    return np.concatenate([_pack_cells(root), _pack_cells(sub)])


def build_ll_region(lens: np.ndarray,
                    root_bits: int = ROOT_BITS) -> np.ndarray:
    """Packed litlen region from code lengths (hlit entries)."""
    nsym = len(lens)
    e = np.zeros(nsym, np.uint16)
    sym = np.arange(nsym)
    lit = sym < 256
    e[lit] = (sym[lit].astype(np.uint16)) << 6
    if nsym > 256:
        e[256] = 2 << 4  # EOB
    hi = min(nsym, 286)
    for s in range(257, hi):
        e[s] = (1 << 4) | ((s - 257) << 6)
    sub = (PALLAS_LL_SUB_ENTRIES if root_bits == PALLAS_LL_ROOT_BITS
           else SUB_ENTRIES)
    return _build_twolevel(lens, e, sym < 286, root_bits, sub)


def build_d_region(lens: np.ndarray,
                   root_bits: int = ROOT_BITS) -> np.ndarray:
    """Packed distance region from code lengths (hdist entries)."""
    nsym = len(lens)
    e = np.zeros(nsym, np.uint16)
    hi = min(nsym, 30)
    e[:hi] = (np.arange(hi, dtype=np.uint16)) << 6
    sub = (PALLAS_D_SUB_ENTRIES if root_bits == PALLAS_D_ROOT_BITS
           else SUB_ENTRIES)
    return _build_twolevel(lens, e, np.arange(nsym) < 30, root_bits, sub)


@functools.lru_cache(maxsize=4)
def static_regions(root_bits_ll: int = ROOT_BITS,
                   root_bits_d: int = ROOT_BITS
                   ) -> tuple[np.ndarray, np.ndarray]:
    return (build_ll_region(T.STATIC_LITLEN_LEN, root_bits_ll),
            build_d_region(T.STATIC_DIST_LEN, root_bits_d))


# ---------------------------------------------------------------------------
# Shared step arithmetic (jnp; shapes chosen by the driver)
# ---------------------------------------------------------------------------
def _mask(nbits):
    import jax.numpy as jnp

    return (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1)


def _root_entry(root_fetch, bits, root_bits):
    """Root-level u16 entry for the low root_bits of ``bits``."""
    import jax.numpy as jnp

    _u = jnp.uint32
    idx = (bits & _u((1 << root_bits) - 1)).astype(jnp.int32)
    cell = root_fetch(idx >> 1)
    return (cell >> ((idx.astype(_u) & _u(1)) << _u(4))) & _u(0xFFFF)


def _resolve(root_fetch, sub_fetch, bits, root_bits):
    """Root+sub lookup through the packed region.  Returns (entry u32,
    resolved_at_root bool)."""
    import jax.numpy as jnp

    _u = jnp.uint32
    e = _root_entry(root_fetch, bits, root_bits)
    is_sub = ((e >> _u(4)) & _u(3)) == _u(3)
    subbits = e & _u(15)
    sidx = (((e >> _u(6)) & _u(0xFF)) << _u(1)).astype(jnp.int32) + \
        ((bits >> _u(root_bits)) & _mask(subbits)).astype(jnp.int32)
    cell2 = sub_fetch(sidx >> 1)
    e2 = (cell2 >> ((sidx.astype(_u) & _u(1)) << _u(4))) & _u(0xFFFF)
    return jnp.where(is_sub, e2, e), ~is_sub


def decode_step(peek2, ll_root, ll_sub, d_root, d_sub, st,
                ll_root_bits: int = ROOT_BITS,
                d_root_bits: int = ROOT_BITS):
    """One lockstep symbol decode.  ``st`` = (bitpos i32, done b, err b,
    outcnt i32, end_bit i32); ``peek2(bitpos) -> (u32, u32)`` returns the
    next 64 stream bits as two words (ONE gather level per step — the
    distance code's bits derive arithmetically); ``*_root/*_sub(cell_idx)
    -> u32`` fetch packed table cells from the root/sub areas.
    Length/distance base+extra come from closed forms (RFC1951's tables
    are geometric), removing two dependent gather levels.  Returns
    (token u32, new_st)."""
    import jax.numpy as jnp

    bitpos, done, err, outcnt, end_bit = st
    _u = jnp.uint32

    b0, b1 = peek2(bitpos)
    e, at_root = _resolve(ll_root, ll_sub, b0, ll_root_bits)
    clen = (e & _u(15)).astype(jnp.int32)
    kind = ((e >> _u(4)) & _u(3)).astype(jnp.int32)
    bad = (e == _u(0)) | (kind == 3)  # unresolved subptr = corrupt stream
    islit = (kind == 0) & ~bad
    islen = kind == 1
    iseob = kind == 2
    sym = ((e >> _u(6)) & _u(0xFF)).astype(jnp.int32)
    # length base/extra closed form: sym 0..27 -> e=(max(sym,4)-4)>>2,
    # base = sym<4 ? sym+3 : ((4+(sym&3))<<e)+3; sym 28 -> 258, e=0
    # clamp: literal lanes flow a byte through sym; an unclamped shift
    # count >= 32 is undefined
    e_len = jnp.minimum(jnp.maximum(sym - 4, 0) >> 2, 5)
    lbase = jnp.where(sym < 4, sym + 3, ((4 + (sym & 3)) << e_len) + 3)
    e_len = jnp.where(sym >= 28, 0, e_len)
    lbase = jnp.where(sym >= 28, 258, lbase)
    eb = jnp.where(islen, e_len, 0)
    lex = ((b0 >> clen.astype(_u)) & _mask(eb)).astype(jnp.int32)
    mlen = lbase + lex
    used1 = clen + eb  # <= 20 bits

    u1 = used1.astype(_u)
    bits2 = (b0 >> u1) | ((b1 << (_u(31) - u1)) << _u(1))
    ed, _ = _resolve(d_root, d_sub, bits2, d_root_bits)
    dclen = (ed & _u(15)).astype(jnp.int32)
    dbad = (ed == _u(0)) | (((ed >> _u(4)) & _u(3)) != 0)
    ds = ((ed >> _u(6)) & _u(31)).astype(jnp.int32)
    # dist base closed form: s<4 -> base-1=s, e=0; else e=(s-2)>>1,
    # base-1 = (2+(s&1))<<e
    e_d = jnp.maximum(ds - 2, 0) >> 1
    dbase1 = jnp.where(ds < 4, ds, (2 + (ds & 1)) << e_d)
    deb = jnp.where(ds < 4, 0, e_d)
    dex = ((bits2 >> dclen.astype(_u)) & _mask(deb)).astype(jnp.int32)
    dist1 = dbase1 + dex

    bad = bad | (islen & dbad)
    islen = islen & ~bad
    islit = islit & ~bad

    active = ~done & ~err
    lit_tok = _u(1) | (sym.astype(_u) << _u(1))
    len_tok = _u(2) | (mlen.astype(_u) << _u(2)) | (dist1.astype(_u) << _u(11))
    token = ((active & islit).astype(_u) * lit_tok
             + (active & islen).astype(_u) * len_tok)

    # literal pairing: when this symbol is a root-resolved literal
    # (clen <= root_bits, so b0 >> clen still holds >= 23 valid bits) and
    # the NEXT code is also a root literal, decode it in the same step and
    # pack its byte into the token's spare bits (bit 9 flag, byte in
    # 10..17) — steps drop ~20-35% on literal-heavy corpora at the cost of
    # one extra root fetch, and token D2H per byte shrinks.  Any other
    # second symbol (match, EOB, subtable, invalid) simply defers to the
    # next step.
    pair = active & islit & at_root
    e2 = _root_entry(ll_root, b0 >> clen.astype(_u), ll_root_bits)
    lit2 = pair & (e2 != _u(0)) & (((e2 >> _u(4)) & _u(3)) == _u(0))
    clen2 = (e2 & _u(15)).astype(jnp.int32)
    sym2 = (e2 >> _u(6)) & _u(0xFF)
    token = token + lit2.astype(_u) * (_u(0x200) | (sym2 << _u(10)))

    bp2 = bitpos + used1
    new_end = jnp.where(active & iseob, bp2, end_bit)
    new_err = err | (active & bad)
    new_done = done | (active & (iseob | bad))
    new_outcnt = outcnt + (active & islit) + lit2 \
        + (active & islen) * mlen
    adv = used1 + islen * (dclen + deb) + lit2 * clen2
    new_bitpos = bitpos + active * adv
    return token, (new_bitpos, new_done, new_err, new_outcnt, new_end)


# ---------------------------------------------------------------------------
# XLA driver (reference implementation; runs on the CPU test mesh)
# ---------------------------------------------------------------------------
@functools.partial(
    __import__("jax").jit, static_argnames=("max_steps",))
def _decode_xla(stream_words, bit0, nbits, tll, td, active0, max_steps: int):
    """stream_words u32[B, NW]; bit0/nbits i32[B]; tll/td u32[B, CELLS];
    active0 bool[B].  Returns (tokens u32[max_steps, B], err, outcnt,
    end_bit, nsteps)."""
    import jax
    import jax.numpy as jnp

    B, NW = stream_words.shape
    _u = jnp.uint32

    def peek2(bitpos):
        wi = jnp.clip(bitpos >> 5, 0, NW - 3)
        sh = (bitpos & 31).astype(_u)
        w0 = jnp.take_along_axis(stream_words, wi[:, None], axis=1)[:, 0]
        w1 = jnp.take_along_axis(stream_words, wi[:, None] + 1, axis=1)[:, 0]
        w2 = jnp.take_along_axis(stream_words, wi[:, None] + 2, axis=1)[:, 0]
        b0 = (w0 >> sh) | ((w1 << (_u(31) - sh)) << _u(1))
        b1 = (w1 >> sh) | ((w2 << (_u(31) - sh)) << _u(1))
        return b0, b1

    def mk_cell(tbl, base):
        def f(idx):
            return jnp.take_along_axis(
                tbl, jnp.clip(base + idx, 0, CELLS - 1)[:, None],
                axis=1)[:, 0]
        return f

    tokens0 = jnp.zeros((max_steps, B), _u)

    def cond(carry):
        step, st, tokens = carry
        _, done, err, _, _ = st
        return (step < max_steps) & ~jnp.all(done | err)

    def body(carry):
        step, st, tokens = carry
        tok, st2 = decode_step(peek2, mk_cell(tll, 0), mk_cell(tll, 256),
                               mk_cell(td, 0), mk_cell(td, 256), st)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, tok, step,
                                                     axis=0)
        return step + 1, st2, tokens

    st0 = (bit0, ~active0, jnp.zeros((B,), jnp.bool_),
           jnp.zeros((B,), jnp.int32), jnp.full((B,), -1, jnp.int32))
    nsteps, st, tokens = jax.lax.while_loop(cond, body, (0, st0, tokens0))
    bitpos, done, err, outcnt, end_bit = st
    # a lane still undone at max_steps, or that ran past its stream, is
    # decoded on the CPU instead
    err = err | (active0 & ~done) | (active0 & (bitpos > nbits))
    err = err | (active0 & ~err & (end_bit < 0))
    return tokens, err, outcnt, end_bit, nsteps


# ---------------------------------------------------------------------------
# Driver dispatch
# ---------------------------------------------------------------------------
def decode_blocks(stream_words: np.ndarray, bit0: np.ndarray,
                  nbits: np.ndarray, tll: np.ndarray, td: np.ndarray,
                  active: np.ndarray, max_steps: int,
                  use_pallas: bool | None = None):
    """Decode one deflate block per lane.  Host numpy in; host numpy out:
    (tokens[S, B], err[B], outcnt[B], end_bit[B], nsteps)."""
    import jax
    import jax.numpy as jnp

    if use_pallas is None:
        # same predicate the region-building callers use (region_spec):
        # the two must agree or tables and driver mismatch
        use_pallas = pallas_active()
    if use_pallas:
        from qatzip_tpu.ops import pallas_inflate_kernel as K

        return K.decode_pallas(stream_words, bit0, nbits, tll, td, active,
                               max_steps)
    tokens, err, outcnt, end_bit, nsteps = _decode_xla(
        jnp.asarray(stream_words), jnp.asarray(bit0), jnp.asarray(nbits),
        jnp.asarray(tll), jnp.asarray(td), jnp.asarray(active),
        max_steps=max_steps)
    ns = int(nsteps)
    return (np.asarray(tokens[:ns]), np.asarray(err), np.asarray(outcnt),
            np.asarray(end_bit), ns)
