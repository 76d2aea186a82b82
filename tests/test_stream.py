"""Streaming API tests (models reference test/main.c modes 9-16/20/22)."""
import gzip as pygzip

import pytest

import qatzip_tpu as qz
from qatzip_tpu import constants as C
from qatzip_tpu.constants import QzDataFormat
from qatzip_tpu.stream import (QzStream, qz_compress_stream,
                               qz_decompress_stream, qz_end_stream)


def _deflate_sess(fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, strm_buff_sz=8192):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.data_fmt = fmt
    p.common_params.strm_buff_sz = strm_buff_sz
    p.common_params.hw_buff_sz = 8192
    assert qz.qz_setup_session_deflate(sess, p) == C.QZ_OK
    return sess


def test_compress_stream_piecemeal(corpus_factory):
    data = corpus_factory(100_000)
    sess = _deflate_sess()
    strm = QzStream()
    out = bytearray()
    step = 7321
    for i in range(0, len(data), step):
        piece = data[i:i + step]
        last = 1 if i + step >= len(data) else 0
        rc, produced = qz_compress_stream(sess, strm, piece, last=last)
        assert rc == C.QZ_OK
        out += produced
    rc, tail = qz_end_stream(sess, strm)
    assert rc == C.QZ_OK
    out += tail
    assert pygzip.decompress(bytes(out)) == data
    assert strm.in_sz == len(data)


def test_decompress_stream_piecemeal(corpus_factory):
    data = corpus_factory(120_000)
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       hw_buff_sz=8192)
    sess = _deflate_sess()
    strm = QzStream()
    out = bytearray()
    step = 1013
    for i in range(0, len(comp), step):
        piece = comp[i:i + step]
        last = 1 if i + step >= len(comp) else 0
        rc, produced = qz_decompress_stream(sess, strm, piece, last=last)
        assert rc == C.QZ_OK
        out += produced
    rc, tail = qz_end_stream(sess, strm)
    out += tail
    assert bytes(out) == data


def test_stream_empty_input():
    sess = _deflate_sess()
    strm = QzStream()
    rc, out = qz_compress_stream(sess, strm, b"", last=1)
    assert rc == C.QZ_OK
    rc, tail = qz_end_stream(sess, strm)
    total = out + tail
    assert pygzip.decompress(total) == b""


def test_stream_pending_out_drain_limit(corpus_factory):
    """pending_out persists across calls when the caller limits output size
    (models reference mode 22 pending-out handling, test/main.c:4459)."""
    data = corpus_factory(50_000)
    sess = _deflate_sess()
    strm = QzStream()
    rc, first = qz_compress_stream(sess, strm, data, last=1, max_out=10)
    assert rc == C.QZ_OK and len(first) == 10
    assert strm.pending_out_sz > 0
    rest = bytearray(first)
    while strm.pending_out_sz:
        rest += qz_end_stream(sess, strm)[1]
    assert pygzip.decompress(bytes(rest)) == data


def test_stream_unsupported_format_rejected():
    sess = qz.QzSession()
    assert qz.qz_setup_session_lz4(sess) == C.QZ_OK
    strm = QzStream()
    rc, _ = qz_compress_stream(sess, strm, b"data", last=1)
    assert rc == C.QZ_UNSUPPORTED_FMT


def test_decompress_stream_linear_growth(corpus_factory):
    """Piecemeal decompress must drain incrementally: the internal buffer
    stays bounded while feeding one large member in small pieces (the
    one-shot-per-call approach would re-parse the whole accumulation —
    quadratic; reference drains incrementally, src/qatzip_stream.c:599-749)."""
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S
    from qatzip_tpu.constants import QzDataFormat

    data = corpus_factory(480 * 1024)
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.hw_buff_sz = 512 * 1024  # one big member
    p.data_fmt = QzDataFormat.QZ_DEFLATE_GZIP
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    comp = qz.qz_compress(sess, data).data

    dsess = qz.QzSession()
    pd = qz.QzSessionParamsDeflate()
    pd.data_fmt = QzDataFormat.QZ_DEFLATE_GZIP
    assert qz.qz_setup_session_deflate(dsess, pd) == qz.QZ_OK
    strm = S.QzStream()
    out = bytearray()
    piece = 4096
    for i in range(0, len(comp), piece):
        is_last = i + piece >= len(comp)
        rc, produced = S.qz_decompress_stream(dsess, strm, comp[i:i + piece],
                                              last=1 if is_last else 0)
        assert rc == qz.QZ_OK
        out += produced
        # incremental carry: accumulation stays bounded by the piece size
        assert len(strm.comp_in) <= piece
    assert bytes(out) == data
    import zlib
    assert strm.crc_32 == zlib.crc32(data)


def test_decompress_stream_multi_member_incremental(corpus_factory):
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S
    from qatzip_tpu.constants import QzDataFormat

    data = corpus_factory(300_000)
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.hw_buff_sz = 64 * 1024
    p.data_fmt = QzDataFormat.QZ_DEFLATE_GZIP_EXT
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    comp = qz.qz_compress(sess, data).data

    dsess = qz.QzSession()
    assert qz.qz_setup_session_deflate(dsess, qz.QzSessionParamsDeflate(
        data_fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)) == qz.QZ_OK
    strm = S.QzStream()
    out = bytearray()
    for i in range(0, len(comp), 1000):
        rc, produced = S.qz_decompress_stream(
            dsess, strm, comp[i:i + 1000],
            last=1 if i + 1000 >= len(comp) else 0)
        assert rc == qz.QZ_OK
        out += produced
    assert bytes(out) == data


# ---------------------------------------------------------------------------
# Round 5: linear LZ4-frame / 4B streaming decompress + incremental XXH32
# ---------------------------------------------------------------------------
def test_xxh32_state_incremental_matches_oracle(corpus_factory):
    import xxhash

    from qatzip_tpu.utils.checksum import XXH32State

    data = corpus_factory(4096, "random")
    for splits in ([0], [1, 2, 3], [15, 16, 17], [100, 1000],
                   [5, 16, 32, 1], [4096]):
        st = XXH32State(0)
        pos = 0
        for s in splits:
            st.update(data[pos:pos + s])
            pos += s
        st.update(data[pos:])
        assert st.digest() == xxhash.xxh32_intdigest(data, 0)
    # short totals (< 16 bytes, the no-accumulator path)
    for n in range(0, 20):
        st = XXH32State(7)
        for b in data[:n]:
            st.update(bytes([b]))
        assert st.digest() == xxhash.xxh32_intdigest(data[:n], 7)


def _lz4_sess():
    import qatzip_tpu as qz

    sess = qz.QzSession()
    assert qz.qz_setup_session_lz4(sess, qz.QzSessionParamsLZ4()) == qz.QZ_OK
    return sess


def test_decompress_stream_lz4_piecemeal_linear(corpus_factory):
    """LZ4-frame streaming decompress is incremental: the accumulation
    buffer stays bounded (block-sized), each input byte is examined once
    (round-5 fix: the old path re-parsed the whole buffer per call)."""
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S
    from qatzip_tpu.utils import checksum as ck

    data = corpus_factory(1 << 20)
    comp = qz.qz_compress(_lz4_sess(), data).data
    dsess = _lz4_sess()
    strm = S.QzStream()
    out = bytearray()
    piece = 997
    for i in range(0, len(comp), piece):
        rc, produced = S.qz_decompress_stream(
            dsess, strm, comp[i:i + piece],
            last=1 if i + piece >= len(comp) else 0)
        assert rc == qz.QZ_OK
        out += produced
        # bounded carry: at most one block (a full-size stored block is
        # 65536 B) + its 4-byte header + up to piece-1 unconsumed bytes
        assert len(strm.comp_in) < 65536 + 4 + piece
    assert bytes(out) == data
    assert strm.crc_32 == ck.xxh32(data, 0)
    assert dsess.end_of_last_block


def test_decompress_stream_lz4_one_byte_feed(corpus_factory):
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S

    data = corpus_factory(64 * 1024)
    comp = qz.qz_compress(_lz4_sess(), data).data
    dsess = _lz4_sess()
    strm = S.QzStream()
    out = bytearray()
    for i in range(len(comp)):
        rc, produced = S.qz_decompress_stream(
            dsess, strm, comp[i:i + 1], last=1 if i == len(comp) - 1 else 0)
        assert rc == qz.QZ_OK
        out += produced
    assert bytes(out) == data


def test_decompress_stream_lz4_catenated_frames(corpus_factory):
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S
    from qatzip_tpu.utils import checksum as ck

    d1 = corpus_factory(70_000)
    d2 = corpus_factory(50_000, "random")
    comp = qz.qz_compress(_lz4_sess(), d1).data + \
        qz.qz_compress(_lz4_sess(), d2).data
    dsess = _lz4_sess()
    strm = S.QzStream()
    out = bytearray()
    for i in range(0, len(comp), 1333):
        rc, produced = S.qz_decompress_stream(
            dsess, strm, comp[i:i + 1333],
            last=1 if i + 1333 >= len(comp) else 0)
        assert rc == qz.QZ_OK
        out += produced
    assert bytes(out) == d1 + d2
    assert strm.crc_32 == ck.xxh32(d1 + d2, 0)


def test_decompress_stream_lz4_truncation_detected(corpus_factory):
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S

    comp = qz.qz_compress(_lz4_sess(), corpus_factory(30_000)).data
    dsess = _lz4_sess()
    strm = S.QzStream()
    rc, _ = S.qz_decompress_stream(dsess, strm, comp[:len(comp) - 5], last=1)
    assert rc == qz.QZ_DATA_ERROR


def test_lz4_block_decompress_prefix_history():
    """Linked-block frames: match offsets reach into the prior block's
    output via the prefix argument (LZ4 frame spec, block-indep=0)."""
    from qatzip_tpu.engine import lz4_block

    prefix = b"ABCDEFGHIJKLMNOP"  # 16 bytes of history
    # sequence 1: 0 literals, match len 8 (token 0x04) at offset 16 — the
    # start of the prefix; sequence 2: terminal 4-literal run (token 0x40)
    blk = bytes([0x04]) + (16).to_bytes(2, "little") + bytes([0x40]) + b"tail"
    out = lz4_block.lz4_block_decompress(blk, 1 << 20, prefix=prefix)
    assert out == b"ABCDEFGH" + b"tail"


def test_decompress_stream_lz4_linked_blocks():
    """A hand-built frame with FLG block-indep=0 whose second block copies
    bytes produced by the first — exercises the cross-block history carry."""
    import struct

    import xxhash

    import qatzip_tpu as qz
    from qatzip_tpu import stream as S

    part1 = b"0123456789ABCDEF" * 2     # 32 bytes, emitted as stored block
    # block 2: one sequence, 0 literals, match of 12 bytes at offset 32
    # (reaches the start of part1), then terminal literals "XY"
    blk2 = bytes([0x08]) + struct.pack("<H", 32) + bytes([0x20]) + b"XY"
    expect = part1 + part1[:12] + b"XY"
    flg = (1 << 6) | (1 << 2)           # v1, content-checksum, LINKED blocks
    bd = 4 << 4
    body = bytes([flg, bd])
    hc = (xxhash.xxh32_intdigest(body, 0) >> 8) & 0xFF
    frame = (struct.pack("<I", 0x184D2204) + body + bytes([hc])
             + struct.pack("<I", 0x80000000 | len(part1)) + part1
             + struct.pack("<I", len(blk2)) + blk2
             + struct.pack("<I", 0)
             + struct.pack("<I", xxhash.xxh32_intdigest(expect, 0)))
    dsess = _lz4_sess()
    strm = S.QzStream()
    rc, out = S.qz_decompress_stream(dsess, strm, frame, last=1)
    assert rc == qz.QZ_OK
    assert out == expect


def test_decompress_stream_4b_piecemeal_linear(corpus_factory):
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S
    from qatzip_tpu.constants import QzDataFormat

    data = corpus_factory(400_000)
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.data_fmt = QzDataFormat.QZ_DEFLATE_4B
    p.common_params.hw_buff_sz = 32 * 1024
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    comp = qz.qz_compress(sess, data).data

    dsess = qz.QzSession()
    pd = qz.QzSessionParamsDeflate()
    pd.data_fmt = QzDataFormat.QZ_DEFLATE_4B
    assert qz.qz_setup_session_deflate(dsess, pd) == qz.QZ_OK
    strm = S.QzStream()
    out = bytearray()
    for i in range(0, len(comp), 1009):
        rc, produced = S.qz_decompress_stream(
            dsess, strm, comp[i:i + 1009],
            last=1 if i + 1009 >= len(comp) else 0)
        assert rc == qz.QZ_OK
        out += produced
        # carry never exceeds one member (4B members are hw_buff_sz-sized)
        assert len(strm.comp_in) <= 4 + 32 * 1024 + 1024
    assert bytes(out) == data
    import zlib

    assert strm.crc_32 == zlib.crc32(data)


def test_decompress_stream_lz4_large_hw_buff_sz(corpus_factory):
    """Frames with hw_buff_sz > 64KB declare the matching BD block-size
    code, so the streaming walker (and any conforming foreign decoder)
    accepts the large blocks (round-5 review fix: BD was hardcoded to
    64KB while blocks went up to 512KB)."""
    import qatzip_tpu as qz
    from qatzip_tpu import stream as S

    data = corpus_factory(500_000)
    for hbs in (128 * 1024, 512 * 1024):
        sess = qz.QzSession()
        p = qz.QzSessionParamsLZ4()
        p.common_params.hw_buff_sz = hbs
        assert qz.qz_setup_session_lz4(sess, p) == qz.QZ_OK
        comp = qz.qz_compress(sess, data).data
        d = qz.QzSession()
        pd = qz.QzSessionParamsLZ4()
        pd.common_params.hw_buff_sz = hbs
        assert qz.qz_setup_session_lz4(d, pd) == qz.QZ_OK
        strm = S.QzStream()
        out = bytearray()
        for i in range(0, len(comp), 4096):
            rc, piece = S.qz_decompress_stream(
                d, strm, comp[i:i + 4096],
                last=1 if i + 4096 >= len(comp) else 0)
            assert rc == qz.QZ_OK, f"hbs={hbs} rc={rc}"
            out += piece
        assert bytes(out) == data
