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
