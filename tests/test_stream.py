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
