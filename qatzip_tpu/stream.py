"""Stateful streaming API (reference src/qatzip_stream.c).

Piecemeal interface on top of the one-shot engine: input accumulates into a
strm_buff_sz bounce buffer; when full (or on last) the buffer is compressed
through the session funnel and the output drained from pending_out —
mirroring qzCompressStream/qzDecompressStream/qzEndStream
(reference src/qatzip_stream.c:403-781).

Compression is restricted to the deflate formats the reference's stream path
supports (gzip/gzipext/raw — src/qatzip_stream.c:478-484).
"""
from __future__ import annotations

from qatzip_tpu import constants as C
from qatzip_tpu.constants import DataFormatInternal, QzDirection
from qatzip_tpu.engine import core
from qatzip_tpu.session import QzSession

_STREAM_COMP_FMTS = (DataFormatInternal.DEFLATE_GZIP,
                     DataFormatInternal.DEFLATE_GZIP_EXT,
                     DataFormatInternal.DEFLATE_RAW,
                     DataFormatInternal.DEFLATE_4B,
                     DataFormatInternal.DEFLATE_ZLIB)


class QzStream:
    """Analog of QzStream_T (reference include/qatzip.h:2358-2406)."""

    def __init__(self):
        self.in_buf = bytearray()
        self.pending_out = bytearray()
        self.comp_in = bytearray()   # decompress-side accumulation
        self.crc_32 = 0
        self.in_sz = 0               # total input consumed
        self.out_sz = 0              # total output produced
        self.pending_in = 0
        self.ended = False
        # incremental decompress carry: mid-member inflate state so piecemeal
        # feeding stays O(n) (the reference drains incrementally,
        # src/qatzip_stream.c:599-749)
        self._dobj = None
        self._any_member = False

    @property
    def pending_out_sz(self) -> int:
        return len(self.pending_out)


def _drain(strm: QzStream, max_out: int | None) -> bytes:
    if max_out is None:
        out = bytes(strm.pending_out)
        strm.pending_out.clear()
    else:
        out = bytes(strm.pending_out[:max_out])
        del strm.pending_out[:max_out]
    strm.out_sz += len(out)
    return out


def qz_compress_stream(sess: QzSession, strm: QzStream, data=b"",
                       last: int = 0, max_out: int | None = None):
    """Returns (rc, produced_bytes).  Accumulates until the stream buffer is
    full or ``last`` is set, then pushes a compressed member to pending_out."""
    if not isinstance(sess, QzSession) or not isinstance(strm, QzStream):
        return C.QZ_PARAMS, b""
    if strm.ended:
        return C.QZ_FAIL, b""
    from qatzip_tpu.api import _auto_session
    rc = _auto_session(sess)
    if rc < 0:
        return rc, b""
    p = sess.params
    if p.data_fmt not in _STREAM_COMP_FMTS:
        return C.QZ_UNSUPPORTED_FMT, b""

    strm.in_buf += bytes(data)
    strm.pending_in = len(strm.in_buf)

    while len(strm.in_buf) >= p.strm_buff_sz or (last and strm.in_buf):
        take = min(len(strm.in_buf), p.strm_buff_sz)
        is_final_piece = last and take == len(strm.in_buf)
        piece = bytes(strm.in_buf[:take])
        res = core.compress_ext(sess, piece, last=1 if is_final_piece else 0,
                                crc_init=strm.crc_32)
        if res.rc != C.QZ_OK:
            return res.rc, _drain(strm, max_out)
        strm.crc_32 = res.crc
        strm.pending_out += res.data
        del strm.in_buf[:res.consumed]
        strm.in_sz += res.consumed
        strm.pending_in = len(strm.in_buf)
        if is_final_piece:
            break

    if last and not strm.in_buf and strm.in_sz == 0 and not strm.ended:
        # empty stream still emits a valid empty member
        res = core.compress_ext(sess, b"", last=1)
        if res.rc == C.QZ_OK:
            strm.pending_out += res.data

    return C.QZ_OK, _drain(strm, max_out)


_INCREMENTAL_WBITS = {
    DataFormatInternal.DEFLATE_GZIP: 31,
    DataFormatInternal.DEFLATE_GZIP_EXT: 31,
    DataFormatInternal.DEFLATE_RAW: -15,
    DataFormatInternal.DEFLATE_ZLIB: 15,
}


def _decompress_stream_incremental(sess: QzSession, strm: QzStream, data,
                                   last: int, max_out: int | None, wbits: int):
    """O(n) piecemeal decompress for the deflate formats: a zlib
    decompressobj carries mid-member state between calls, so each call costs
    only the new bytes (the one-shot funnel would re-parse the accumulated
    buffer every call — quadratic).  Footer checksums (gzip CRC32+ISIZE,
    zlib Adler32) are verified by the inflater itself."""
    import zlib

    p = sess.params
    adler = p.data_fmt == DataFormatInternal.DEFLATE_ZLIB
    strm.comp_in += bytes(data)
    while strm.comp_in:
        if strm._dobj is None:
            strm._dobj = zlib.decompressobj(wbits)
        feed = bytes(strm.comp_in)
        try:
            out = strm._dobj.decompress(feed)
        except zlib.error:
            return C.QZ_DATA_ERROR, _drain(strm, max_out)
        consumed = len(feed) - len(strm._dobj.unused_data)
        strm.pending_out += out
        del strm.comp_in[:consumed]
        strm.in_sz += consumed
        if adler:
            cur = strm.crc_32 if strm._any_member else 1
            strm.crc_32 = zlib.adler32(out, cur) & 0xFFFFFFFF
            strm._any_member = True
        else:
            strm.crc_32 = zlib.crc32(out, strm.crc_32) & 0xFFFFFFFF
        if strm._dobj.eof:
            sess.end_of_last_block = True
            strm._dobj = None
            strm._any_member = True
            continue  # next catenated member
        break  # mid-member: wait for more input
    if last and (strm.comp_in or strm._dobj is not None):
        return C.QZ_DATA_ERROR, _drain(strm, max_out)
    return C.QZ_OK, _drain(strm, max_out)


def qz_decompress_stream(sess: QzSession, strm: QzStream, data=b"",
                         last: int = 0, max_out: int | None = None):
    """Returns (rc, produced_bytes).  Buffers compressed input and emits
    decompressed bytes of every complete member seen so far; deflate formats
    drain incrementally (mid-member state carries between calls)."""
    if not isinstance(sess, QzSession) or not isinstance(strm, QzStream):
        return C.QZ_PARAMS, b""
    from qatzip_tpu.api import _auto_session
    rc = _auto_session(sess)
    if rc < 0:
        return rc, b""
    wbits = _INCREMENTAL_WBITS.get(sess.params.data_fmt)
    if wbits is not None:
        return _decompress_stream_incremental(sess, strm, data, last, max_out,
                                              wbits)

    strm.comp_in += bytes(data)
    if strm.comp_in:
        res = core.decompress_ext(sess, bytes(strm.comp_in))
        if res.rc == C.QZ_DATA_ERROR and not last and res.consumed == 0:
            # likely an incomplete member; wait for more input
            return C.QZ_OK, _drain(strm, max_out)
        if res.rc not in (C.QZ_OK, C.QZ_BUF_ERROR):
            return res.rc, _drain(strm, max_out)
        strm.pending_out += res.data
        del strm.comp_in[:res.consumed]
        strm.in_sz += res.consumed
        strm.crc_32 = res.crc
    if last and strm.comp_in:
        return C.QZ_DATA_ERROR, _drain(strm, max_out)
    return C.QZ_OK, _drain(strm, max_out)


def qz_end_stream(sess: QzSession, strm: QzStream):
    """Flush remaining output and release stream state
    (qzEndStream, reference src/qatzip_stream.c:751-781)."""
    out = bytes(strm.pending_out)
    strm.out_sz += len(out)
    strm.pending_out.clear()
    strm.in_buf.clear()
    strm.comp_in.clear()
    strm.ended = True
    return C.QZ_OK, out
