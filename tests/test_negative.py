"""Negative-path matrix: corrupt headers/blocks/footers, buffer overflow,
sticky force-SW, and bad params must produce exact error codes.

Mirrors the reference's qzFuncTests chain (test/main.c:3808-4411):
qzDecompressFailedAtUnknownGzipHeader (:3808), SW/HW unknown-gzip-block
(:3878/:3967), qzDecompressForceSW (:4039), buffer-overflow compress and
decompress (:4212), CRC check (:4322), SW-L9-compress/HW-decompress interop
(:4339).  Where the reference distinguishes QZ_FAIL vs QZ_DATA_ERROR for
corrupt input, this framework reports QZ_DATA_ERROR uniformly (framing or
payload corruption is a data error, never an engine failure).
"""
import struct
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QzDataFormat


def _deflate_sess(fmt=QzDataFormat.QZ_DEFLATE_GZIP, hw_buff_sz=64 * 1024,
                  level=1):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.comp_lvl = level
    p.common_params.hw_buff_sz = hw_buff_sz
    p.data_fmt = fmt
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    return sess


def _compressed(data, fmt=QzDataFormat.QZ_DEFLATE_GZIP, **kw):
    res = qz.qz_compress(_deflate_sess(fmt, **kw), data)
    assert res.rc == qz.QZ_OK
    return res.data


# ---------------------------------------------------------------------------
# Corrupt gzip header (reference :3808 — id1 != 0x1f, expects failure)
# ---------------------------------------------------------------------------
def test_bad_gzip_magic(corpus_factory):
    comp = bytearray(_compressed(corpus_factory(65536, "random")))
    comp[0] = 0x00  # id1
    res = qz.qz_decompress(_deflate_sess(), bytes(comp))
    assert res.rc == qz.QZ_DATA_ERROR


def test_bad_gzip_method_byte(corpus_factory):
    comp = bytearray(_compressed(corpus_factory(4096, "text")))
    comp[2] = 0x07  # CM != 8 (deflate)
    res = qz.qz_decompress(_deflate_sess(), bytes(comp))
    assert res.rc == qz.QZ_DATA_ERROR


def test_reserved_flg_bits_rejected(corpus_factory):
    """FLG reserved bits (5-7) set: not a legal RFC1952 member."""
    comp = bytearray(_compressed(corpus_factory(4096, "text")))
    comp[3] |= 0xE0
    res = qz.qz_decompress(_deflate_sess(), bytes(comp))
    assert res.rc == qz.QZ_DATA_ERROR


# ---------------------------------------------------------------------------
# Corrupt deflate block data, SW and device paths (reference :3878/:3967)
# ---------------------------------------------------------------------------
def _corrupt_payload(comp: bytes) -> bytes:
    out = bytearray(comp)
    mid = len(out) // 2
    for i in range(mid, mid + 8):
        out[i] ^= 0xA5
    return bytes(out)


def test_corrupt_deflate_block_sw(corpus_factory):
    comp = _corrupt_payload(_compressed(corpus_factory(65536, "text")))
    res = qz.qz_decompress(_deflate_sess(), comp)
    assert res.rc == qz.QZ_DATA_ERROR


def test_corrupt_deflate_block_device_path(corpus_factory, monkeypatch):
    """Same corruption with the device decode path forced: the kernel (or
    its per-chunk CPU failover) must surface the same exact code, never
    silently wrong bytes (reference HW case :3967 expects an error too)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    comp = _corrupt_payload(
        _compressed(corpus_factory(65536, "text"),
                    fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT))
    res = qz.qz_decompress(
        _deflate_sess(QzDataFormat.QZ_DEFLATE_GZIP_EXT), comp)
    assert res.rc == qz.QZ_DATA_ERROR


# ---------------------------------------------------------------------------
# Oversized chunk -> sticky force-SW decompress (reference :4039 expects
# SUCCESS via SW, with the session latched to SW; src/qatzip_utils.c:1320)
# ---------------------------------------------------------------------------
def test_oversized_chunk_sticky_sw_decompress(corpus_factory):
    data = corpus_factory(128 * 1024, "text")
    comp = _compressed(data, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       hw_buff_sz=128 * 1024)
    sess = _deflate_sess(QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                         hw_buff_sz=64 * 1024)
    assert not sess.force_sw
    res = qz.qz_decompress(sess, comp)
    assert res.rc == qz.QZ_OK and res.data == data
    assert sess.force_sw, "oversized chunk must latch the session to SW"
    assert res.ext_rc & qz.QZ_SW_EXECUTION_MASK
    # sticky: a later, normal-sized request on this session stays SW
    small = _compressed(corpus_factory(1000, "text"),
                        fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
    res2 = qz.qz_decompress(sess, small)
    assert res2.rc == qz.QZ_OK
    assert res2.ext_rc & qz.QZ_SW_EXECUTION_MASK


# ---------------------------------------------------------------------------
# Destination buffer overflow (reference :4212 expects QZ_BUF_ERROR both
# directions)
# ---------------------------------------------------------------------------
def test_compress_dest_buffer_too_small(corpus_factory):
    data = corpus_factory(65536, "random")  # incompressible
    res = qz.qz_compress(_deflate_sess(), data, dest_limit=100)
    assert res.rc == qz.QZ_BUF_ERROR


def test_decompress_dest_buffer_too_small(corpus_factory):
    data = corpus_factory(65536, "text")
    comp = _compressed(data)
    res = qz.qz_decompress(_deflate_sess(), comp, dest_limit=1000)
    assert res.rc == qz.QZ_BUF_ERROR


# ---------------------------------------------------------------------------
# Checksum corruption per format (reference CRC check :4322)
# ---------------------------------------------------------------------------
def test_wrong_gzip_footer_crc(corpus_factory):
    data = corpus_factory(30000, "text")
    comp = bytearray(_compressed(data))
    comp[-8] ^= 0xFF  # CRC32 field of the final footer
    res = qz.qz_decompress(_deflate_sess(), bytes(comp))
    assert res.rc == qz.QZ_DATA_ERROR


def test_wrong_gzip_footer_isize(corpus_factory):
    data = corpus_factory(30000, "text")
    comp = bytearray(_compressed(data))
    comp[-1] ^= 0x55  # ISIZE field
    res = qz.qz_decompress(_deflate_sess(), bytes(comp))
    assert res.rc == qz.QZ_DATA_ERROR


def _zlib_sess():
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflateExt()
    p.zlib_format = 1
    assert qz.qz_setup_session_deflate_ext(sess, p) == qz.QZ_OK
    return sess


def test_wrong_zlib_adler(corpus_factory):
    data = corpus_factory(30000, "text")
    res = qz.qz_compress(_zlib_sess(), data)
    assert res.rc == qz.QZ_OK
    comp = bytearray(res.data)
    comp[-1] ^= 0xFF  # Adler-32 footer
    dres = qz.qz_decompress(_zlib_sess(), bytes(comp))
    assert dres.rc == qz.QZ_DATA_ERROR


def test_wrong_lz4_content_checksum(corpus_factory):
    data = corpus_factory(30000, "text")
    sess = qz.QzSession()
    assert qz.qz_setup_session_lz4(sess, qz.QzSessionParamsLZ4()) == qz.QZ_OK
    res = qz.qz_compress(sess, data)
    assert res.rc == qz.QZ_OK
    comp = bytearray(res.data)
    comp[-2] ^= 0xFF  # XXH32 content checksum in the frame footer
    dsess = qz.QzSession()
    assert qz.qz_setup_session_lz4(dsess, qz.QzSessionParamsLZ4()) == qz.QZ_OK
    dres = qz.qz_decompress(dsess, bytes(comp))
    assert dres.rc == qz.QZ_DATA_ERROR


# ---------------------------------------------------------------------------
# Truncation
# ---------------------------------------------------------------------------
def test_truncated_single_member(corpus_factory):
    comp = _compressed(corpus_factory(30000, "text"))
    res = qz.qz_decompress(_deflate_sess(), comp[: len(comp) - 4])
    assert res.rc == qz.QZ_DATA_ERROR


def test_truncated_second_member_partial_success(corpus_factory):
    """Mid-stream truncation after a complete member: the complete member
    decodes, consumed stops at the member boundary (the reference's
    consumed/produced contract on short input)."""
    d1 = corpus_factory(30000, "text")
    d2 = corpus_factory(30000, "random")
    m1 = _compressed(d1)
    m2 = _compressed(d2)
    res = qz.qz_decompress(_deflate_sess(), m1 + m2[: len(m2) - 6])
    assert res.rc == qz.QZ_OK
    assert res.data == d1
    assert res.consumed == len(m1)


# ---------------------------------------------------------------------------
# SW-L9 compress / device decompress interop (reference :4339)
# ---------------------------------------------------------------------------
def test_sw_l9_compress_device_decompress(corpus_factory, monkeypatch):
    data = corpus_factory(65536, "text")
    comp = _compressed(data, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, level=9)
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    res = qz.qz_decompress(
        _deflate_sess(QzDataFormat.QZ_DEFLATE_GZIP_EXT), comp)
    assert res.rc == qz.QZ_OK and res.data == data


# ---------------------------------------------------------------------------
# Invalid session params (reference mode 6 session-param checks :1114)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mutate", [
    lambda p: setattr(p.common_params, "comp_lvl", 0),
    lambda p: setattr(p.common_params, "comp_lvl", 13),
    lambda p: setattr(p.common_params, "hw_buff_sz", 999),       # not pow2
    lambda p: setattr(p.common_params, "hw_buff_sz", 1 << 30),   # over max
    lambda p: setattr(p.common_params, "direction", 42),
])
def test_invalid_session_params(mutate):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    mutate(p)
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_PARAMS
