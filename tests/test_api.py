"""API round-trip and interop tests.

Models the reference functional modes (test/main.c mode 4/5/6): round-trips
across the format matrix, interop against system zlib/gzip as the oracle,
parameter validation, and the behavioral contracts (empty input size,
max_compressed_length bound, status codes).
"""
import gzip as pygzip
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu import constants as C
from qatzip_tpu.constants import QzDataFormat


ALL_DEFLATE_FMTS = [QzDataFormat.QZ_DEFLATE_4B, QzDataFormat.QZ_DEFLATE_GZIP,
                    QzDataFormat.QZ_DEFLATE_GZIP_EXT, QzDataFormat.QZ_DEFLATE_RAW]


@pytest.mark.parametrize("fmt", ALL_DEFLATE_FMTS)
@pytest.mark.parametrize("size", [0, 1, 100, 4096, 65536, 200_000])
def test_deflate_roundtrip_formats(corpus_factory, fmt, size):
    data = corpus_factory(size)
    comp = qz.compress(data, "deflate", fmt=fmt)
    out = qz.decompress(comp, "deflate", fmt=fmt)
    assert out == data


@pytest.mark.parametrize("size", [0, 1, 1000, 65536, 150_000])
def test_lz4_roundtrip(corpus_factory, size):
    data = corpus_factory(size)
    comp = qz.compress(data, "lz4")
    out = qz.decompress(comp, "lz4")
    assert out == data


@pytest.mark.parametrize("mini_match", [3, 4])
def test_lz4s_roundtrip(corpus_factory, mini_match):
    data = corpus_factory(100_000)
    sess = qz.QzSession()
    p = qz.QzSessionParamsLZ4S(lz4s_mini_match=mini_match)
    assert qz.qz_setup_session_lz4s(sess, p) == C.QZ_OK
    res = qz.qz_compress(sess, data)
    assert res.rc == C.QZ_OK
    sess2 = qz.QzSession()
    assert qz.qz_setup_session_lz4s(sess2, p) == C.QZ_OK
    back = qz.qz_decompress(sess2, res.data)
    assert back.rc == C.QZ_OK
    assert back.data == data


def test_zlib_roundtrip(corpus_factory):
    data = corpus_factory(100_000)
    comp = qz.compress(data, "zlib")
    out = qz.decompress(comp, "zlib")
    assert out == data
    # single-chunk zlib members must decode with plain zlib
    small = data[:30_000]
    comp1 = qz.compress(small, "zlib")
    assert zlib.decompress(comp1) == small


def test_gzip_interop_with_system_gzip(corpus_factory):
    """Our gzip output must be readable by the system gzip module and
    vice versa (CLI parity oracle; SURVEY.md §4)."""
    data = corpus_factory(200_000)
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP)
    assert pygzip.decompress(comp) == data

    foreign = pygzip.compress(data)  # carries mtime + foreign XFL/OS fields
    out = qz.decompress(foreign, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP)
    assert out == data


def test_gzipext_interop_with_system_gzip(corpus_factory):
    data = corpus_factory(200_000)
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
    # gzipext members are standard multi-member gzip with an extra field
    assert pygzip.decompress(comp) == data


def test_empty_input_compressed_size():
    """Empty-file contract: 34 bytes in gzipext (include/qatzip.h:2044)."""
    comp = qz.compress(b"", "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
    assert len(comp) == C.QZ_COMPRESSED_SZ_OF_EMPTY_FILE
    assert qz.decompress(comp, "deflate") == b""


def test_max_compressed_length_bound(corpus_factory):
    for size in (1, 1000, 65536, 300_000):
        data = corpus_factory(size, "random")  # incompressible worst case
        bound = qz.qz_max_compressed_length(size)
        comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
        assert len(comp) <= bound
    assert qz.qz_max_compressed_length(0) == C.QZ_COMPRESSED_SZ_OF_EMPTY_FILE


def test_compression_size_not_worse_than_reference_sw(corpus_factory):
    """Compressed size must be <= QATzip software-path output at the same
    level (BASELINE.md correctness row).  The reference SW path is zlib at
    the session level with per-64KB flush; a fair stand-in oracle is zlib
    level-1 whole-buffer output + per-chunk framing overhead."""
    data = corpus_factory(256 * 1024)
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       level=1, sw_only=True)
    co = zlib.compressobj(1, zlib.DEFLATED, -15)
    ref_payload = len(co.compress(data) + co.flush())
    chunks = (len(data) + 65535) // 65536
    assert len(comp) <= ref_payload + chunks * 32 + 1024


def test_device_path_ratio_tracking(corpus_factory, monkeypatch):
    """Device-encoder size must not exceed the reference SW path (zlib L1
    with per-64KB flush) on realistic corpora — the BASELINE.md contract.
    Known exception (valid output, looser ratio): long-period repetitive
    data, where match extension caps at 67 bytes; tracked separately."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    data = corpus_factory(256 * 1024)
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       level=1)
    assert qz.decompress(comp, "deflate") == data
    chunks = (len(data) + 65535) // 65536
    ref_payload = 0
    for i in range(0, len(data), 65536):
        co = zlib.compressobj(1, zlib.DEFLATED, -15)
        ref_payload += len(co.compress(data[i:i + 65536]) + co.flush())
    assert len(comp) <= ref_payload + chunks * 32 + 64  # framing overhead


def test_default_routing_protected_without_calibration(corpus_factory,
                                                       monkeypatch):
    """Regression for the round-1 landmine: with default params (LSM off)
    and no measured device calibration, the public API must stay on the SW
    path — a badly-attached device must never hang a default compress
    (engine/devcal.py policy)."""
    monkeypatch.delenv("QATZIP_TPU_DEVICE", raising=False)
    from qatzip_tpu.engine import core as engine_core

    data = corpus_factory(128 * 1024)
    before_hw = engine_core._engine.hw_requests
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
    assert qz.decompress(comp, "deflate") == data
    assert engine_core._engine.hw_requests == before_hw


def test_session_crc_reporting(corpus_factory):
    data = corpus_factory(150_000)
    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == C.QZ_OK
    res = qz.qz_compress_crc(sess, data)
    assert res.rc == C.QZ_OK
    assert res.crc == (zlib.crc32(data) & 0xFFFFFFFF)
    # decompress side reports the same crc
    sess2 = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess2) == C.QZ_OK
    back = qz.qz_decompress_crc(sess2, res.data)
    assert back.rc == C.QZ_OK
    assert back.crc == res.crc


def test_total_in_out_accounting(corpus_factory):
    data = corpus_factory(100_000)
    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    res = qz.qz_compress(sess, data)
    assert sess.total_in == len(data)
    assert sess.total_out == len(res.data)


def test_invalid_params_rejected():
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.hw_buff_sz = 3000  # not a power of two
    assert qz.qz_setup_session_deflate(sess, p) == C.QZ_PARAMS
    p = qz.QzSessionParamsDeflate()
    p.common_params.comp_lvl = 42
    assert qz.qz_setup_session_deflate(sess, p) == C.QZ_PARAMS
    p = qz.QzSessionParamsLZ4S()
    p.lz4s_mini_match = 7
    assert qz.qz_setup_session_lz4s(sess, p) == C.QZ_PARAMS


def test_corrupted_gzip_data_error(corpus_factory):
    """Negative test: corrupted payload must return QZ_DATA_ERROR (models
    qzDecompressFailedAtUnknownGzipBlock, test/main.c:3878)."""
    data = corpus_factory(50_000)
    comp = bytearray(qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT))
    comp[40] ^= 0xFF  # corrupt inside the deflate payload
    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    res = qz.qz_decompress(sess, bytes(comp))
    assert res.rc == C.QZ_DATA_ERROR


def test_unknown_gzip_header_data_error():
    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    res = qz.qz_decompress(sess, b"\x00\x01\x02\x03" * 10)
    assert res.rc == C.QZ_DATA_ERROR


def test_buf_error_when_dest_too_small(corpus_factory):
    data = corpus_factory(100_000)
    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    res = qz.qz_compress(sess, data, dest_limit=10)
    assert res.rc == C.QZ_BUF_ERROR


def test_partial_output_at_member_boundary(corpus_factory):
    """With a dest limit that fits only some chunks, consumption stops at a
    chunk boundary (adaptive-dest-growth contract of the CLI)."""
    data = corpus_factory(256 * 1024, "random")
    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    full = qz.qz_compress(sess, data)
    sess2 = qz.QzSession()
    qz.qz_setup_session_deflate(sess2)
    res = qz.qz_compress(sess2, data, dest_limit=len(full.data) // 2)
    assert res.rc == C.QZ_OK
    assert 0 < res.consumed < len(data)
    assert res.consumed % (64 * 1024) == 0
    # the partial output must itself decompress to the consumed prefix
    out = qz.decompress(res.data, "deflate")
    assert out == data[:res.consumed]


def test_mixed_gzip_and_gzipext_members(corpus_factory):
    """A stream may mix plain and extended members; the walker handles both
    (checkHeader contract, src/qatzip_utils.c:1232-1345)."""
    a = corpus_factory(70_000)
    b = corpus_factory(30_000, "iterative")
    mixed = (qz.compress(a, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
             + qz.compress(b, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP))
    out = qz.decompress(mixed, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP)
    assert out == a + b


def test_status_reporting():
    st = qz.qz_get_status()
    assert st.algo_sw["deflate"]
    assert isinstance(st.qat_hw_count, int)


def test_levels_sweep(corpus_factory):
    data = corpus_factory(120_000)
    sizes = {}
    for lvl in range(1, 10):
        comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP,
                           level=lvl)
        assert qz.decompress(comp, "deflate") == data
        sizes[lvl] = len(comp)
    assert sizes[9] <= sizes[1]
