"""Metadata (block-index) API, CRC64 variants, session CRC configs, and
memory API — the surface the reference declares but stubs on Linux
(reference include/qatzip.h:2229-3098; qzGetSoftwareComponent* stubs at
src/qatzip.c:3070-3082)."""
import os
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu import constants as C
from qatzip_tpu.utils import checksum as ck


def make_data(n=300_000):
    blob = open("/usr/bin/g" + "++", "rb").read(n // 2)
    return blob + b"the quick brown fox " * ((n - len(blob)) // 20 + 1)


def deflate_session(**kw):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    for k, v in kw.items():
        setattr(p.common_params, k, v)
    assert qz.qz_setup_session_deflate(sess, p) == C.QZ_OK
    return sess


# ---------------------------------------------------------------------------
# Metadata API
# ---------------------------------------------------------------------------
def test_metadata_roundtrip():
    data = make_data()
    rc, blob = qz.qz_allocate_metadata(len(data), 64 * 1024)
    assert rc == C.QZ_OK and blob.block_count == (len(data) + 65535) // 65536

    sess = deflate_session()
    res = qz.qz_compress_with_metadata_ext(sess, data, blob)
    assert res.rc == C.QZ_OK
    assert blob.valid == blob.block_count
    # frameless payload stream: strictly smaller than gzip-framed output
    assert len(res.data) < len(data)

    dres = qz.qz_decompress_with_metadata_ext(deflate_session(), res.data, blob)
    assert dres.rc == C.QZ_OK
    assert dres.data == data
    assert dres.crc == zlib.crc32(data) & 0xFFFFFFFF


def test_metadata_random_access_block():
    """The index enables decompressing one block without the others."""
    data = make_data()
    rc, blob = qz.qz_allocate_metadata(len(data), 64 * 1024)
    sess = deflate_session()
    res = qz.qz_compress_with_metadata_ext(sess, data, blob)
    assert res.rc == C.QZ_OK

    k = blob.valid // 2
    rc, off, size, flags, block_hash = qz.qz_metadata_block_read(k, blob)
    assert rc == C.QZ_OK
    payload = res.data[off:off + size]
    from qatzip_tpu.metadata import QZ_METADATA_BLOCK_DEFLATE
    if flags & QZ_METADATA_BLOCK_DEFLATE:
        out = zlib.decompressobj(-15).decompress(payload)
    else:
        out = payload
    expect = data[k * 65536:(k + 1) * 65536]
    assert out == expect
    assert block_hash == zlib.crc32(expect) & 0xFFFFFFFF


def test_metadata_block_read_write_bounds():
    rc, blob = qz.qz_allocate_metadata(100, 64)
    assert rc == C.QZ_OK
    assert qz.qz_metadata_block_read(99, blob)[0] == C.QZ_OUT_OF_RANGE
    assert qz.qz_metadata_block_write(0, blob, 0, 10, 1, 0xDEAD) == C.QZ_OK
    rc, off, size, flags, h = qz.qz_metadata_block_read(0, blob)
    assert (rc, off, size, flags, h) == (C.QZ_OK, 0, 10, 1, 0xDEAD)
    assert qz.qz_free_metadata(blob) == C.QZ_OK
    assert qz.qz_allocate_metadata(-1, 64)[0] == C.QZ_PARAMS
    assert qz.qz_free_metadata(None) == C.QZ_PARAMS


def test_metadata_overflow():
    rc, blob = qz.qz_allocate_metadata(1000, 512)  # 2 blocks
    sess = deflate_session()
    res = qz.qz_compress_with_metadata_ext(sess, b"x" * 4096, blob,
                                           hw_buff_sz_override=512)
    assert res.rc == C.QZ_METADATA_OVERFLOW


def test_metadata_stored_blocks():
    """Incompressible blocks are stored raw (flags bit0)."""
    data = os.urandom(128 * 1024)
    rc, blob = qz.qz_allocate_metadata(len(data), 64 * 1024)
    sess = deflate_session()
    res = qz.qz_compress_with_metadata_ext(sess, data, blob)
    assert res.rc == C.QZ_OK
    from qatzip_tpu.metadata import QZ_METADATA_BLOCK_STORED
    assert all(b.flags & QZ_METADATA_BLOCK_STORED
               for b in blob.blocks[:blob.valid])
    assert len(res.data) == len(data)  # no expansion
    dres = qz.qz_decompress_with_metadata_ext(deflate_session(), res.data, blob)
    assert dres.rc == C.QZ_OK and dres.data == data


def test_metadata_block_crcs():
    data = make_data(150_000)
    rc, blob = qz.qz_allocate_metadata(len(data), 64 * 1024)
    sess = deflate_session()
    res = qz.qz_compress_with_metadata_ext(sess, data, blob)
    assert res.rc == C.QZ_OK
    rc, in32, out32 = qz.qz_metadata_block_get_crc32(0, blob)
    assert rc == C.QZ_OK
    assert in32 == zlib.crc32(data[:65536]) & 0xFFFFFFFF
    rc, in64, out64 = qz.qz_metadata_block_get_crc64(0, blob)
    assert rc == C.QZ_OK
    assert in64 == ck.crc64(data[:65536])
    assert qz.qz_metadata_block_get_crc32(blob.valid, blob)[0] == C.QZ_OUT_OF_RANGE


def test_metadata_corruption_detected():
    data = make_data(100_000)
    rc, blob = qz.qz_allocate_metadata(len(data), 64 * 1024)
    res = qz.qz_compress_with_metadata_ext(deflate_session(), data, blob)
    corrupted = bytearray(res.data)
    corrupted[len(corrupted) // 2] ^= 0xFF
    dres = qz.qz_decompress_with_metadata_ext(deflate_session(),
                                              bytes(corrupted), blob)
    assert dres.rc == C.QZ_DATA_ERROR


# ---------------------------------------------------------------------------
# CRC64 compress/decompress variants + session CRC configs
# ---------------------------------------------------------------------------
def test_crc64_roundtrip_default_config():
    data = make_data(200_000)
    sess = deflate_session()
    res = qz.qz_compress_crc64(sess, data)
    assert res.rc == C.QZ_OK
    assert res.crc == ck.crc64(data)  # ECMA-182 normal default

    dsess = deflate_session()
    dres = qz.qz_decompress_crc64(dsess, res.data)
    assert dres.rc == C.QZ_OK and dres.data == data
    assert dres.crc == res.crc


def test_crc64_continuation():
    a, b = make_data(70_000), os.urandom(50_000)
    sess = deflate_session()
    r1 = qz.qz_compress_crc64(sess, a)
    r2 = qz.qz_compress_crc64(sess, b, crc64=r1.crc)
    assert r2.crc == ck.crc64(a + b)


def test_session_crc64_config():
    sess = qz.QzSession()
    # dependency on setup session first
    assert qz.qz_get_session_crc64_config(sess)[0] == C.QZ_FAIL
    sess = deflate_session()
    rc, cfg = qz.qz_get_session_crc64_config(sess)
    assert rc == C.QZ_OK and cfg.polynomial == 0x42F0E1EBA9EA3693
    xz = qz.Crc64Config(initial_value=(1 << 64) - 1, reflect_in=1,
                        reflect_out=1, xor_out=(1 << 64) - 1)
    assert qz.qz_set_session_crc64_config(sess, xz) == C.QZ_OK
    data = make_data(80_000)
    res = qz.qz_compress_crc64(sess, data)
    assert res.crc == ck.crc64(data, xz)


def test_session_crc32_config():
    sess = deflate_session()
    rc, cfg = qz.qz_get_session_crc32_config(sess)
    assert rc == C.QZ_OK and cfg.reflect_in == 1
    assert qz.qz_set_session_crc32_config(sess, qz.Crc32Config()) == C.QZ_OK
    assert qz.qz_set_session_crc32_config(sess, None) == C.QZ_PARAMS


# ---------------------------------------------------------------------------
# Memory API
# ---------------------------------------------------------------------------
def test_memory_api():
    buf = qz.qz_malloc(4096)
    assert buf is not None and len(buf) == 4096
    assert qz.qz_mem_find_addr(buf) == 1
    plain = bytearray(4096)
    assert qz.qz_mem_find_addr(plain) == 0
    qz.qz_free(buf)
    assert qz.qz_mem_find_addr(buf) == 0
    assert qz.qz_malloc(-1) is None
    common = qz.qz_malloc(16, force_pinned=0)
    assert qz.qz_mem_find_addr(common) == 0  # COMMON_MEM is not pinned
    qz.qz_free(common)


# ---------------------------------------------------------------------------
# Generic defaults + component introspection
# ---------------------------------------------------------------------------
def test_generic_defaults_roundtrip():
    d = qz.qz_get_defaults()
    d.comp_lvl = 6
    assert qz.qz_set_defaults(d) == C.QZ_OK
    try:
        assert qz.qz_get_defaults().comp_lvl == 6
        assert qz.qz_get_defaults_deflate().common_params.comp_lvl == 6
    finally:
        d.comp_lvl = 1
        qz.qz_set_defaults(d)
    bad = qz.qz_get_defaults()
    bad.comp_lvl = 42
    assert qz.qz_set_defaults(bad) == C.QZ_PARAMS


def test_defaults_deflate_ext():
    d = qz.qz_get_defaults_deflate_ext()
    d.zlib_format = 1
    assert qz.qz_set_defaults_deflate_ext(d) == C.QZ_OK
    try:
        assert qz.qz_get_defaults_deflate_ext().zlib_format == 1
    finally:
        d.zlib_format = 0
        qz.qz_set_defaults_deflate_ext(d)


def test_software_components():
    rc, n = qz.qz_get_software_component_count()
    assert rc == C.QZ_OK and n >= 2
    rc, comps = qz.qz_get_software_component_version_list()
    assert rc == C.QZ_OK and len(comps) == n
    names = [c[0] for c in comps]
    assert "qatzip_tpu" in names and "zlib" in names


def test_defaults_deflate_ext_feed_session_setup():
    # qzSetDefaults semantics: defaults must affect subsequent setup with
    # params=None (reference include/qatzip.h:2086-2140)
    d = qz.qz_get_defaults_deflate_ext()
    d.zlib_format = 1
    assert qz.qz_set_defaults_deflate_ext(d) == C.QZ_OK
    try:
        sess = qz.QzSession()
        assert qz.qz_setup_session_deflate_ext(sess, None) == C.QZ_OK
        from qatzip_tpu.constants import DataFormatInternal
        assert sess.params.data_fmt == DataFormatInternal.DEFLATE_ZLIB
    finally:
        d.zlib_format = 0
        qz.qz_set_defaults_deflate_ext(d)


def test_session_crc32_config_affects_compress_crc():
    # a custom CRC32 config must change what qz_compress_crc reports
    sess = deflate_session()
    data = make_data(50_000)
    base = qz.qz_compress_crc(sess, data)
    assert base.crc == ck.crc32(data)
    cfg = qz.Crc32Config(polynomial=0x04C11DB7, initial_value=0,
                         reflect_in=0, reflect_out=0, xor_out=0)  # CRC-32/MPEG-ish
    assert qz.qz_set_session_crc32_config(sess, cfg) == C.QZ_OK
    res = qz.qz_compress_crc(sess, data)
    assert res.rc == C.QZ_OK
    assert res.crc == ck.crc32_configured(data, cfg)
    assert res.crc != base.crc

    dsess = deflate_session()
    assert qz.qz_set_session_crc32_config(dsess, cfg) == C.QZ_OK
    dres = qz.qz_decompress_crc(dsess, res.data)
    assert dres.rc == C.QZ_OK and dres.data == data
    assert dres.crc == res.crc


def test_crc64_zero_running_value_not_treated_as_fresh():
    # a custom config where crc(empty) != 0: a legitimately-zero running
    # CRC must continue correctly rather than restart
    cfg = qz.Crc64Config(initial_value=(1 << 64) - 1, reflect_in=1,
                         reflect_out=1, xor_out=(1 << 64) - 1)
    a, b = make_data(30_000), make_data(20_000)
    sess = deflate_session()
    assert qz.qz_set_session_crc64_config(sess, cfg) == C.QZ_OK
    r1 = qz.qz_compress_crc64(sess, a)
    r2 = qz.qz_compress_crc64(sess, b, crc64=r1.crc)
    assert r2.crc == ck.crc64(a + b, cfg)


def test_zero_copy_pinned_path(corpus_factory):
    """qz_malloc buffers and memoryview slices must flow through the
    funnels without a bytes() copy and with correct results; qz_get_status
    must report registered pinned memory (reference
    src/qatzip_utils.c:1350-1427, qzGetStatus memory fields)."""
    import numpy as np

    import qatzip_tpu as qz

    data = corpus_factory(100_000)
    buf = qz.qz_malloc(len(data))
    buf[:] = data
    st = qz.qz_get_status()
    assert st.memory_alloced >= len(data)
    assert st.qat_mem_drvr >= 1
    assert qz.qz_mem_find_addr(buf) == 1

    # bytearray (pinned) straight through compress
    comp = qz.compress(buf, "deflate", sw_only=True)
    assert qz.decompress(comp, "deflate", sw_only=True) == data
    # memoryview slice (no copy) + numpy array
    mv = memoryview(buf)[1000:51000]
    comp2 = qz.compress(mv, "deflate", sw_only=True)
    assert qz.decompress(bytearray(comp2), "deflate", sw_only=True) == data[1000:51000]
    arr = np.frombuffer(data, np.uint8)
    comp3 = qz.compress(arr, "deflate", sw_only=True)
    assert qz.decompress(np.frombuffer(comp3, np.uint8), "deflate",
                         sw_only=True) == data
    qz.qz_free(buf)
    assert qz.qz_mem_find_addr(buf) == 0
