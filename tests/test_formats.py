"""Unit tests for wire-format framing generators/parsers."""
import struct

import xxhash

from qatzip_tpu.formats import gzip_fmt, lz4_fmt, zlib_fmt
from qatzip_tpu.engine import lz4_block
from qatzip_tpu.utils import checksum as ck


def test_gzipext_header_layout():
    h = gzip_fmt.gen_gzipext_header(0x11223344, 0x55667788)
    assert len(h) == gzip_fmt.GZIPEXT_HEADER_SIZE == 24
    assert h[:4] == b"\x1f\x8b\x08\x04"
    assert h[8] == 0 and h[9] == 255          # xfl, os
    assert h[10:12] == struct.pack("<H", 12)  # x_len
    assert h[12:14] == b"QZ"
    parsed = gzip_fmt.parse_gzipext_header(h)
    assert parsed.src_sz == 0x11223344 and parsed.dest_sz == 0x55667788


def test_std_gzip_header_footer():
    h = gzip_fmt.gen_std_gzip_header()
    assert len(h) == 10 and h[:4] == b"\x1f\x8b\x08\x00"
    f = gzip_fmt.gen_std_gzip_footer(0xDEADBEEF, 12345)
    crc, isize = gzip_fmt.parse_std_gzip_footer(f)
    assert crc == 0xDEADBEEF and isize == 12345


def test_zlib_header_valid():
    h = gzip = zlib_fmt.gen_zlib_header()
    assert zlib_fmt.verify_zlib_header(h)
    assert (h[0] * 256 + h[1]) % 31 == 0


def test_lz4_frame_header_checksum():
    h = lz4_fmt.gen_lz4_frame_header(65536)
    assert len(h) == 15
    (magic,) = struct.unpack_from("<I", h, 0)
    assert magic == lz4_fmt.LZ4_MAGIC
    assert h[4] == 0x4C  # version 01, csize+ccksum set
    assert h[5] == 0x40  # 64KB max block size
    hc = (xxhash.xxh32(h[4:14], 0).intdigest() >> 8) & 0xFF
    assert h[14] == hc
    hlen, hdr = lz4_fmt.parse_lz4_frame_header(h, strict=True)
    assert hlen == 15 and hdr.content_size == 65536


def test_lz4_footer_walk():
    payload = lz4_block.lz4_block_compress(b"hello world, hello world, hello!" * 10)
    frame = (lz4_fmt.gen_lz4_frame_header(320)
             + lz4_fmt.gen_lz4_block_header(len(payload)) + payload
             + lz4_fmt.gen_lz4_frame_footer(0x12345678))
    foot = lz4_fmt.find_lz4_footer(frame, 0, len(frame))
    assert foot == len(frame) - 8
    (endmark, cksum) = struct.unpack_from("<II", frame, foot)
    assert endmark == 0 and cksum == 0x12345678


def test_lz4_block_codec_roundtrip():
    for data in (b"", b"a", b"abcabcabcabcabcabcabcabc" * 100,
                 bytes(range(256)) * 300):
        blk = lz4_block.lz4_block_compress(data)
        assert lz4_block.lz4_block_decompress(blk, 1 << 20) == data


def test_lz4s_sequences_decode():
    data = b"the quick brown fox " * 500
    for mm in (3, 4):
        blk = lz4_block.lz4s_block_compress(data, mini_match=mm)
        assert lz4_block.lz4s_block_decompress(blk, 1 << 20, mini_match=mm) == data
        seqs = lz4_block.lz4s_decode_sequences(blk, mini_match=mm)
        total = sum(s[1] + s[3] for s in seqs)
        assert total == len(data)


def test_crc32_combine_matches_zlib():
    import zlib
    a, b = b"hello compression", b" world of accelerators"
    c1, c2 = zlib.crc32(a), zlib.crc32(b)
    assert ck.crc32_combine(c1, c2, len(b)) == zlib.crc32(a + b)


def test_adler32_combine_matches_zlib():
    import zlib
    a, b = b"x" * 10000, b"adler combine check" * 57
    c1, c2 = zlib.adler32(a), zlib.adler32(b)
    assert ck.adler32_combine(c1, c2, len(b)) == zlib.adler32(a + b)


def test_find_std_gzip_footer_scan():
    import qatzip_tpu as qz
    from qatzip_tpu.constants import QzDataFormat
    data1 = b"abc" * 1000
    data2 = b"xyz" * 800
    comp = (qz.compress(data1, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP)
            + qz.compress(data2, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP))
    foot = gzip_fmt.find_std_gzip_footer(comp, 0, len(comp))
    crc, isize = gzip_fmt.parse_std_gzip_footer(comp, foot)
    assert isize == len(data1)
