"""Wire-format framing: gzip, gzipext, 4B, raw, zlib, LZ4 frame, LZ4s blocks.

Pure host-side byte twiddling (numpy / struct).  Each framer knows how to
generate and parse the per-chunk headers/footers of one QATzip wire format
(reference src/qatzip_gzip.c, src/qatzip_lz4.c, src/qatzip_utils.c:888-1345).
"""
from qatzip_tpu.formats.gzip_fmt import (
    GZIPEXT_HEADER_SIZE,
    STD_GZIP_FOOTER_SIZE,
    STD_GZIP_HEADER_SIZE,
    find_std_gzip_footer,
    gen_gzipext_header,
    gen_std_gzip_footer,
    gen_std_gzip_header,
    parse_gzipext_header,
    parse_std_gzip_footer,
)
from qatzip_tpu.formats.zlib_fmt import (
    STD_ZLIB_FOOTER_SIZE,
    STD_ZLIB_HEADER_SIZE,
    gen_zlib_footer,
    gen_zlib_header,
    verify_zlib_header,
)
from qatzip_tpu.formats.lz4_fmt import (
    LZ4_BLK_HEADER_SIZE,
    LZ4_FOOTER_SIZE,
    LZ4_HEADER_SIZE,
    LZ4_MAGIC,
    find_lz4_footer,
    gen_lz4_frame_footer,
    gen_lz4_frame_header,
    parse_lz4_frame_header,
)

__all__ = [name for name in dir() if not name.startswith("_")]
