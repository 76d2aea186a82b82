"""ctypes binding for libqzcore.so (built on demand from qzcore.cpp)."""
from __future__ import annotations

import ctypes
import os

from qatzip_tpu.native.build import build

_path = build()
if _path is None:
    raise ImportError("libqzcore.so unavailable")

_lib = ctypes.CDLL(_path)

_lib.qz_lz4_compress_block.restype = ctypes.c_int64
_lib.qz_lz4_compress_block.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_void_p, ctypes.c_int64]
_lib.qz_lz4s_compress_block.restype = ctypes.c_int64
_lib.qz_lz4s_compress_block.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_int]
_lib.qz_lz4_decompress_block.restype = ctypes.c_int64
_lib.qz_lz4_decompress_block.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         ctypes.c_void_p, ctypes.c_int64]
_lib.qz_lz4s_decompress_block.restype = ctypes.c_int64
_lib.qz_lz4s_decompress_block.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                          ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int]
_lib.qz_crc32_combine.restype = ctypes.c_uint32
_lib.qz_crc32_combine.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                  ctypes.c_int64]
_lib.qz_deflate_compress.restype = ctypes.c_int64
_lib.qz_deflate_compress.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int]
_lib.qz_inflate.restype = ctypes.c_int64
_lib.qz_inflate.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                            ctypes.c_void_p, ctypes.c_int64,
                            ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_int32)]


def lz4_compress_block(data: bytes) -> bytes:
    cap = len(data) + len(data) // 255 + 64
    buf = ctypes.create_string_buffer(cap)
    n = _lib.qz_lz4_compress_block(data, len(data), buf, cap)
    if n < 0:
        raise ValueError("lz4 compress failed")
    return buf.raw[:n]


def lz4s_compress_block(data: bytes, mini_match: int = 3) -> bytes:
    cap = len(data) + len(data) // 255 + 64
    buf = ctypes.create_string_buffer(cap)
    n = _lib.qz_lz4s_compress_block(data, len(data), buf, cap, mini_match)
    if n < 0:
        raise ValueError("lz4s compress failed")
    return buf.raw[:n]


def lz4_decompress_block(block: bytes, max_out: int) -> bytes:
    cap = min(max_out, 1 << 30) if max_out > 0 else 1 << 26
    buf = ctypes.create_string_buffer(cap)
    n = _lib.qz_lz4_decompress_block(block, len(block), buf, cap)
    if n < 0:
        raise ValueError("corrupt lz4 block")
    return buf.raw[:n]


def lz4s_decompress_block(block: bytes, max_out: int,
                          mini_match: int = 3) -> bytes:
    cap = min(max_out, 1 << 30) if max_out > 0 else 1 << 26
    buf = ctypes.create_string_buffer(cap)
    n = _lib.qz_lz4s_decompress_block(block, len(block), buf, cap, mini_match)
    if n < 0:
        raise ValueError("corrupt lz4s block")
    return buf.raw[:n]


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    return _lib.qz_crc32_combine(crc1 & 0xFFFFFFFF, crc2 & 0xFFFFFFFF, len2)


def deflate_compress(data: bytes, level: int = 1) -> bytes:
    """Raw-deflate compress (complete stream, BFINAL set)."""
    cap = len(data) + (len(data) >> 3) + 1024
    buf = ctypes.create_string_buffer(cap)
    n = _lib.qz_deflate_compress(data, len(data), buf, cap, level)
    if n < 0:
        raise ValueError("deflate compress failed")
    return buf.raw[:n]


def inflate(data: bytes, max_out: int) -> tuple[bytes, int, bool]:
    """Inflate one raw-deflate stream.

    Returns (output, compressed_bytes_consumed, reached_final_block).
    Raises ValueError on corrupt input, OverflowError when max_out is too
    small (caller may retry with a larger buffer).
    """
    cap = max(max_out, 1)
    buf = ctypes.create_string_buffer(cap)
    used = ctypes.c_int64(0)
    eof = ctypes.c_int32(0)
    n = _lib.qz_inflate(data, len(data), buf, cap,
                        ctypes.byref(used), ctypes.byref(eof))
    if n == -2:
        raise OverflowError("inflate output exceeds max_out")
    if n < 0:
        raise ValueError("corrupt deflate stream")
    return buf.raw[:n], used.value, bool(eof.value)
