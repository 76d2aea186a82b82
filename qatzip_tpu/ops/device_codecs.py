"""Device codec adapters: batch chunks into fixed-shape arrays, dispatch the
JAX/Pallas kernels, and unpack results into backend-contract payloads.

This is the TPU analog of the reference's submit/poll pipeline
(doCompressIn/doCompressOut, src/qatzip.c:1483-1764): chunks are batched into
one device dispatch (32 in-flight requests -> one batch dimension), results
gathered in block order.
"""
from __future__ import annotations

import zlib
from typing import Sequence

import numpy as np

from qatzip_tpu.constants import DataFormatInternal, QzHuffmanHdr
from qatzip_tpu.engine.backend import CompressedChunk, DecompressedChunk
from qatzip_tpu.session import InternalParams


def _stored_block(chunk: bytes) -> bytes:
    """BFINAL=1 BTYPE=00 stored deflate block(s) for one chunk (host side)."""
    out = bytearray()
    n = len(chunk)
    pos = 0
    while True:
        seg = min(n - pos, 65535)
        last = pos + seg == n
        out.append(0x01 if last else 0x00)
        out += seg.to_bytes(2, "little")
        out += (seg ^ 0xFFFF).to_bytes(2, "little")
        out += chunk[pos:pos + seg]
        pos += seg
        if last:
            break
    return bytes(out)


class DeflateDeviceCodec:
    """Batched deflate-block compressor running on the JAX device."""

    MAX_BATCH = 32  # mirrors NUM_BUFF in-flight requests (internal.h:65)

    def __init__(self):
        self._cache = {}

    def compress_chunks(self, chunks: Sequence[bytes],
                        params: InternalParams) -> list[CompressedChunk]:
        import jax.numpy as jnp
        from qatzip_tpu.ops import deflate_encode as de

        n = params.hw_buff_sz
        depth, kwords = de.level_params(params.comp_lvl)
        allow_dynamic = params.huffman_hdr == QzHuffmanHdr.QZ_DYNAMIC_HDR
        m_words = de.words_bound(n)

        out: list[CompressedChunk] = []
        for start in range(0, len(chunks), self.MAX_BATCH):
            batch = chunks[start:start + self.MAX_BATCH]
            # two batch shapes only (1 and MAX_BATCH) to bound compile count
            b = 1 if len(batch) == 1 else self.MAX_BATCH
            data = np.zeros((b, n + 8), np.uint8)
            lens = np.zeros((b,), np.int32)
            for i, c in enumerate(batch):
                if len(c) > n:
                    raise ValueError("chunk exceeds hw_buff_sz")
                data[i, :len(c)] = np.frombuffer(c, np.uint8)
                lens[i] = len(c)
            words, bits, mode = de.encode_blocks(
                jnp.asarray(data), jnp.asarray(lens), depth, kwords,
                allow_dynamic, m_words)
            for i, c in enumerate(batch):
                if mode[i] == de.MODE_STORED:
                    payload = _stored_block(c)
                else:
                    nbytes = (int(bits[i]) + 7) // 8
                    payload = words[i].tobytes()[:nbytes]
                checksum = _chunk_checksum(c, params)
                out.append(CompressedChunk(payload, checksum, len(c)))
        return out

    def decompress_chunks(self, payloads, hints, params):
        raise NotImplementedError("TPU deflate decode pending; CPU path used")


def _chunk_checksum(chunk: bytes, params: InternalParams) -> int:
    fmt = params.data_fmt
    if fmt == DataFormatInternal.DEFLATE_ZLIB:
        return zlib.adler32(chunk) & 0xFFFFFFFF
    if fmt in (DataFormatInternal.LZ4_FH, DataFormatInternal.LZ4S_BK):
        import xxhash
        return xxhash.xxh32(chunk, 0).intdigest()
    return zlib.crc32(chunk) & 0xFFFFFFFF


def _pow2_at_least(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def register_all() -> None:
    from qatzip_tpu.ops import registry
    deflate = DeflateDeviceCodec()
    for fmt in (DataFormatInternal.DEFLATE_4B, DataFormatInternal.DEFLATE_GZIP,
                DataFormatInternal.DEFLATE_GZIP_EXT,
                DataFormatInternal.DEFLATE_RAW,
                DataFormatInternal.DEFLATE_ZLIB):
        registry.register(fmt, "compress", deflate)
