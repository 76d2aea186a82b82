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
        from qatzip_tpu.ops import deflate_encode as de

        n = params.hw_buff_sz
        depth, kwords = de.level_params(params.comp_lvl)
        allow_dynamic = params.huffman_hdr == QzHuffmanHdr.QZ_DYNAMIC_HDR
        m_words = de.words_bound(n)

        # Block-DP over the local mesh: a request with enough chunks shards
        # the batch axis over every local device (the reference's instance
        # pool round-robin, src/qatzip.c:363-400, as one SPMD dispatch).
        from qatzip_tpu.parallel.shard import local_mesh

        mesh = local_mesh()
        ndev = mesh.devices.size if mesh is not None else 1
        bsz = self.MAX_BATCH
        if mesh is not None and len(chunks) >= 2 * ndev:
            bsz = max(ndev, (min(len(chunks), self.MAX_BATCH * ndev)
                             // ndev) * ndev)
        else:
            mesh = None

        # Pipelined dispatch (the doCompressIn/doCompressOut overlap,
        # reference src/qatzip.c:1483-1764): JAX async dispatch lets batch
        # k+1 upload/compute while batch k's results transfer back — submit
        # everything, then collect in order.
        pending: list[tuple[list[bytes], object, object, object]] = []
        for start in range(0, len(chunks), bsz):
            batch = list(chunks[start:start + bsz])
            b = 1 if len(batch) == 1 else bsz
            data = np.zeros((b, n + 8), np.uint8)
            lens = np.zeros((b,), np.int32)
            for i, c in enumerate(batch):
                if len(c) > n:
                    raise ValueError("chunk exceeds hw_buff_sz")
                data[i, :len(c)] = np.frombuffer(c, np.uint8)
                lens[i] = len(c)
            words, bits, mode = de.encode_blocks(
                data, lens, depth, kwords, allow_dynamic, m_words,
                mesh=mesh if b >= ndev and mesh is not None else None)
            pending.append((batch, words, bits, mode))

        out: list[CompressedChunk] = []
        for batch, words, bits, mode in pending:
            words = np.asarray(words)
            bits = np.asarray(bits)
            for i, c in enumerate(batch):
                if mode[i] == de.MODE_STORED:
                    payload = _stored_block(c)
                else:
                    nbytes = (int(bits[i]) + 7) // 8
                    payload = words[i].tobytes()[:nbytes]
                checksum = _chunk_checksum(c, params)
                out.append(CompressedChunk(payload, checksum, len(c)))
        return out

    MAX_DECODE_BATCH = 8

    def decompress_chunks(self, payloads, hints, params):
        """Device inflate with per-chunk CPU failover (the reference's
        decompOutSWFallback behavior, src/qatzip_sw.c:792-846): chunks the
        kernel flags as unprovable are re-inflated with zlib instead of
        failing the whole batch."""
        from qatzip_tpu.ops import deflate_decode as dd

        out: list[DecompressedChunk] = []
        for start in range(0, len(payloads), self.MAX_DECODE_BATCH):
            batch = payloads[start:start + self.MAX_DECODE_BATCH]
            bh = hints[start:start + self.MAX_DECODE_BATCH]
            results = dd.inflate_batch(batch, bh)
            for payload, hint, r in zip(batch, bh, results):
                if r is None:
                    data, eof = _cpu_inflate(bytes(payload), hint)
                else:
                    data, eof = r
                out.append(DecompressedChunk(
                    data, _chunk_checksum(data, params), eof))
        return out


def _cpu_inflate(payload: bytes, hint: int) -> tuple[bytes, bool]:
    do = zlib.decompressobj(-15)
    data = do.decompress(payload) + do.flush()
    return data, do.eof


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
        registry.register(fmt, "decompress", deflate)
