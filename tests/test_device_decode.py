"""Device deflate-decode tests: bit-exactness vs system zlib (the
BASELINE.md decompress contract; reference HW decode path
src/qatzip.c:2103-2355).
"""
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QzDataFormat
from qatzip_tpu.ops import deflate_decode as dd


def _raw(data: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


@pytest.mark.parametrize("kind", ["text", "random", "constant", "iterative"])
@pytest.mark.parametrize("size", [1, 1000, 65536])
def test_inflate_batch_bit_exact(corpus_factory, kind, size):
    data = corpus_factory(size, kind)
    for level in (1, 9):
        res = dd.inflate_batch([_raw(data, level)], [len(data)])
        assert res[0] is not None, "kernel flagged a valid stream"
        assert res[0][0] == data
        assert res[0][1] is True


def test_inflate_stored_blocks(corpus_factory):
    data = corpus_factory(3000, "random")
    res = dd.inflate_batch([_raw(data, 0)], [len(data)])
    assert res[0] is not None and res[0][0] == data


def test_inflate_multi_block_with_history(corpus_factory):
    """Full-flush creates block boundaries; back-references cross them via
    the 32KB window carried between device rounds."""
    data = corpus_factory(50000, "text")
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    payload = (co.compress(data[:20000]) + co.flush(zlib.Z_FULL_FLUSH)
               + co.compress(data[20000:]) + co.flush())
    res = dd.inflate_batch([payload], [len(data)])
    assert res[0] is not None and res[0][0] == data


def test_inflate_empty_stream():
    res = dd.inflate_batch([_raw(b"")], [0])
    assert res[0] is not None and res[0][0] == b""


def test_inflate_mixed_batch(corpus_factory):
    datas = [corpus_factory(s, k) for s, k in
             [(100, "text"), (65536, "constant"), (5000, "random"),
              (1, "text")]]
    payloads = [_raw(d, 1) for d in datas]
    res = dd.inflate_batch(payloads, [len(d) for d in datas])
    for d, r in zip(datas, res):
        assert r is not None and r[0] == d


def test_inflate_corrupt_stream_flags_error(corpus_factory):
    """A corrupted stream must come back as None (CPU-fallback signal),
    never as silently wrong bytes."""
    data = corpus_factory(20000, "text")
    payload = bytearray(_raw(data, 6))
    payload[len(payload) // 2] ^= 0xFF
    res = dd.inflate_batch([bytes(payload)], [len(data)])
    if res[0] is not None:
        assert res[0][0] != b""  # if it decodes, zlib must agree it's valid
        try:
            ref = zlib.decompressobj(-15).decompress(bytes(payload))
        except zlib.error:
            pytest.fail("kernel accepted a stream zlib rejects")
        assert res[0][0] == ref


def test_public_api_device_decompress(corpus_factory, monkeypatch):
    """Round-trip through the public API with the device path forced:
    CPU-compressed gzipext members decoded by the device kernel."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import core as engine_core

    data = corpus_factory(200_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       level=1, sw_only=True)
    before = engine_core._engine.hw_requests
    assert qz.decompress(comp, "deflate") == data
    assert engine_core._engine.hw_requests > before


def test_device_encode_device_decode_roundtrip(corpus_factory, monkeypatch):
    """The full silicon loop: device encoder output decoded by the device
    decoder, end-to-end through the engine."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    data = corpus_factory(150_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       level=1)
    assert qz.decompress(comp, "deflate") == data
    # interop: system gzip must also read the device-encoded stream
    import gzip as _gzip

    assert _gzip.decompress(comp) == data


def test_inflate_large_literal_stream_rejected_not_corrupted():
    """A ~512KB literal-heavy stream would overflow the 20-bit position key
    in the chain-resolve grid (_ffill_key24) and silently corrupt the output
    tail; such streams must be rejected to the CPU path, never mis-decoded."""
    import numpy as np
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=512 * 1024, dtype=np.uint8).tobytes()
    payload = _raw(data, 1)
    res = dd.inflate_batch([payload], [len(data)])
    # either correctly decoded or explicitly handed back for CPU fallback
    assert res[0] is None or res[0][0] == data


def test_inflate_batch_over_eight_streams(corpus_factory):
    """inflate_batch is a public entry point with no batch cap; more than 8
    streams must round the device batch up, not raise IndexError."""
    datas = [corpus_factory(2000 + 97 * i, "text") for i in range(11)]
    res = dd.inflate_batch([_raw(d, 6) for d in datas],
                           [len(d) for d in datas])
    for d, r in zip(datas, res):
        assert r is not None and r[0] == d
