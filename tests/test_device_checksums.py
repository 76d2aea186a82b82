"""Device checksum kernels vs the zlib oracles (the file
ops/checksums.py:17 cites).  GF(2) combine trees with right-alignment for
ragged lengths need a sweep over lengths including 0 and 1-byte blocks —
reference checksum contract: src/qatzip.c:1699-1718 (crc32_combine chunk
merging), include/qatzip.h:274-283 (QzCrcType_T)."""
import zlib

import numpy as np
import pytest

from qatzip_tpu.ops import checksums as ckd

N = 1024


def _batch(lengths, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(lengths), N), np.uint8)
    blobs = []
    for i, ln in enumerate(lengths):
        b = rng.integers(0, 256, ln, dtype=np.uint8).tobytes()
        data[i, :ln] = np.frombuffer(b, np.uint8)
        blobs.append(b)
    return data, np.asarray(lengths, np.int32), blobs


@pytest.mark.parametrize("lengths", [
    [0], [1], [2], [127], [128], [129],
    [0, 1, 2, 3, 5, 8, 13, 21],
    [N, N - 1, 1, 0, N // 2, 777, 3, 64],
])
def test_crc32_blocks_vs_zlib(lengths):
    data, lens, blobs = _batch(lengths)
    got = np.asarray(ckd.crc32_blocks(data, lens, N))
    for i, b in enumerate(blobs):
        assert int(got[i]) == (zlib.crc32(b) & 0xFFFFFFFF), \
            f"len={lengths[i]}"


@pytest.mark.parametrize("lengths", [
    [0], [1], [2], [127], [128], [129],
    [0, 1, 2, 3, 5, 8, 13, 21],
    [N, N - 1, 1, 0, N // 2, 777, 3, 64],
])
def test_adler32_blocks_vs_zlib(lengths):
    data, lens, blobs = _batch(lengths, seed=1)
    got = np.asarray(ckd.adler32_blocks(data, lens, N))
    for i, b in enumerate(blobs):
        assert int(got[i]) == (zlib.adler32(b) & 0xFFFFFFFF), \
            f"len={lengths[i]}"


def test_crc32_blocks_length_sweep():
    """bt.c-style boundary sweep across every length 0..64 plus random
    offsets near the lane width."""
    lengths = list(range(0, 65)) + [120, 121, 126, 127, 128, 129, 255, 256,
                                    257, 511, 512, 513, 1000, 1023, 1024]
    # batch in groups of 16 (device batch shapes stay bounded)
    for start in range(0, len(lengths), 16):
        grp = lengths[start:start + 16]
        data, lens, blobs = _batch(grp, seed=start)
        got_c = np.asarray(ckd.crc32_blocks(data, lens, N))
        got_a = np.asarray(ckd.adler32_blocks(data, lens, N))
        for i in range(len(grp)):
            assert int(got_c[i]) == (zlib.crc32(blobs[i]) & 0xFFFFFFFF)
            assert int(got_a[i]) == (zlib.adler32(blobs[i]) & 0xFFFFFFFF)
