"""Boundary sweep: port of the reference bt.c bit-exactness fuzz loop
(test/bt.c:137-165): every input length in a range, three corpora,
compress+decompress+memcmp."""
import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QzDataFormat
from tests.conftest import make_corpus
import random


@pytest.mark.parametrize("kind", ["iterative", "random", "constant"])
@pytest.mark.parametrize("fmt", [QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                                 QzDataFormat.QZ_DEFLATE_4B])
def test_boundary_sweep_deflate(kind, fmt):
    r = random.Random(1234)
    # small-length exhaustive region + strided larger region (bt.c defaults)
    lengths = list(range(0, 132)) + list(range(1000, 70000, 7321))
    for n in lengths:
        data = make_corpus(r, n, kind)
        comp = qz.compress(data, "deflate", fmt=fmt, hw_buff_sz=4096)
        out = qz.decompress(comp, "deflate", fmt=fmt, hw_buff_sz=4096)
        assert out == data, f"mismatch at len={n} kind={kind}"


@pytest.mark.parametrize("kind", ["iterative", "random", "constant"])
def test_boundary_sweep_lz4(kind):
    r = random.Random(99)
    lengths = list(range(0, 100, 7)) + list(range(500, 40000, 4999))
    for n in lengths:
        data = make_corpus(r, n, kind)
        comp = qz.compress(data, "lz4", hw_buff_sz=16384)
        out = qz.decompress(comp, "lz4", hw_buff_sz=16384)
        assert out == data, f"mismatch at len={n} kind={kind}"
