"""Arithmetic code computation + one-hot lookup exactness tests."""
import numpy as np
import jax
import jax.numpy as jnp

from qatzip_tpu.ops import deflate_tables as T
from qatzip_tpu.ops.codes import (dist_code, length_code, onehot_histogram,
                                  onehot_lookup)


def test_length_code_arithmetic_exact():
    lens = jnp.arange(3, 259)
    c, eb, ev = jax.jit(length_code)(lens)
    assert (np.asarray(c) == T.LENGTH_CODE[3:259]).all()
    assert (np.asarray(eb) == T.LENGTH_EXTRA_BITS[3:259]).all()
    assert (np.asarray(ev) == T.LENGTH_EXTRA_VAL[3:259]).all()


def test_dist_code_arithmetic_exact():
    dists = jnp.arange(1, 32769)
    c, eb, ev = jax.jit(dist_code)(dists)
    assert (np.asarray(c) == T.DIST_CODE[1:]).all()
    assert (np.asarray(eb) == T.DIST_EXTRA_BITS[1:]).all()
    assert (np.asarray(ev) == T.DIST_EXTRA_VAL[1:]).all()


def test_onehot_lookup_exact():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 15, (286, 2)), dtype=jnp.int32)
    idx = jnp.asarray(rng.integers(0, 286, 1000), dtype=jnp.int32)
    out = jax.jit(onehot_lookup)(idx, tbl)
    assert (np.asarray(out).astype(np.int64)
            == np.asarray(tbl)[np.asarray(idx)]).all()


def test_onehot_histogram_exact():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.integers(0, 2, 100000), dtype=jnp.int32)
    i2 = jnp.asarray(rng.integers(0, 286, 100000), dtype=jnp.int32)
    h = jax.jit(onehot_histogram, static_argnums=2)(i2, w, 286)
    ref = np.bincount(np.asarray(i2), weights=np.asarray(w),
                      minlength=286).astype(int)
    assert (np.asarray(h) == ref).all()


def test_native_qzcore_cross_validation():
    from qatzip_tpu.native import qzcore
    from qatzip_tpu.engine import lz4_block
    if qzcore is None:
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(2)
    for data in (b"", b"x", b"hello world " * 500,
                 bytes(rng.integers(0, 256, 50000, dtype=np.uint8)),
                 b"A" * 30000):
        c = qzcore.lz4_compress_block(data)
        assert qzcore.lz4_decompress_block(c, len(data) + 16) == data
        assert lz4_block.lz4_block_decompress(c, len(data) + 16) == data
        cp = lz4_block.lz4_block_compress(data)
        assert qzcore.lz4_decompress_block(cp, len(data) + 16) == data
        for mm in (3, 4):
            cs = qzcore.lz4s_compress_block(data, mm)
            assert qzcore.lz4s_decompress_block(cs, len(data) + 16, mm) == data
            assert lz4_block.lz4s_block_decompress(cs, len(data) + 16,
                                                   mm) == data
