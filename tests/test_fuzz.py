"""Seeded corruption fuzz: random mutations of valid compressed streams
across formats must produce clean error codes (or a correct partial/full
decode) — never exceptions, hangs, or silently wrong bytes.

Complements the targeted negative matrix (test_negative.py) the way the
reference's random modes complement qzFuncTests: the corruption space is
sampled, not enumerated.  Every accepted decode is re-verified against the
original prefix property: output must be a prefix-consistent decode of the
member structure (we check it equals the original when rc == OK and
consumed covers the whole input and checksums were intact by chance).
"""
import numpy as np
import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QzDataFormat

_OK_CODES = {qz.QZ_OK, qz.QZ_DATA_ERROR, qz.QZ_BUF_ERROR, qz.QZ_FAIL}


def _mk_sess(fmt):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.comp_lvl = 1
    p.data_fmt = fmt
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    return sess


@pytest.mark.parametrize("fmt", [QzDataFormat.QZ_DEFLATE_GZIP,
                                 QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                                 QzDataFormat.QZ_DEFLATE_4B])
def test_corruption_fuzz_deflate_formats(corpus_factory, fmt):
    rng = np.random.default_rng(hash(fmt) & 0xFFFF)
    data = corpus_factory(120_000, "text")
    comp = bytearray(qz.qz_compress(_mk_sess(fmt), data).data)
    for trial in range(60):
        buf = bytearray(comp)
        kind = trial % 3
        if kind == 0:    # point mutations
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(0, len(buf)))] ^= int(
                    rng.integers(1, 256))
        elif kind == 1:  # truncation
            buf = buf[:int(rng.integers(1, len(buf)))]
        else:            # splice a random window over a random offset
            w = int(rng.integers(4, 64))
            src = int(rng.integers(0, len(buf) - w))
            dst = int(rng.integers(0, len(buf) - w))
            buf[dst:dst + w] = buf[src:src + w]
        res = qz.qz_decompress(_mk_sess(fmt), bytes(buf))
        assert res.rc in _OK_CODES, (fmt, trial, res.rc)
        if res.rc == qz.QZ_OK and fmt != QzDataFormat.QZ_DEFLATE_4B:
            # CRC-protected formats: any accepted output must be a prefix
            # of the original content (CRCs guard each member).  DEFLATE_4B
            # carries NO checksum on the wire (length + raw deflate, same
            # as the reference) so payload corruption that still inflates
            # is undetectable by design — rc class only for it.
            assert data.startswith(res.data) or res.data == data, \
                (fmt, trial, "accepted corrupt data")


def test_corruption_fuzz_lz4(corpus_factory):
    rng = np.random.default_rng(99)
    data = corpus_factory(100_000, "text")
    sess = qz.QzSession()
    assert qz.qz_setup_session_lz4(sess, qz.QzSessionParamsLZ4()) == qz.QZ_OK
    comp = bytearray(qz.qz_compress(sess, data).data)
    for trial in range(40):
        buf = bytearray(comp)
        if trial % 2 == 0:
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(0, len(buf)))] ^= int(
                    rng.integers(1, 256))
        else:
            buf = buf[:int(rng.integers(1, len(buf)))]
        dsess = qz.QzSession()
        qz.qz_setup_session_lz4(dsess, qz.QzSessionParamsLZ4())
        res = qz.qz_decompress(dsess, bytes(buf))
        assert res.rc in _OK_CODES, (trial, res.rc)
        if res.rc == qz.QZ_OK:
            assert data.startswith(res.data) or res.data == data


def test_corruption_fuzz_device_path(corpus_factory, monkeypatch):
    """Same fuzz with the lockstep device decode forced: the kernel (or its
    per-chunk failover) must surface identical code classes."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    rng = np.random.default_rng(7)
    data = corpus_factory(100_000, "text")
    fmt = QzDataFormat.QZ_DEFLATE_GZIP_EXT
    comp = bytearray(qz.qz_compress(_mk_sess(fmt), data).data)
    for trial in range(20):
        buf = bytearray(comp)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(0, len(buf)))] ^= int(rng.integers(1, 256))
        res = qz.qz_decompress(_mk_sess(fmt), bytes(buf))
        assert res.rc in _OK_CODES, (trial, res.rc)
        if res.rc == qz.QZ_OK:
            assert data.startswith(res.data) or res.data == data
