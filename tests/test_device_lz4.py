"""LZ4/LZ4s device-encode tests: the device match-finder + native byte
assembler must produce frames the CPU/byte-level oracles accept bit-safe
(reference HW LZ4 path src/qatzip_utils.c:264-341, qatzip_lz4.c)."""
import pytest

import qatzip_tpu as qz
import qatzip_tpu.session as S


@pytest.mark.parametrize("kind", ["text", "constant", "random"])
def test_lz4_device_roundtrip(monkeypatch, corpus_factory, kind):
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import core as ec

    data = corpus_factory(100_000, kind)
    before = ec._engine.hw_requests
    comp = qz.compress(data, "lz4", hw_buff_sz=16384)
    assert ec._engine.hw_requests > before  # device path engaged
    assert qz.decompress(comp, "lz4", hw_buff_sz=16384, sw_only=True) == data


def test_lz4_device_matches_frame_magic(monkeypatch, corpus_factory):
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    data = corpus_factory(50_000, "text")
    comp = qz.compress(data, "lz4", hw_buff_sz=16384)
    assert comp[:4] == b"\x04\x22\x4d\x18"  # LZ4 frame magic


def test_lz4s_device_roundtrip(monkeypatch, corpus_factory):
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    data = corpus_factory(80_000, "text")
    sess = qz.QzSession()
    p = qz.QzSessionParamsLZ4S(
        common_params=S.QzSessionParamsCommon(comp_lvl=1, hw_buff_sz=16384))
    assert qz.qz_setup_session_lz4s(sess, p) == qz.QZ_OK
    res = qz.qz_compress(sess, data)
    assert res.rc == qz.QZ_OK
    s2 = qz.QzSession()
    qz.qz_setup_session_lz4s(s2, p)
    d = qz.qz_decompress(s2, res.data)
    assert d.rc == qz.QZ_OK and d.data == data


def test_lz4_device_tiny_and_incompressible(monkeypatch, corpus_factory):
    """End-of-block rules: tiny inputs are all-literal; incompressible
    chunks take the stored-block escape."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    for size in (1, 12, 13, 64, 4096):
        data = corpus_factory(size, "random")
        comp = qz.compress(data, "lz4", hw_buff_sz=4096)
        assert qz.decompress(comp, "lz4", sw_only=True,
                             hw_buff_sz=4096) == data
