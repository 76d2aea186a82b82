"""Match-finder v2 tests: the hybrid device stage vs the host oracle, and
the Pallas candidate-select kernel (interpret mode) vs its XLA reference."""
import zlib

import numpy as np
import pytest

from qatzip_tpu.native import qzcore as native
from qatzip_tpu.ops import match_finder as mf


def _pack(datas, n=4096):
    data = np.zeros((len(datas), n + 8), np.uint8)
    lens = np.zeros((len(datas),), np.int32)
    for i, d in enumerate(datas):
        data[i, :len(d)] = np.frombuffer(d, np.uint8)
        lens[i] = len(d)
    return data, lens


@pytest.mark.parametrize("kind", ["text", "constant", "random", "iterative"])
def test_candidates_roundtrip_bit_exact(corpus_factory, kind):
    import jax.numpy as jnp

    datas = [corpus_factory(s, kind) for s in (100, 4000, 4096, 1)]
    arr, lens = _pack(datas)
    cand = np.asarray(mf.find_candidates(jnp.asarray(arr), jnp.asarray(lens)))
    for i, d in enumerate(datas):
        payload = native.deflate_candidates(d, cand[i], 1)
        assert zlib.decompress(payload, -15) == d


def test_candidates_ratio_at_least_zlib(corpus_factory):
    """Compressed size must stay <= zlib at the same level (the BASELINE
    correctness contract)."""
    import jax.numpy as jnp

    datas = [corpus_factory(4096, k) for k in
             ("text", "constant", "iterative")] * 2
    arr, lens = _pack(datas)
    cand = np.asarray(mf.find_candidates(jnp.asarray(arr), jnp.asarray(lens)))
    ours = zl = 0
    for i, d in enumerate(datas):
        ours += len(native.deflate_candidates(d, cand[i], 1))
        co = zlib.compressobj(1, zlib.DEFLATED, -15)
        zl += len(co.compress(d) + co.flush())
    assert ours <= zl * 1.01 + 64


def test_pallas_select_matches_xla_reference(corpus_factory):
    """The Pallas VMEM select kernel (interpret mode on CPU) must produce
    the identical candidate distances as the XLA reference path."""
    import jax
    import jax.numpy as jnp

    from qatzip_tpu.ops import pallas_select

    datas = [corpus_factory(4096, k) for k in ("text", "constant")]
    arr, lens = _pack(datas)
    B, n = arr.shape[0], 4096
    d32 = jnp.asarray(arr).astype(jnp.uint32)
    b4 = (d32[:, 0:n] | (d32[:, 1:n + 1] << 8)
          | (d32[:, 2:n + 2] << 16) | (d32[:, 3:n + 3] << 24))
    b4b = jnp.concatenate([b4[:, 4:], jnp.zeros((B, 4), jnp.uint32)], axis=-1)
    h = ((b4 & jnp.uint32(0xFFFFFF)) * jnp.uint32(2654435761)) >> jnp.uint32(17)
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = pos + 2 < jnp.asarray(lens)[:, None]
    key1 = jnp.where(valid, (h << jnp.uint32(16)) | pos.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    sk, sb4, sb4b = jax.lax.sort((key1, b4, b4b), num_keys=1, is_stable=True)

    got = np.asarray(pallas_select.select_candidates(sk, sb4, sb4b, 4,
                                                     interpret=True))

    # XLA reference (same math as match_finder's fallback branch)
    def shift_right(a, k, fill):
        pad = jnp.full((B, k), fill, a.dtype)
        return jnp.concatenate([pad, a[:, :-k]], axis=-1)

    INV = jnp.uint32(0xFFFFFFFF)
    cur_pos = (sk & jnp.uint32(0xFFFF)).astype(jnp.int32)
    cur_h = sk >> jnp.uint32(16)
    cur_ok = sk != INV
    best8 = jnp.zeros((B, n), jnp.int32)
    best4 = jnp.zeros((B, n), jnp.int32)
    best3 = jnp.zeros((B, n), jnp.int32)
    for dd in range(1, 5):
        ck = shift_right(sk, dd, INV)
        cb4 = shift_right(sb4, dd, jnp.uint32(0))
        cb4b = shift_right(sb4b, dd, jnp.uint32(0))
        cpos = (ck & jnp.uint32(0xFFFF)).astype(jnp.int32)
        dist = cur_pos - cpos
        ok = (cur_ok & (ck != INV) & ((ck >> jnp.uint32(16)) == cur_h)
              & (dist >= 1) & (dist <= 32767))
        eq4 = ok & (cb4 == sb4)
        eq8 = eq4 & (cb4b == sb4b)
        eq3 = ok & (((cb4 ^ sb4) & jnp.uint32(0xFFFFFF)) == 0)
        best8 = jnp.where((best8 == 0) & eq8, dist, best8)
        best4 = jnp.where((best4 == 0) & eq4, dist, best4)
        best3 = jnp.where((best3 == 0) & eq3, dist, best3)
    best3 = jnp.where(best3 < 4096, best3, 0)
    want = np.asarray(jnp.where(best8 > 0, best8,
                                jnp.where(best4 > 0, best4, best3)))
    assert (got == want).all()


def test_candidates_stride_mode_valid(corpus_factory):
    """QATZIP_TPU_MF_STRIDE>1 (experimental speed mode) must stay
    bit-exact even though ratio degrades."""
    import jax.numpy as jnp

    datas = [corpus_factory(4000, "text")]
    arr, lens = _pack(datas)
    cand = np.asarray(mf.find_candidates(jnp.asarray(arr), jnp.asarray(lens),
                                         stride=2))
    payload = native.deflate_candidates(datas[0], cand[0], 1)
    assert zlib.decompress(payload, -15) == datas[0]


def test_legacy_full_device_encoder_path(corpus_factory, monkeypatch):
    """QATZIP_TPU_ENCODER=device keeps the round-1/2 full-device K1/K2
    pipeline alive and bit-exact."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    monkeypatch.setenv("QATZIP_TPU_ENCODER", "device")
    import gzip

    import qatzip_tpu as qz
    from qatzip_tpu.constants import QzDataFormat

    data = corpus_factory(30_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP,
                       level=1, hw_buff_sz=4096)
    assert gzip.decompress(comp) == data
