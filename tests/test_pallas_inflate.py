"""Lockstep inflate engine tests: packed two-level tables, the shared
decode step via the XLA driver, the Pallas driver in interpreter mode,
token appliers (native vs python), and the packed candidate D2H format.
"""
import zlib

import numpy as np
import pytest

import qatzip_tpu  # noqa: F401  (sys.path + platform setup via conftest)
from qatzip_tpu.ops import deflate_decode as dd
from qatzip_tpu.ops import pallas_inflate as PI


def _raw(data: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def _decode_one(payload: bytes, hint: int, use_pallas: bool,
                interpret: bool = False, NW: int = 4096,
                max_steps: int = 16384):
    """Drive decode_blocks directly for a single-block stream whose first
    deflate block is a Huffman block starting at bit 3."""
    s = dd._Stream(payload, hint, 0)
    kind = dd._parse_one_header(s)
    assert kind == "huff"
    spec = PI.region_spec(use_pallas)
    tll, td = dd._lockstep_regions(s, spec)
    B = PI.LANES
    byte0 = s.bits.pos >> 3
    pv = np.frombuffer(payload, np.uint8, len(payload) - byte0, byte0)
    stream8 = np.zeros((B, NW * 4), np.uint8)
    stream8[0, :len(pv)] = pv
    bit0 = np.zeros(B, np.int32)
    bit0[0] = s.bits.pos & 7
    nbits = np.zeros(B, np.int32)
    nbits[0] = len(pv) * 8
    tlls = np.zeros((B, spec[2]), np.uint32)
    tds = np.zeros((B, spec[3]), np.uint32)
    tlls[0], tds[0] = tll, td
    active = np.zeros(B, bool)
    active[0] = True
    if use_pallas:
        from qatzip_tpu.ops import pallas_inflate_kernel as K

        return K.decode_pallas(stream8.view("<u4"), bit0, nbits, tlls, tds,
                               active, max_steps, interpret=interpret)
    return PI.decode_blocks(stream8.view("<u4"), bit0, nbits, tlls, tds,
                            active, max_steps, use_pallas=False)


@pytest.mark.parametrize("level", [1, 6, 9])
@pytest.mark.parametrize("kind", ["text", "iterative", "constant"])
def test_xla_driver_bit_exact(corpus_factory, kind, level):
    data = corpus_factory(3000, kind)
    payload = _raw(data, level)
    tokens, err, outcnt, end_bit, ns = _decode_one(payload, len(data),
                                                   use_pallas=False)
    assert not err[0]
    out = dd._apply_tokens_py(tokens[:, 0], b"", int(outcnt[0]))
    assert out == data


def test_native_and_python_appliers_agree(corpus_factory):
    from qatzip_tpu.native import qzcore as native

    data = corpus_factory(20000, "text")
    payload = _raw(data, 6)
    tokens, err, outcnt, end_bit, ns = _decode_one(payload, len(data),
                                                   use_pallas=False)
    assert not err[0]
    t = np.ascontiguousarray(tokens)
    a = native.apply_tokens(t, 0, b"", 0, int(outcnt[0]))
    b = dd._apply_tokens_py(t[:, 0], b"", int(outcnt[0]))
    assert a == b == data


def test_pallas_driver_interpret_matches_xla(corpus_factory):
    """The lane-major Pallas driver in interpreter mode must agree with
    the XLA reference driver (and zlib) on a small dynamic-Huffman
    stream."""
    data = corpus_factory(600, "text")
    payload = _raw(data, 6)
    tok_p, err_p, cnt_p, end_p, ns_p = _decode_one(payload, len(data),
                                                   use_pallas=True,
                                                   interpret=True,
                                                   NW=1024, max_steps=1024)
    assert not err_p[0]
    out = dd._apply_tokens_py(tok_p[:, 0], b"", int(cnt_p[0]))
    assert out == data
    _, err_x, cnt_x, end_x, _ = _decode_one(payload, len(data),
                                            use_pallas=False)
    assert int(cnt_p[0]) == int(cnt_x[0])
    assert int(end_p[0]) == int(end_x[0])


def test_region_builder_rejects_oversubscribed():
    lens = np.zeros(286, np.int32)
    lens[:4] = 1  # four 1-bit codes: Kraft violation
    with pytest.raises(ValueError):
        PI.build_ll_region(lens)


def test_invalid_symbol_codes_decode_to_error():
    """Static-code symbols 286/287 own code space but must error a lane."""
    llr, _ = PI.static_regions()
    # code for symbol 286 is 8 bits: 11000110 (RFC1951 static table)
    # decode entry for those stream bits must be the invalid entry 0
    code = 0b11000110
    rev = int(f"{code:08b}"[::-1], 2)
    cell = int(llr[rev >> 1])
    e16 = (cell >> (16 * (rev & 1))) & 0xFFFF
    assert e16 == 0


# ---------------------------------------------------------------------------
# Packed candidate D2H format (match_finder.find_candidates_packed)
# ---------------------------------------------------------------------------
def test_packed_candidates_bit_exact_and_bounded(corpus_factory):
    import jax.numpy as jnp

    from qatzip_tpu.native import qzcore as native
    from qatzip_tpu.ops import match_finder as mf

    n = 16384
    blocks = [corpus_factory(n, "text"), corpus_factory(n, "random"),
              corpus_factory(n, "constant")]
    arr = np.zeros((len(blocks), n + 8), np.uint8)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8)
    lens = np.full(len(blocks), n, np.int32)
    packed = np.asarray(mf.find_candidates_packed(jnp.asarray(arr),
                                                  jnp.asarray(lens)))
    assert packed.shape[1] == 3 * n // 4  # the 0.75 B/B contract
    unpacked = np.asarray(mf.find_candidates(jnp.asarray(arr),
                                             jnp.asarray(lens)))
    for i, src in enumerate(blocks):
        p1 = native.deflate_candidates_packed(src, packed[i], 1)
        p0 = native.deflate_candidates(src, unpacked[i], 1)
        assert zlib.decompress(p1, -15) == src, "packed path not bit-exact"
        # packing may cost a few % (dropped exception candidates) but must
        # stay in the same size class as the exact-candidate path
        assert len(p1) <= max(len(p0) * 1.35, len(p0) + 64)


def test_packed_candidates_through_public_api(corpus_factory, monkeypatch):
    import qatzip_tpu as qz
    from qatzip_tpu.constants import QzDataFormat

    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    monkeypatch.setenv("QATZIP_TPU_PACK", "1")
    data = corpus_factory(100_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
    assert qz.decompress(comp, "deflate") == data


def test_literal_pairing_engages_and_is_exact(corpus_factory):
    """Root-literal pairing (token bit 9 + byte in 10..17) must actually
    fire on literal-heavy input — it is ~8% of decode throughput — and the
    paired stream must reproduce the data byte-exactly through both
    appliers."""
    from qatzip_tpu.native import qzcore as native

    data = corpus_factory(20000, "text")
    payload = _raw(data, 1)
    tokens, err, outcnt, end_bit, ns = _decode_one(payload, len(data),
                                                   use_pallas=False)
    assert not err[0]
    lane = np.ascontiguousarray(tokens)[:, 0]
    lits = lane[(lane & 1) == 1]
    paired = int(((lits & 0x200) != 0).sum())
    assert paired > 0, "pairing never engaged on literal-heavy text"
    # steps < symbols proves the pairing saved steps
    nlit = int(((lane & 1) == 1).sum()) + paired
    nmatch = int(((lane & 3) == 2).sum())
    assert int(ns) < nlit + nmatch + 1
    t = np.ascontiguousarray(tokens)
    a = native.apply_tokens(t, 0, b"", 0, int(outcnt[0]))
    b = dd._apply_tokens_py(t[:, 0], b"", int(outcnt[0]))
    assert a == b == data
