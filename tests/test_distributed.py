"""Distributed layer tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    from qatzip_tpu.parallel.shard import make_mesh
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_compress_matches_single(mesh8, corpus_factory):
    import zlib
    from qatzip_tpu.parallel.shard import compress_blocks_sharded
    from qatzip_tpu.ops import deflate_encode as de

    n = 4096
    b = 16
    blob = corpus_factory(b * n)
    data = np.zeros((b, n + 8), np.uint8)
    data[:, :n] = np.frombuffer(blob, np.uint8).reshape(b, n)
    lens = np.full((b,), n, np.int32)

    words, bits, mode = compress_blocks_sharded(mesh8, data, lens)
    words = np.asarray(words)
    bits = np.asarray(bits)
    mode = np.asarray(mode)

    # every block decodes bit-exact through zlib, in block order
    out = bytearray()
    for i in range(b):
        if mode[i] == de.MODE_STORED:
            out += blob[i * n:(i + 1) * n]
        else:
            payload = words[i].tobytes()[: (int(bits[i]) + 7) // 8]
            out += zlib.decompressobj(-15).decompress(payload)
    assert bytes(out) == blob


def test_sharded_output_sharding(mesh8):
    from qatzip_tpu.parallel.shard import compress_blocks_sharded

    n = 1024
    b = 8
    data = np.zeros((b, n + 8), np.uint8)
    lens = np.full((b,), n, np.int32)
    words, bits, _ = compress_blocks_sharded(mesh8, data, lens)
    # output stays sharded over the block axis (one block per device)
    assert len(words.sharding.device_set) == 8


def test_scaling_report_runs(mesh8):
    from qatzip_tpu.parallel.shard import scaling_report
    rep = scaling_report(mesh8, block_bytes=1024, blocks_per_device=2, reps=2)
    assert rep["devices"] == 8
    assert rep["mesh_Bps"] > 0 and rep["single_device_Bps"] > 0
