"""Block data-parallel sharding over a device mesh.

The TPU equivalent of the reference's parallelism stack (SURVEY.md §2.3):
request-level chunk parallelism (src/qatzip.c:1505-1594) becomes sharding of
the block batch axis over a `jax.sharding.Mesh`; process-level scaling over
PCIe devices (config_file NumProcesses) becomes multi-host data parallelism
with one JAX process per host; the seq-number reassembly invariant
(src/qatzip.c:1641-1649) is preserved because the block axis order is the
submission order.

Per-block compressed lengths travel with the sharded result; hosts gather
payload bytes in block order (the ICI all-gather of lengths happens inside
jit when cross-block offsets are needed on device).
"""
from __future__ import annotations

import functools

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "block"):
    """Build a 1-D data-parallel mesh over the first n devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), axis_names=(axis,))


def compress_blocks_sharded(mesh, data_pad: np.ndarray, lengths: np.ndarray,
                            depth: int = 1, kwords: int = 16,
                            allow_dynamic: bool = True,
                            m_words: int | None = None):
    """Compress a [B, N+8] batch sharded over the mesh's block axis.

    B must be a multiple of the mesh size (callers pad).  Both device
    dispatches (K1 analyze, K2 pack) run sharded over the block axis; the
    host Huffman/header build between them operates on the gathered [B,286]
    histograms (a few KB).  Returns (words [B, m_words] sharded, bits [B],
    mode [B] numpy); conversion to host bytes walks blocks in order.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qatzip_tpu.native import qzcore as native
    from qatzip_tpu.ops import deflate_encode as de

    n = data_pad.shape[1] - 8
    if m_words is None:
        m_words = de.words_bound(n)

    row = NamedSharding(mesh, P("block"))
    mat = NamedSharding(mesh, P("block", None))
    data = jax.device_put(jnp.asarray(data_pad), mat)
    lens = jax.device_put(jnp.asarray(lengths), row)

    sel, take, mlen, mdist, freq_ll, freq_d = de.analyze_blocks(
        data, lens, depth, kwords)
    mode, ll_len, ll_code, d_len, d_code, hv, hn, _est = \
        native.huff_build_batch(np.asarray(freq_ll), np.asarray(freq_d),
                                np.asarray(lengths), allow_dynamic,
                                32 * m_words, de.HDR_MAX)

    def put(a):
        return jax.device_put(jnp.asarray(a), mat)

    words, bits = de.pack_blocks(data, sel, take, mlen, mdist,
                                 put(hv.astype(np.uint32)), put(hn),
                                 put(ll_len), put(ll_code),
                                 put(d_len), put(d_code), m_words)
    return words, bits, mode


def scaling_report(mesh, block_bytes: int = 65536, blocks_per_device: int = 8,
                   reps: int = 5) -> dict:
    """Scaling-efficiency harness (the run_perf_test.sh analog): measures
    blocks/s at 1 device vs the full mesh."""
    import time

    import jax

    from qatzip_tpu.ops import deflate_encode as de

    n = block_bytes
    rng = np.random.default_rng(0)

    def run(m):
        ndev = m.devices.size
        b = ndev * blocks_per_device
        data = np.zeros((b, n + 8), np.uint8)
        data[:, :n] = rng.integers(0, 256, (b, n), dtype=np.uint8)
        lens = np.full((b,), n, np.int32)
        out = compress_blocks_sharded(m, data, lens)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = compress_blocks_sharded(m, data, lens)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        return b * n / dt

    full = run(mesh)
    single = run(make_mesh(1))
    ndev = mesh.devices.size
    return {
        "devices": int(ndev),
        "single_device_Bps": single,
        "mesh_Bps": full,
        "speedup": full / single,
        "efficiency": full / (single * ndev),
    }
