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


@functools.lru_cache(maxsize=16)
def _sharded_encoder(mesh_key, n: int, depth: int, kwords: int,
                     allow_dynamic: bool, m_words: int):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qatzip_tpu.ops import deflate_encode as de

    mesh = _MESHES[mesh_key]
    data_sh = NamedSharding(mesh, P("block", None))
    len_sh = NamedSharding(mesh, P("block"))

    fn = functools.partial(de.encode_blocks.__wrapped__, depth=depth,
                           kwords=kwords, allow_dynamic=allow_dynamic,
                           m_words=m_words)
    return jax.jit(fn, in_shardings=(data_sh, len_sh),
                   out_shardings=(data_sh, len_sh, len_sh))


_MESHES: dict = {}


def compress_blocks_sharded(mesh, data_pad: np.ndarray, lengths: np.ndarray,
                            depth: int = 1, kwords: int = 16,
                            allow_dynamic: bool = True,
                            m_words: int | None = None):
    """Compress a [B, N+8] batch sharded over the mesh's block axis.

    B must be a multiple of the mesh size (callers pad).  Returns
    (words [B, m_words], bits [B], mode [B]) with outputs sharded the same
    way; conversion to host bytes walks blocks in order.
    """
    import jax.numpy as jnp

    from qatzip_tpu.ops import deflate_encode as de

    n = data_pad.shape[1] - 8
    if m_words is None:
        m_words = de.words_bound(n)
    key = id(mesh)
    _MESHES[key] = mesh
    enc = _sharded_encoder(key, n, depth, kwords, allow_dynamic, m_words)
    return enc(jnp.asarray(data_pad), jnp.asarray(lengths))


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
