"""TPU backend: routes chunk batches to JAX/Pallas codec kernels.

This is the analog of the QAT ASIC + instance pool in the reference
(src/qatzip.c:363-437, 1483-1764): chunks are batched into fixed-shape
device arrays, dispatched asynchronously, and gathered in block order.

Kernel availability is per-(algorithm, direction); anything unsupported
reports False from supports() and the engine routes it to the CPU backend,
exactly like the reference's isQATProcessable gate
(src/qatzip_utils.c:997-1033).
"""
from __future__ import annotations

from typing import Sequence

from qatzip_tpu.constants import DataFormatInternal, QzDirection
from qatzip_tpu.engine.backend import Backend, CompressedChunk, DecompressedChunk
from qatzip_tpu.session import InternalParams


class TpuBackend(Backend):
    name = "tpu"
    is_hw = True

    def __init__(self, devices):
        self.devices = devices
        self.device_kind = devices[0].device_kind if devices else "unknown"
        self.num_devices = len(devices)
        self._codecs = {}

    @classmethod
    def create(cls) -> "TpuBackend | None":
        try:
            import jax
            devices = jax.devices()
        except Exception:
            return None
        if not devices:
            return None
        from qatzip_tpu.engine.instances import pool
        pool.resize(len(devices))
        return cls(devices)

    # -- capability gate ----------------------------------------------------
    def supports(self, params: InternalParams, direction: QzDirection) -> bool:
        from qatzip_tpu.ops import registry
        return registry.supports(params, direction)

    # -- dispatch -----------------------------------------------------------
    # Cross-session multiplexing: concurrent sessions take instance slots
    # from the bounded pool (qzGrabInstance analog, engine/instances.py);
    # a saturated pool raises and the engine's failover routes that
    # request to the CPU instead of piling onto the device queue.
    GRAB_TIMEOUT_S = 10.0

    def compress_chunks(self, chunks: Sequence[bytes],
                        params: InternalParams) -> list[CompressedChunk]:
        from qatzip_tpu.engine.instances import pool
        from qatzip_tpu.ops import registry
        codec = registry.get_codec(params)
        with pool.instance(timeout=self.GRAB_TIMEOUT_S) as inst:
            if inst is None:
                raise RuntimeError("device instance pool saturated")
            return codec.compress_chunks(chunks, params)

    def decompress_chunks(self, payloads: Sequence[bytes],
                          out_size_hints: Sequence[int],
                          params: InternalParams) -> list[DecompressedChunk]:
        from qatzip_tpu.engine.instances import pool
        from qatzip_tpu.ops import registry
        codec = registry.get_codec(params)
        with pool.instance(timeout=self.GRAB_TIMEOUT_S) as inst:
            if inst is None:
                raise RuntimeError("device instance pool saturated")
            return codec.decompress_chunks(payloads, out_size_hints, params)
