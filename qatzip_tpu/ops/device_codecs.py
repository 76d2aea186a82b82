"""Registration of device (TPU) codecs.

As TPU kernels come online they are registered here per (format, direction).
Until a kernel exists for a format, the engine transparently routes that
format to the CPU backend (the reference's sw-fallback contract).
"""
from __future__ import annotations


def register_all() -> None:
    # Codec registrations are added as kernels land:
    #   registry.register(DataFormatInternal.DEFLATE_GZIP, "compress", codec)
    # See qatzip_tpu/ops/deflate_encode.py, lz4_kernels.py.
    pass
