"""Native (C++) host-side runtime pieces.

The reference implements its host inner loops in C; here the hot host-side
paths (LZ4/LZ4s block codecs, bitstream repack) are C++ compiled to
``libqzcore.so`` and loaded via ctypes.  Build with:

    python -m qatzip_tpu.native.build

Pure-Python fallbacks exist for every function, so the extension is an
optimization, never a requirement.
"""
from __future__ import annotations

try:
    from qatzip_tpu.native import qzcore  # noqa: F401
except Exception:  # pragma: no cover - extension not built
    qzcore = None
