"""Async batch mode (reference src/qatzip.c:3090-4196).

The reference's per-session MPMC ring (1024 deep) + consumer thread +
poller thread map to a bounded queue + worker thread here; completion is
exposed both as a Future and via the reference-style callback
(include/qatzip.h:922: qzCallbackFn(external, src, src_len, dest, dest_len,
rc, ext_rc)).

On TPU the real async engine is JAX's own async dispatch — the worker simply
keeps the device queue fed with chunk batches while completions drain in
submission order, which is what the reference's consumer/poller pair does
for the ASIC.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, Optional

from qatzip_tpu import constants as C
from qatzip_tpu.engine import core
from qatzip_tpu.session import QzSession

ASYNC_RING_DEPTH = 1024  # reference src/qatzip_internal.h:327


@dataclass
class QzResult:
    """Analog of QzResult_T (reference include/qatzip.h:865-905)."""

    rc: int = C.QZ_NONE
    data: bytes = b""
    consumed: int = 0
    ext_rc: int = 0
    done: bool = False


@dataclass
class _Request:
    direction: str
    src: bytes
    last: int
    future: Future = field(default_factory=Future)
    callback: Optional[Callable] = None
    external: object = None
    result: QzResult = field(default_factory=QzResult)


class AsyncCtrl:
    """Per-session async control block (reference qzSetupAsyncCtrl,
    src/qatzip.c:3977-4011): bounded ring + consumer thread."""

    def __init__(self, sess: QzSession):
        self.sess = sess
        self.ring: queue.Queue = queue.Queue(maxsize=ASYNC_RING_DEPTH)
        self.shutdown_evt = threading.Event()
        self.worker = threading.Thread(target=self._consume, daemon=True,
                                       name="qzt-async-consumer")
        self.worker.start()

    def submit(self, req: _Request) -> int:
        try:
            self.ring.put_nowait(req)
        except queue.Full:
            return C.QZ_FAIL
        return C.QZ_OK

    def _consume(self) -> None:
        while not self.shutdown_evt.is_set():
            try:
                req = self.ring.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                if req.direction == "compress":
                    res = core.compress_ext(self.sess, req.src, last=req.last)
                else:
                    res = core.decompress_ext(self.sess, req.src)
                req.result.rc = res.rc
                req.result.data = res.data
                req.result.consumed = res.consumed
                req.result.ext_rc = res.ext_rc
            except Exception as exc:  # pragma: no cover
                req.result.rc = C.QZ_FAIL
                req.result.ext_rc = 0
                req.future.set_exception(exc)
                continue
            finally:
                req.result.done = True
            if req.callback is not None:
                try:
                    req.callback(req.external, req.src, req.result.consumed,
                                 req.result.data, len(req.result.data),
                                 req.result.rc, req.result.ext_rc)
                except Exception:
                    pass
            req.future.set_result(req.result)

    def shutdown(self) -> None:
        self.shutdown_evt.set()
        self.worker.join(timeout=2.0)


def _ensure_ctrl(sess: QzSession) -> AsyncCtrl:
    if sess.async_ctrl is None:
        sess.async_ctrl = AsyncCtrl(sess)
    return sess.async_ctrl


def qz_compress2(sess: QzSession, src, last: int = 1,
                 callback: Optional[Callable] = None,
                 external: object = None):
    """qzCompress2 analog (reference src/qatzip.c:4112-4153).

    With callback=None and wait=True semantics the reference degrades to the
    synchronous path; here a Future is always returned alongside the status.
    Returns (rc, Future[QzResult])."""
    from qatzip_tpu.api import _auto_session
    rc = _auto_session(sess)
    if rc < 0:
        return rc, None
    ctrl = _ensure_ctrl(sess)
    req = _Request("compress", bytes(src), last, callback=callback,
                   external=external)
    rc = ctrl.submit(req)
    return rc, req.future


def qz_decompress2(sess: QzSession, src,
                   callback: Optional[Callable] = None,
                   external: object = None):
    """qzDecompress2 analog."""
    from qatzip_tpu.api import _auto_session
    rc = _auto_session(sess)
    if rc < 0:
        return rc, None
    ctrl = _ensure_ctrl(sess)
    req = _Request("decompress", bytes(src), 1, callback=callback,
                   external=external)
    rc = ctrl.submit(req)
    return rc, req.future
