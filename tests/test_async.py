"""Async batch mode tests (models reference test/main.c modes 28-29)."""
import threading

import qatzip_tpu as qz
from qatzip_tpu import constants as C
from qatzip_tpu.async_api import qz_compress2, qz_decompress2


def test_async_compress_futures(corpus_factory):
    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == C.QZ_OK
    datas = [corpus_factory(20_000 + i * 1000) for i in range(8)]
    futures = []
    for d in datas:
        rc, fut = qz_compress2(sess, d)
        assert rc == C.QZ_OK
        futures.append(fut)
    results = [f.result(timeout=30) for f in futures]
    for d, r in zip(datas, results):
        assert r.rc == C.QZ_OK
        assert qz.decompress(r.data, "deflate") == d
    qz.qz_close(sess)


def test_async_callback_mode(corpus_factory):
    """Callback-based completion (reference CallAsyncbackfn,
    src/qatzip.c:3103)."""
    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == C.QZ_OK
    done = threading.Event()
    got = {}

    def cb(external, src, consumed, dest, dest_len, rc, ext_rc):
        got.update(external=external, consumed=consumed, dest=dest, rc=rc)
        done.set()

    data = corpus_factory(30_000)
    rc, fut = qz_compress2(sess, data, callback=cb, external="ctx")
    assert rc == C.QZ_OK
    assert done.wait(timeout=30)
    assert got["rc"] == C.QZ_OK and got["external"] == "ctx"
    assert qz.decompress(got["dest"], "deflate") == data
    qz.qz_close(sess)


def test_async_roundtrip_decompress2(corpus_factory):
    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == C.QZ_OK
    data = corpus_factory(40_000)
    rc, fut = qz_compress2(sess, data)
    comp = fut.result(timeout=30)
    rc, fut2 = qz_decompress2(sess, comp.data)
    assert rc == C.QZ_OK
    out = fut2.result(timeout=30)
    assert out.rc == C.QZ_OK and out.data == data
    qz.qz_close(sess)


def test_async_parallel_execution_preserves_order(corpus_factory):
    """Multiple in-flight requests execute on the executor pool but
    complete strictly in submission order (the reference's seq invariant,
    src/qatzip.c:1641-1649)."""
    from qatzip_tpu.async_api import qz_compress2
    import qatzip_tpu as qz

    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == qz.QZ_OK
    datas = [corpus_factory(30_000 + 1000 * i) for i in range(12)]
    order = []
    futs = []
    for i, d in enumerate(datas):
        rc, fut = qz_compress2(sess, d,
                               callback=lambda ext, *a: order.append(ext),
                               external=i)
        assert rc == qz.QZ_OK
        futs.append(fut)
    results = [f.result(timeout=30) for f in futs]
    assert all(r.rc == qz.QZ_OK for r in results)
    assert order == list(range(12))
    for d, r in zip(datas, results):
        assert qz.decompress(r.data, "deflate") == d


def test_async_concurrent_submitters_stress(corpus_factory):
    """Many threads submitting on one session: seq assignment must stay
    unique (no completer stall) and session totals must balance."""
    import threading

    import qatzip_tpu as qz
    from qatzip_tpu import async_api

    sess = qz.QzSession()
    qz.qz_setup_session_deflate(sess)
    data = corpus_factory(20000)
    futures = []
    flock = threading.Lock()

    def submitter():
        for _ in range(25):
            rc, fut = async_api.qz_compress2(sess, data)
            assert rc == qz.QZ_OK
            with flock:
                futures.append(fut)

    threads = [threading.Thread(target=submitter) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(futures) == 100
    results = [f.result(timeout=60) for f in futures]
    for r in results:
        assert r.rc == qz.QZ_OK
        assert qz.decompress(bytes(r.data), "deflate", sw_only=True) == data
    # totals accounting must match exactly under concurrency
    assert sess.total_in == 100 * len(data)
    assert sess.total_out == sum(len(r.data) for r in results)
