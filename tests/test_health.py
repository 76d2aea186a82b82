"""Device-health breaker + mid-request failover tests (the heartbeat /
per-chunk SW reroute contract, reference src/qatzip.c:267-280, 1514-1522;
src/qatzip_sw.c:697-846)."""
import zlib

import pytest

import qatzip_tpu as qz
from qatzip_tpu.constants import QzDataFormat
from qatzip_tpu.engine.health import DeviceHealth, FAILURE_TRIP


def test_breaker_trips_and_recovers(monkeypatch):
    h = DeviceHealth()
    assert h.healthy()
    for _ in range(FAILURE_TRIP):
        h.record_failure()
    assert not h.healthy()  # breaker open
    # after cooldown exactly one probe is admitted
    import qatzip_tpu.engine.health as hm

    t = [1000.0]
    monkeypatch.setattr(hm.time, "monotonic", lambda: t[0])
    h2 = DeviceHealth()
    for _ in range(FAILURE_TRIP):
        h2.record_failure()
    t[0] += hm.COOLDOWN_S + 1
    assert h2.healthy()       # the probe
    assert not h2.healthy()   # second caller still blocked
    h2.record_success()       # probe succeeded -> breaker closes
    assert h2.healthy() and h2.healthy()


def test_engine_routes_sw_when_breaker_open(monkeypatch, corpus_factory):
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import core as engine_core
    from qatzip_tpu.engine.health import health

    data = corpus_factory(100_000)
    for _ in range(FAILURE_TRIP):
        health.record_failure()
    try:
        before_hw = engine_core._engine.hw_requests
        comp = qz.compress(data, "deflate",
                           fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT)
        assert engine_core._engine.hw_requests == before_hw  # stayed SW
        assert qz.decompress(comp, "deflate") == data
    finally:
        health.record_success()


def test_per_batch_compress_failover(monkeypatch, corpus_factory):
    """An injected submit fault fails one device batch; that batch falls
    back to the CPU, later batches stay on the device, output is valid
    end-to-end (compInSWFallback contract, reference src/qatzip_sw.c:
    697-748; injector = the ERR_INJECTION hook, include/qatzip.h:494-498)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.health import health

    # 300KB / 4KB chunks = ~74 chunks = two 64-chunk batches; fail only
    # the first
    faults.inject_error("submit", nth=1, direction="compress", count=1)
    try:
        data = corpus_factory(300_000, "text")
        fails_before = health.total_failures
        comp = qz.compress(data, "deflate",
                           fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                           level=1, hw_buff_sz=4096)
        assert health.total_failures == fails_before + 1
        assert not faults.armed()      # the fault fired
        assert qz.decompress(comp, "deflate", hw_buff_sz=4096,
                             sw_only=True) == data
        import gzip as _gzip

        assert _gzip.decompress(comp) == data
    finally:
        faults.clear()
        health.record_success()


def test_device_checksums_flow_through_api(monkeypatch, corpus_factory):
    """qz_compress_crc on the device path must report the same CRC32 the
    host would compute (device-fused checksum correctness at the API)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    data = corpus_factory(100_000, "text")
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.comp_lvl = 1
    p.common_params.hw_buff_sz = 16384
    p.data_fmt = QzDataFormat.QZ_DEFLATE_GZIP_EXT
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    res = qz.qz_compress_crc(sess, data)
    assert res.rc == qz.QZ_OK
    assert res.crc == (zlib.crc32(data) & 0xFFFFFFFF)
    sess2 = qz.QzSession()
    qz.qz_setup_session_deflate(sess2, p)
    dres = qz.qz_decompress_crc(sess2, res.data)
    assert dres.rc == qz.QZ_OK and dres.data == data
    assert dres.crc == (zlib.crc32(data) & 0xFFFFFFFF)


def test_flow_counters_balance(corpus_factory):
    """Every request leaves the four flow stages equal (the flow-counter
    race checker, reference src/qatzip.c:209-243)."""
    import qatzip_tpu as qz
    from qatzip_tpu.engine.flow import flow

    data = corpus_factory(300_000)
    comp = qz.compress(data, "deflate", sw_only=True,
                       fmt=qz.QzDataFormat.QZ_DEFLATE_GZIP_EXT
                       if hasattr(qz, "QzDataFormat") else None)
    assert qz.decompress(comp, "deflate", sw_only=True) == data
    d = qz.qz_dump_counters()
    assert d["flow_errors"] == 0
    assert d["planned"] == d["submitted"] == d["completed"] == d["reassembled"]


def test_flow_error_detected(monkeypatch, corpus_factory):
    """A backend that drops a chunk must trip the flow checker and fail
    the request instead of emitting corrupt output."""
    import qatzip_tpu as qz
    from qatzip_tpu.engine import core as ec
    from qatzip_tpu.engine.flow import flow

    real = ec.CpuBackend.compress_chunks

    def dropping(self, chunks, params):
        out = real(self, chunks, params)
        return out[:-1] if len(out) > 1 else out  # drop the last chunk

    monkeypatch.setattr(ec.CpuBackend, "compress_chunks", dropping)
    monkeypatch.setattr(ec, "_native", None)  # bypass the native C funnel
    data = corpus_factory(200_000)
    sess = qz.QzSession()
    assert qz.qz_setup_session_deflate(sess) == qz.QZ_OK
    errs_before = flow.dump()["flow_errors"]
    res = qz.qz_compress(sess, data)
    assert res.rc == qz.QZ_FAIL
    assert flow.dump()["flow_errors"] == errs_before + 1


def test_probe_slot_expires():
    """An admitted recovery probe that never reports an outcome (rerouted to
    the CPU by a later gate) must not blacklist the device forever."""
    from qatzip_tpu.engine import health as hm

    h = hm.DeviceHealth()
    for _ in range(hm.FAILURE_TRIP):
        h.record_failure()
    assert not h.healthy()          # breaker open, inside cooldown
    h._tripped_at -= hm.COOLDOWN_S + 1
    assert h.healthy()              # probe slot handed out
    assert not h.healthy()          # second caller blocked while inflight
    # probe vanished without record_success/record_failure: after the
    # timeout the slot must be re-offered
    h._probe_started -= hm.PROBE_TIMEOUT_S + 1
    assert h.healthy()


def test_instance_pool_admission():
    """qzGrabInstance analog: bounded slots, round-robin indices, saturated
    pool rejects instead of blocking forever (reference src/qatzip.c:363-437)."""
    from qatzip_tpu.engine.instances import InstancePool

    p = InstancePool(num_devices=2, oversub=1)   # 2 slots
    a = p.grab()
    b = p.grab()
    assert {a, b} == {0, 1}                      # round-robin across devices
    assert p.grab() is None                      # saturated -> SW route
    assert p.stats()["busy_rejects"] == 1
    p.release(a)
    c = p.grab()
    assert c is not None
    p.release(b)
    p.release(c)


def test_concurrent_sessions_multiplex(corpus_factory, monkeypatch):
    """Two sessions dispatching concurrently share the pool without
    deadlock and both produce valid output."""
    import threading

    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    import qatzip_tpu as qz

    data = corpus_factory(150_000)
    results = {}

    def run(name):
        comp = qz.compress(data, "deflate", level=1)
        results[name] = qz.decompress(comp, "deflate", sw_only=True)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert all(results[i] == data for i in range(4))


# ---------------------------------------------------------------------------
# Round 5: first-class fault injection (the reference's ERR_INJECTION
# session hooks, include/qatzip.h:494-498, implemented for real)
# ---------------------------------------------------------------------------
def _gz_sess(hw_buff_sz=8192, fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT):
    sess = qz.QzSession()
    p = qz.QzSessionParamsDeflate()
    p.common_params.comp_lvl = 1
    p.common_params.hw_buff_sz = hw_buff_sz
    p.data_fmt = fmt
    assert qz.qz_setup_session_deflate(sess, p) == qz.QZ_OK
    return sess


def test_fault_death_mid_batch_compress(monkeypatch, corpus_factory):
    """Device dies after submit (result materialization fails): the batch
    reroutes to the CPU post-hoc (compOutSWFallback, src/qatzip.c:1677)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.health import health

    faults.inject_error("death", nth=1, direction="compress", count=1)
    try:
        data = corpus_factory(100_000, "text")
        comp = qz.compress(data, "deflate",
                           fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, level=1)
        assert not faults.armed()
        import gzip as _gzip

        assert _gzip.decompress(comp) == data
    finally:
        faults.clear()
        health.record_success()


def test_fault_poison_compress_is_harmless(monkeypatch, corpus_factory):
    """Poisoned candidate output must NOT corrupt the stream: the native
    parser verifies every candidate by byte compare, so garbage candidates
    only cost ratio."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.health import health

    faults.inject_error("poison", nth=1, direction="compress", count=1)
    try:
        data = corpus_factory(120_000, "text")
        comp = qz.compress(data, "deflate",
                           fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, level=1)
        assert not faults.armed()
        import gzip as _gzip

        assert _gzip.decompress(comp) == data
    finally:
        faults.clear()
        health.record_success()


def test_fault_poison_decompress_detected(monkeypatch, corpus_factory):
    """Corrupted device-decoded bytes must be detected by the footer
    checksum/size verification (decompOutCheckSum analog,
    src/qatzip_utils.c:1350-1427), never silently returned."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.health import health

    data = corpus_factory(60_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP,
                       sw_only=True)
    faults.inject_error("poison", nth=1, direction="decompress", count=1)
    try:
        sess = _gz_sess(fmt=QzDataFormat.QZ_DEFLATE_GZIP)
        res = qz.qz_decompress(sess, comp)
        if faults.armed():
            # the batch never reached the device path on this host: no
            # poison happened, output must be clean
            assert res.rc == qz.QZ_OK and res.data == data
        else:
            # poison fired: silent corruption is the one forbidden outcome
            assert res.rc == qz.QZ_DATA_ERROR, \
                (res.rc, res.data == data)
    finally:
        faults.clear()
        health.record_success()


def test_fault_checksum_engine_detected(monkeypatch, corpus_factory):
    """A wrong device checksum with a good payload must fail the request
    (checksum-engine fault)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.health import health

    data = corpus_factory(60_000, "text")
    comp = qz.compress(data, "deflate", fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT,
                       sw_only=True)
    faults.inject_error("checksum", nth=1, direction="decompress", count=1)
    try:
        sess = _gz_sess()
        res = qz.qz_decompress(sess, comp)
        if faults.armed():
            # batch was pre-routed to the CPU on this host: no device event
            assert res.rc == qz.QZ_OK and res.data == data
        else:
            assert res.rc == qz.QZ_DATA_ERROR
    finally:
        faults.clear()
        health.record_success()


def test_fault_trip_then_sticky_sw_then_revival(monkeypatch, corpus_factory):
    """Persistent submit faults trip the breaker (device requests stop);
    after cooldown the recovery probe re-admits the (healed) device and
    traffic returns — the RESTARTING -> RESTARTED cycle
    (reference src/qatzip.c:245-280, 684-687)."""
    monkeypatch.setenv("QATZIP_TPU_DEVICE", "1")
    import qatzip_tpu.engine.health as hm
    from qatzip_tpu.engine import faults
    from qatzip_tpu.engine.core import _engine
    from qatzip_tpu.engine.health import health

    data = corpus_factory(64_000, "text")

    def comp_once():
        return qz.compress(data, "deflate",
                           fmt=QzDataFormat.QZ_DEFLATE_GZIP_EXT, level=1,
                           hw_buff_sz=8192)

    faults.inject_error("submit", direction="compress", count=-1)
    t = [1000.0]
    monkeypatch.setattr(hm.time, "monotonic", lambda: t[0])
    try:
        fails0 = health.total_failures
        for _ in range(hm.FAILURE_TRIP):
            comp = comp_once()          # each trips one failure, output OK
            import gzip as _gzip

            assert _gzip.decompress(comp) == data
        assert health.total_failures == fails0 + hm.FAILURE_TRIP
        assert not health.healthy()     # breaker open
        # while open: requests run, stay SW, and record no new failures
        hw0 = _engine.hw_requests
        comp = comp_once()
        assert _engine.hw_requests == hw0
        assert health.total_failures == fails0 + hm.FAILURE_TRIP
        # device heals; cooldown passes; the next request is the probe and
        # closes the breaker
        faults.clear()
        t[0] += hm.COOLDOWN_S + 1
        comp = comp_once()
        assert health.healthy()
        assert _engine.hw_requests > hw0   # traffic returned to the device
    finally:
        faults.clear()
        health.record_success()


def test_devcal_autocalibrate_cold_start(monkeypatch, tmp_path):
    """With QATZIP_TPU_AUTOCAL=1 and no record, the first routing decision
    spawns one background calibration; routing stays CPU until the record
    lands, then flips to the measured winners (round-5 cold-start fix)."""
    import time as _time

    from qatzip_tpu.constants import QzDirection
    from qatzip_tpu.engine import devcal

    monkeypatch.setenv("QATZIP_TPU_DEVCAL_PATH", str(tmp_path / "cal.json"))
    monkeypatch.delenv("QATZIP_TPU_DEVICE", raising=False)
    monkeypatch.setenv("QATZIP_TPU_AUTOCAL", "1")
    monkeypatch.setattr(devcal, "_autocal_started", False)
    devcal.invalidate()

    calls = []

    def fake_calibrate(sample_bytes=0, save=True):
        calls.append(sample_bytes)
        import json

        with open(str(tmp_path / "cal.json"), "w") as f:
            json.dump({"comp_device_wins": True,
                       "decomp_device_wins": False}, f)
        devcal.invalidate()

    monkeypatch.setattr(devcal, "calibrate", fake_calibrate)
    # first decision: no record -> CPU, autocal spawned
    assert not devcal.device_allowed(QzDirection.QZ_DIR_COMPRESS)
    deadline = _time.monotonic() + 5
    while not calls and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert calls, "autocal thread never ran"
    while _time.monotonic() < deadline:
        if devcal.device_allowed(QzDirection.QZ_DIR_COMPRESS):
            break
        _time.sleep(0.01)
    assert devcal.device_allowed(QzDirection.QZ_DIR_COMPRESS)
    assert not devcal.device_allowed(QzDirection.QZ_DIR_DECOMPRESS)
    # exactly one attempt even across many decisions
    devcal.invalidate()
    import os as _os

    _os.remove(str(tmp_path / "cal.json"))
    devcal.invalidate()
    assert not devcal.device_allowed(QzDirection.QZ_DIR_COMPRESS)
    assert len(calls) == 1
