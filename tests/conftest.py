"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the multi-node-without-a-cluster strategy;
see SURVEY.md §4).  Set QATZIP_TPU_TEST_REAL_TPU=1 to run against real
devices instead.

On TPU-tunnel machines the axon sitecustomize hook routes *all* XLA
compiles through the tunnel (PALLAS_AXON_REMOTE_COMPILE=1), which makes
CPU-only test compiles several times slower; we re-exec pytest once with the
hook stripped so kernel tests compile locally.
"""
import os
import random
import sys

_REAL_TPU = os.environ.get("QATZIP_TPU_TEST_REAL_TPU", "0") == "1"

if not _REAL_TPU:
    # must run before the first jax backend initialization (importing jax is
    # fine; creating a backend is not — pytest plugins import jax early)
    from jax._src import xla_bridge as _xb
    assert not _xb._backends, (
        "jax backend initialized before conftest; cannot force CPU platform")
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax as _jax
    # jax snapshots JAX_PLATFORMS at import; override the live config too
    _jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# deterministic device-routing policy: ignore any calibration record on the
# machine; tests that exercise the device path opt in via QATZIP_TPU_DEVICE
os.environ.setdefault("QATZIP_TPU_DEVCAL_PATH",
                      os.path.join(os.path.dirname(__file__),
                                   ".no-devcal.json"))

# persistent compilation cache makes repeated test runs cheap
try:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


def make_corpus(rng: random.Random, size: int, kind: str = "text") -> bytes:
    """Synthetic corpora mirroring test/bt.c's three generators plus a
    compressible 'text' flavor."""
    if kind == "iterative":
        return bytes(i % 256 for i in range(size))
    if kind == "random":
        return bytes(rng.getrandbits(8) for _ in range(size))
    if kind == "constant":
        return b"A" * size
    if kind == "text":
        words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over",
                 b"lazy", b"dog", b"compression", b"hardware", b"offload"]
        out = bytearray()
        while len(out) < size:
            out += rng.choice(words) + b" "
        return bytes(out[:size])
    raise ValueError(kind)


@pytest.fixture
def corpus_factory(rng):
    return lambda size, kind="text": make_corpus(rng, size, kind)
