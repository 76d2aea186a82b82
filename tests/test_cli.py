"""CLI parity tests: qzip file/dir/pipe flows against the system gzip oracle."""
import gzip as pygzip
import io
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_qzip(args, stdin: bytes = b"", cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run([sys.executable, "-m", "qatzip_tpu.cli.qzip", *args],
                          input=stdin, capture_output=True, cwd=cwd, env=env,
                          timeout=300)


@pytest.fixture
def workdir(tmp_path, corpus_factory):
    f = tmp_path / "file.bin"
    f.write_bytes(corpus_factory(150_000))
    return tmp_path


def test_cli_compress_gzip_interop(workdir):
    data = (workdir / "file.bin").read_bytes()
    r = run_qzip(["-k", "-O", "gzip", str(workdir / "file.bin")])
    assert r.returncode == 0, r.stderr
    gz = (workdir / "file.bin.gz").read_bytes()
    assert pygzip.decompress(gz) == data
    assert b"Throughput" in r.stderr and b"ratio" in r.stderr


def test_cli_roundtrip_keep_and_delete(workdir):
    data = (workdir / "file.bin").read_bytes()
    r = run_qzip([str(workdir / "file.bin")])  # no -k: source deleted
    assert r.returncode == 0, r.stderr
    assert not (workdir / "file.bin").exists()
    r = run_qzip(["-d", str(workdir / "file.bin.gz")])
    assert r.returncode == 0, r.stderr
    assert (workdir / "file.bin").read_bytes() == data
    assert not (workdir / "file.bin.gz").exists()


def test_cli_lz4_roundtrip(workdir):
    data = (workdir / "file.bin").read_bytes()
    r = run_qzip(["-k", "-A", "lz4", str(workdir / "file.bin")])
    assert r.returncode == 0, r.stderr
    r = run_qzip(["-d", "-o", str(workdir / "out.bin"),
                  str(workdir / "file.bin.lz4")])
    assert r.returncode == 0, r.stderr
    assert (workdir / "out.bin").read_bytes() == data


def test_cli_stdin_stdout_pipe(corpus_factory):
    data = corpus_factory(80_000)
    r = run_qzip([], stdin=data)
    assert r.returncode == 0, r.stderr
    assert pygzip.decompress(r.stdout) == data
    r2 = run_qzip(["-d"], stdin=r.stdout)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == data


def test_cli_recursive_dir(tmp_path, corpus_factory):
    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    (tmp_path / "tree" / "a.txt").write_bytes(corpus_factory(5000))
    (d / "b.txt").write_bytes(corpus_factory(7000))
    r = run_qzip(["-k", "-R", str(tmp_path / "tree")])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "tree" / "a.txt.gz").exists()
    assert (d / "b.txt.gz").exists()


def test_cli_zstd_pipeline(workdir):
    """qzip -A zstd: LZ4s on the device path + zstd post-process callback
    produces standard Zstd frames."""
    import zstandard
    data = (workdir / "file.bin").read_bytes()
    # -o appends the format suffix like the reference (utils/qzip.c:659-680)
    r = run_qzip(["-k", "-A", "zstd", "-o", str(workdir / "file"),
                  str(workdir / "file.bin")])
    assert r.returncode == 0, r.stderr
    dctx = zstandard.ZstdDecompressor()
    blob = (workdir / "file.zst").read_bytes()
    out = bytearray()
    with dctx.stream_reader(io.BytesIO(blob), read_across_frames=True) as r:
        while True:
            piece = r.read(1 << 20)
            if not piece:
                break
            out += piece
    assert bytes(out) == data


def test_cli_perf_knobs(tmp_path):
    """-r/-P/-S knobs (reference utils/qzip_main.c:53-194)."""
    p = tmp_path / "x.txt"
    p.write_bytes(b"knobs " * 2000)
    r = run_qzip(["-k", "-r", "3", "-P", "busy", "-S",
                  "-o", str(tmp_path / "x"), str(p)])
    assert r.returncode == 0, r.stderr
    import gzip
    assert gzip.decompress((tmp_path / "x.gz").read_bytes()) == p.read_bytes()


def test_cli_device_node_input(tmp_path, corpus_factory):
    """Block/char-device & FIFO inputs stream through the bounded-memory
    path into an explicit -o target (reference utils/qzip.c:566-658
    block-device handling).  A FIFO stands in for a device node (same
    non-regular-file stat branch; no block devices exist in containers)."""
    import gzip as pygzip
    import os
    import subprocess
    import sys
    import threading

    data = corpus_factory(200_000)
    fifo = tmp_path / "dev_fifo"
    os.mkfifo(str(fifo))
    out = tmp_path / "dev.gz"

    def feeder():
        with open(fifo, "wb") as f:
            f.write(data)

    t = threading.Thread(target=feeder)
    t.start()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "qatzip_tpu.cli.qzip", "-k",
         str(fifo), "-o", str(out)],
        env=env, capture_output=True, timeout=120)
    t.join(timeout=10)
    assert r.returncode == 0, r.stderr[-2000:]
    assert pygzip.decompress(out.read_bytes()) == data
    # device input without -o is refused before the node is ever opened
    # (no writer side needed: the CLI must exit without blocking on open)
    os.mkfifo(str(tmp_path / "f2"))
    r2 = subprocess.run(
        [sys.executable, "-m", "qatzip_tpu.cli.qzip", str(tmp_path / "f2")],
        env=env, capture_output=True, timeout=60)
    assert r2.returncode != 0 and b"requires -o" in r2.stderr
