"""7z archive tests (reference utils/qzip_7z.c behavior)."""
import os
import struct
import zlib

import pytest

from qatzip_tpu.cli.sevenz import (SevenZReader, _read_number, _write_number,
                                   write_7z)


def test_number_codec_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 123456, 2**20, 2**31,
              2**40 + 17, 2**56 - 1, 2**63, 2**64 - 1]:
        enc = _write_number(v)
        dec, pos = _read_number(memoryview(enc), 0)
        assert dec == v, f"{v} -> {enc.hex()} -> {dec}"
        assert pos == len(enc)


@pytest.fixture
def tree(tmp_path, corpus_factory):
    root = tmp_path / "src"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_bytes(corpus_factory(50_000))
    (root / "sub" / "b.bin").write_bytes(corpus_factory(30_000, "iterative"))
    (root / "empty.txt").write_bytes(b"")
    return root


def test_7z_roundtrip_tree(tree, tmp_path):
    arc = tmp_path / "out.7z"
    total_in, arc_sz = write_7z(str(arc), [str(tree)])
    assert arc.exists() and arc_sz == arc.stat().st_size
    # magic + header CRC verified by reader
    dest = tmp_path / "extract"
    dest.mkdir()
    rd = SevenZReader(str(arc))
    rd.extract_all(str(dest))
    assert (dest / "src" / "a.txt").read_bytes() == (tree / "a.txt").read_bytes()
    assert (dest / "src" / "sub" / "b.bin").read_bytes() == \
        (tree / "sub" / "b.bin").read_bytes()
    assert (dest / "src" / "empty.txt").read_bytes() == b""
    assert (dest / "src" / "sub").is_dir()


def test_7z_signature_layout(tree, tmp_path):
    arc = tmp_path / "out.7z"
    write_7z(str(arc), [str(tree / "a.txt")])
    raw = arc.read_bytes()
    assert raw[:6] == b"7z\xbc\xaf\x27\x1c"
    sh_crc, = struct.unpack_from("<I", raw, 8)
    assert zlib.crc32(raw[12:32]) & 0xFFFFFFFF == sh_crc


def test_7z_crc_detects_corruption(tree, tmp_path):
    arc = tmp_path / "out.7z"
    write_7z(str(arc), [str(tree / "a.txt")])
    raw = bytearray(arc.read_bytes())
    raw[40] ^= 0xFF  # corrupt packed payload
    arc.write_bytes(bytes(raw))
    dest = tmp_path / "x"
    dest.mkdir()
    with pytest.raises(Exception):
        SevenZReader(str(arc)).extract_all(str(dest))


def test_7z_cli_roundtrip(tree, tmp_path):
    from tests.test_cli import run_qzip
    arc = tmp_path / "cli.7z"
    r = run_qzip(["-k", "-O", "7z", "-o", str(arc), str(tree / "a.txt")])
    assert r.returncode == 0, r.stderr
    dest = tmp_path / "cli_x"
    dest.mkdir()
    r = run_qzip(["-d", "-k", "-o", str(dest), str(arc)])
    assert r.returncode == 0, r.stderr
    assert (dest / "a.txt").read_bytes() == (tree / "a.txt").read_bytes()


def test_7z_cli_multi_input_single_archive(tmp_path):
    """`qzip -O 7z a b dir/` must produce ONE archive catenating every
    input (reference utils/qzip_main.c:196-344) — not an archive per file."""
    from tests.test_cli import run_qzip

    a = tmp_path / "a.txt"
    b = tmp_path / "b.bin"
    d = tmp_path / "sub"
    (d / "deep").mkdir(parents=True)
    a.write_bytes(b"alpha " * 100)
    b.write_bytes(bytes(range(256)) * 10)
    (d / "c.txt").write_bytes(b"nested file")
    (d / "deep" / "empty.txt").write_bytes(b"")
    arc = tmp_path / "all.7z"

    r = run_qzip(["-k", "-O", "7z", "-o", str(arc),
                  str(a), str(b), str(d)])
    assert r.returncode == 0, r.stderr
    assert arc.exists()
    assert not (tmp_path / "a.txt.7z").exists(), "must not archive per-file"

    dest = tmp_path / "out"
    dest.mkdir()
    r = run_qzip(["-d", "-k", "-o", str(dest), str(arc)])
    assert r.returncode == 0, r.stderr
    assert (dest / "a.txt").read_bytes() == a.read_bytes()
    assert (dest / "b.bin").read_bytes() == b.read_bytes()
    found_c = list(dest.rglob("c.txt"))
    assert found_c and found_c[0].read_bytes() == b"nested file"
    found_e = list(dest.rglob("empty.txt"))
    assert found_e and found_e[0].read_bytes() == b""
