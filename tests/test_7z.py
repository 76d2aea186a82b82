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


# ---------------------------------------------------------------------------
# Round 5: independent spec-grammar oracle.  No 7-Zip binary or py7zr wheel
# exists on this image, so the external oracle is a SECOND, test-local
# parser written directly from the public 7z format document (7zFormat.txt
# of the 7-Zip source distribution; property grammar also mirrored by the
# reference at utils/qzip_7z.c:784-1550).  It shares no code with
# cli/sevenz.py: numbers, bitfields, the property tree walk, CRC checks and
# the deflate payload decode are all re-implemented here, so a
# self-consistent-but-spec-wrong encoding in the writer cannot pass.
# ---------------------------------------------------------------------------
def _spec_read_number(b, pos):
    # 7zFormat.txt "REAL_UINT64 / NUMBER" encoding
    first = b[pos]
    pos += 1
    extra = 0
    mask = 0x80
    while extra < 8 and (first & mask):
        extra += 1
        mask >>= 1
    value = int.from_bytes(b[pos:pos + extra], "little")
    if extra < 8:
        value |= (first & (mask - 1)) << (8 * extra)
    return value, pos + extra


def _spec_read_bits(b, pos, n):
    bits = [bool(b[pos + i // 8] & (0x80 >> (i % 8))) for i in range(n)]
    return bits, pos + (n + 7) // 8


def _spec_verify_7z(path, expected_files):
    """Walk the archive per 7zFormat.txt; returns the decoded file map.

    expected_files: {archive_name: bytes} for non-empty files."""
    import struct
    import zlib

    raw = open(path, "rb").read()
    assert raw[:6] == b"7z\xbc\xaf\x27\x1c", "signature magic"
    # SignatureHeader: magic(6) version(2) StartHeaderCRC(4) StartHeader(20)
    (shcrc,) = struct.unpack_from("<I", raw, 8)
    assert zlib.crc32(raw[12:32]) == shcrc, "StartHeaderCRC"
    nh_off, nh_size, nh_crc = struct.unpack_from("<QQI", raw, 12)
    nh = raw[32 + nh_off:32 + nh_off + nh_size]
    assert len(nh) == nh_size, "next header truncated"
    assert zlib.crc32(nh) == nh_crc, "NextHeaderCRC"

    pos = 0
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x01, "kHeader"
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x04, "kMainStreamsInfo"

    # PackInfo
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x06, "kPackInfo"
    pack_pos, pos = _spec_read_number(nh, pos)
    num_pack, pos = _spec_read_number(nh, pos)
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x09, "kSize"
    pack_sizes = []
    for _ in range(num_pack):
        v, pos = _spec_read_number(nh, pos)
        pack_sizes.append(v)
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x00, "kEnd (PackInfo)"

    # UnpackInfo: kFolder, folders inline, coder grammar
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x07, "kUnpackInfo"
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x0B, "kFolder"
    num_folders, pos = _spec_read_number(nh, pos)
    ext = nh[pos]
    pos += 1
    assert ext == 0, "folders external flag"
    coders_per_folder = []
    for _ in range(num_folders):
        ncoders, pos = _spec_read_number(nh, pos)
        for _ in range(ncoders):
            flags = nh[pos]
            pos += 1
            idsize = flags & 0x0F
            codec_id = bytes(nh[pos:pos + idsize])
            pos += idsize
            assert not (flags & 0x10), "complex coders unexpected"
            if flags & 0x20:  # attributes/properties
                psz, pos = _spec_read_number(nh, pos)
                pos += psz
            coders_per_folder.append(codec_id)
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x0C, "kCodersUnpackSize"
    folder_unpack = []
    for _ in range(len(coders_per_folder)):
        v, pos = _spec_read_number(nh, pos)
        folder_unpack.append(v)
    pid, pos = _spec_read_number(nh, pos)
    while pid == 0x0A:  # optional folder kCRC
        defined = nh[pos]
        pos += 1
        assert defined == 1, "allAreDefined"
        pos += 4 * num_folders
        pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x00, "kEnd (UnpackInfo)"

    # SubStreamsInfo
    sub_sizes = []
    sub_crcs = []
    num_sub = num_folders
    pid, pos = _spec_read_number(nh, pos)
    if pid == 0x08:
        pid, pos = _spec_read_number(nh, pos)
        if pid == 0x0D:  # kNumUnpackStream
            num_sub, pos = _spec_read_number(nh, pos)
            pid, pos = _spec_read_number(nh, pos)
        if pid == 0x09:  # kSize: n-1 sizes, last derived
            for _ in range(num_sub - 1):
                v, pos = _spec_read_number(nh, pos)
                sub_sizes.append(v)
            sub_sizes.append(folder_unpack[-1] - sum(sub_sizes))
            pid, pos = _spec_read_number(nh, pos)
        else:
            sub_sizes = folder_unpack[:]
        if pid == 0x0A:  # kCRC
            defined = nh[pos]
            pos += 1
            assert defined == 1
            for _ in range(num_sub):
                (c,) = struct.unpack_from("<I", nh, pos)
                sub_crcs.append(c)
                pos += 4
            pid, pos = _spec_read_number(nh, pos)
        assert pid == 0x00, "kEnd (SubStreamsInfo)"
        pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x00, "kEnd (MainStreamsInfo)"

    # FilesInfo
    pid, pos = _spec_read_number(nh, pos)
    assert pid == 0x05, "kFilesInfo"
    num_files, pos = _spec_read_number(nh, pos)
    names = []
    empty_stream = [False] * num_files
    while True:
        pid, pos = _spec_read_number(nh, pos)
        if pid == 0x00:
            break
        psz, pos = _spec_read_number(nh, pos)
        body = nh[pos:pos + psz]
        pos += psz
        if pid == 0x0E:  # kEmptyStream
            empty_stream, _ = _spec_read_bits(body, 0, num_files)
        elif pid == 0x11:  # kName
            assert body[0] == 0, "names external flag"
            s = body[1:].decode("utf-16-le")
            names = s.split("\x00")[:-1]
    assert len(names) == num_files, "name count"

    # decode the single deflate pack stream and verify substream CRCs
    assert coders_per_folder and coders_per_folder[0] == b"\x04\x01\x08", \
        "deflate codec id 040108"
    payload = raw[32 + pack_pos:32 + pack_pos + pack_sizes[0]]
    blob = zlib.decompressobj(-15).decompress(payload)
    assert len(blob) == folder_unpack[-1], "unpack size"
    out = {}
    off = 0
    stream_names = [nm for nm, es in zip(names, empty_stream) if not es]
    assert len(stream_names) == len(sub_sizes), "substream/file mapping"
    for nm, sz, crc in zip(stream_names, sub_sizes,
                           sub_crcs or [None] * len(sub_sizes)):
        piece = blob[off:off + sz]
        off += sz
        if crc is not None:
            assert zlib.crc32(piece) == crc, f"substream CRC {nm}"
        out[nm.replace("\\", "/")] = piece
    for nm, want in expected_files.items():
        assert out.get(nm) == want, f"payload mismatch {nm}"
    return out


def test_7z_archive_passes_independent_spec_parser(tree, tmp_path):
    arc = tmp_path / "spec.7z"
    write_7z(str(arc), [str(tree)])
    expected = {
        "src/a.txt": (tree / "a.txt").read_bytes(),
        "src/sub/b.bin": (tree / "sub" / "b.bin").read_bytes(),
    }
    _spec_verify_7z(str(arc), expected)


def test_7z_multi_input_passes_independent_spec_parser(tmp_path):
    f1 = tmp_path / "one.bin"
    f2 = tmp_path / "two.txt"
    f1.write_bytes(bytes(range(256)) * 100)
    f2.write_bytes(b"hello 7z spec parser\n" * 500)
    arc = tmp_path / "multi.7z"
    write_7z(str(arc), [str(f1), str(f2)])
    _spec_verify_7z(str(arc), {"one.bin": f1.read_bytes(),
                               "two.txt": f2.read_bytes()})
