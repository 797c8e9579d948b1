"""Format sniffing parity (reference src/anyreader/compression.rs:94-118,
src/anyreader/format.rs)."""

from __future__ import annotations

from archive_to_parquet_spark.functions.sniff import (
    detect_compression,
    detect_format,
    is_executable_magic,
)
from tests.conftest import bz2_data, gzip_data, tar_archive, xz_data, zip_archive


def test_compression_magics_roundtrip():
    payload = b"hello world, this is data"
    assert detect_compression(gzip_data(payload)[:6]) == "gzip"
    assert detect_compression(bz2_data(payload)[:6]) == "bzip2"
    assert detect_compression(xz_data(payload)[:6]) == "xz"
    assert detect_compression(payload[:6]) is None


def test_zstd_magic_and_skippable_frames():
    assert detect_compression(b"\x28\xb5\x2f\xfd\x00\x00") == "zstd"
    # skippable frame magics 0x184D2A50..5F little-endian
    assert detect_compression(b"\x50\x2a\x4d\x18\x00\x00") == "zstd"
    assert detect_compression(b"\x5f\x2a\x4d\x18\x00\x00") == "zstd"
    assert detect_compression(b"\x60\x2a\x4d\x18\x00\x00") is None


def test_container_detection():
    t = tar_archive({"a.txt": b"hello"})
    z = zip_archive({"a.txt": b"hello"})
    assert detect_format(t[:262], None) == "tar"
    assert detect_format(z[:262], None) == "zip"
    assert detect_format(b"plain text here", None) == "unknown"
    # compression kind survives when the inner stream is not a container
    assert detect_format(b"plain text here", "gzip") == "gzip"


def test_executable_magics():
    for magic in (b"\x7fELF", b"MZ", b"\xcf\xfa\xed\xfe", b"\x00asm", b"dex\n"):
        assert is_executable_magic(magic + b"rest"), magic
        assert detect_format(magic + b"rest", None) == "executable"
    assert not is_executable_magic(b"plain")


def test_leaf_container_kinds_detected_not_recursed():
    from archive_to_parquet_spark.functions.sniff import detect_format
    from archive_to_parquet_spark.sources.walker import Walker

    sevenz = b"7z\xbc\xaf\x27\x1c" + b"\x00" * 20
    rar5 = b"Rar!\x1a\x07\x01\x00" + b"\x00" * 20
    assert detect_format(sevenz) == "7z"
    assert detect_format(rar5) == "rar"
    assert detect_format(b"Rar!\x1a\x07\x00junk") == "rar"
    # not in the recursive walker set: emitted as opaque leaves
    assert "7z" not in Walker._ARCHIVE_WALKERS
    assert "rar" not in Walker._ARCHIVE_WALKERS
