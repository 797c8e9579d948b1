"""ascii-strings extraction parity (reference
crates/extract-strings/src/ascii.rs:132-146, lib.rs:20-32)."""

from __future__ import annotations

from archive_to_parquet_spark.functions.strings import (
    extract_ascii_strings,
    joined_ascii_strings,
)


def test_split_on_nul():
    # reference lib.rs:20-32: NUL separates runs
    data = b"hello-world-long\x00second-run-here"
    assert extract_ascii_strings(data, 10) == [
        "hello-world-long",
        "second-run-here",
    ]


def test_min_length_threshold():
    data = b"short\x00exactly-10\x00nine-char"
    assert extract_ascii_strings(data, 10) == ["exactly-10"]
    assert extract_ascii_strings(data, 5) == ["short", "exactly-10", "nine-char"]


def test_multibyte_rejected():
    # reference ascii.rs:132-146: multi-byte chars break runs
    data = "prefix-run-aaaa é suffix-run-bbbb".encode("utf-8")
    out = extract_ascii_strings(data, 10)
    assert out == ["prefix-run-aaaa ", " suffix-run-bbbb"]


def test_control_chars_break_runs():
    data = b"first-long-run\x07second-long-run\x1fthird-long-run"
    assert extract_ascii_strings(data, 10) == [
        "first-long-run",
        "second-long-run",
        "third-long-run",
    ]


def test_runs_span_buffer_boundaries():
    # constant-memory streaming in the reference; our regex sees the whole
    # buffer, so a run crossing any internal boundary must stay maximal
    data = b"x" * 8191 + b"y" * 10
    out = extract_ascii_strings(data, 10)
    assert out == ["x" * 8191 + "y" * 10]


def test_joined_form():
    data = b"first-long-run\x00second-long-run"
    assert joined_ascii_strings(data, 10) == b"first-long-run\nsecond-long-run"


def test_strings_cli_twin(tmp_path, capsys):
    """CLI drive of the strings(1) twin (reference
    crates/extract-strings/src/bin/strings.rs): runs ≥ min-len printed
    one per line plus a total."""
    from archive_to_parquet_spark.strings_cli import main

    blob = (
        b"\x00\x01short\x02"
        + b"this is a long printable run" + b"\xff"
        + b"another printable sequence!" + b"\x00"
    )
    p = tmp_path / "blob.bin"
    p.write_bytes(blob)
    assert main([str(p)]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == [
        "this is a long printable run",
        "another printable sequence!",
        "Total strings: 2",
    ]
    # min-len extension
    assert main([str(p), "--min-len", "5"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[-1] == "Total strings: 3"
    # missing file → exit 1
    assert main([str(tmp_path / "nope.bin")]) == 1
