"""``strings(1)`` CLI twin (reference crates/extract-strings/src/bin/strings.rs).

Prints every maximal printable-ASCII run of length >= min-len in the
given file, one per line, followed by ``Total strings: N`` — byte-level
output parity with the reference binary (which hardcodes min length 10;
``--min-len`` is an extension).

Usage: python -m archive_to_parquet_spark.strings_cli FILE [--min-len N]
"""

from __future__ import annotations

import argparse
import sys

from archive_to_parquet_spark.functions.strings import extract_ascii_strings


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="strings",
        description="print printable-ASCII runs found in a file",
    )
    parser.add_argument("path", help="file to scan")
    parser.add_argument(
        "--min-len", type=int, default=10,
        help="minimum run length in bytes (default 10, the reference's)",
    )
    args = parser.parse_args(argv)
    try:
        with open(args.path, "rb") as f:
            data = f.read()
    except OSError as e:
        print(f"failed to open file: {e}", file=sys.stderr)
        return 1
    total = 0
    out = sys.stdout
    for s in extract_ascii_strings(data, args.min_len):
        out.write(s + "\n")
        total += 1
    out.write(f"Total strings: {total}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
