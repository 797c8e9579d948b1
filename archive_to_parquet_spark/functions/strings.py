"""``strings(1)``-style printable-ASCII run extraction (X4).

The reference scans for maximal runs of printable ASCII — byte != 0,
ASCII, not a control char (reference crates/extract-strings/src/ascii.rs:5-8)
— and emits runs with byte-length >= min_len (10 in the pipeline,
reference src/batch.rs:115). Note the reference's char class ACCEPTS the
control chars only via ``is_ascii_control`` = 0x00-0x1F and 0x7F, so the
kept class is exactly bytes 0x20..0x7E.

Two implementations with identical semantics:

- ``extract_ascii_strings``: pure Python over ``bytes`` for the ingest
  walker (executables rewrite content/hash/size, reference
  src/batch.rs:114-121).
- ``ascii_strings_col``: JVM-side column expression
  (``regexp_extract_all`` on the string form) for post-hoc queries —
  stays inside whole-stage codegen, no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Printable ASCII run, as a bytes-regex: 0x20..0x7E (ascii.rs:5-8).
_RUN_RE_TEMPLATE = rb"[\x20-\x7e]{%d,}"


def extract_ascii_strings(data: bytes, min_len: int = 10) -> list[str]:
    """All maximal printable-ASCII runs of byte-length >= min_len."""
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    pattern = re.compile(_RUN_RE_TEMPLATE % min_len)
    return [m.decode("ascii") for m in pattern.findall(data)]


def joined_ascii_strings(data: bytes, min_len: int = 10) -> bytes:
    """Newline-joined runs — the executable-content rewrite form
    (reference src/batch.rs:115-117 joins with '\\n')."""
    return "\n".join(extract_ascii_strings(data, min_len)).encode("ascii")


def ascii_strings_col(content: Column | str, min_len: int = 10) -> Column:
    """Column form: array<string> of printable-ASCII runs (codegen'd)."""
    col = F.col(content) if isinstance(content, str) else content
    # Cast binary → string is safe here: the matched class is pure ASCII and
    # regexp operates on the decoded form; invalid bytes become replacement
    # chars which are outside [ -~] and thus break runs exactly like the
    # byte-level scan does for non-ASCII bytes.
    return F.regexp_extract_all(
        col.cast("string"), F.lit(r"[\x20-\x7e]{%d,}" % min_len), F.lit(0)
    )
