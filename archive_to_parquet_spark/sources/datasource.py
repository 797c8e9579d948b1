"""Spark 4 Python DataSource for archives: ``spark.read.format("archive")``.

The DataSource API gives the walker real partition planning — one
``InputPartition`` per top-level archive — so Spark's scheduler sees
inputs as first-class partitions (locality, retries, event-log metrics)
instead of rows fed through mapInPandas. Batches are yielded as Arrow
RecordBatches, keeping the transfer path vectorized.

Usage::

    from archive_to_parquet_spark.sources.datasource import register
    register(spark)
    df = (spark.read.format("archive")
          .option("paths", "a.tar,b.tar.gz")   # or a glob via "glob"
          .load())

Options: ``paths`` (comma-separated), ``glob`` (shell glob), ``urls``
("true" → paths are http(s) URLs), ``extract_strings``, ``max_depth``,
``batch_rows``, ``columns`` (comma-separated projection — excluding
``content`` makes the walker stream-hash without ever buffering entry
payloads; the Python DataSource API cannot see the query's projection,
so pruning is an explicit option, not automatic).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from archive_to_parquet_spark.schema import ENTRY_SCHEMA


def _parse_columns(raw: str | None) -> tuple[str, ...] | None:
    """Comma-separated projection option → canonical-order tuple.
    Unknown names raise (matching the CLI/ConvertOptions front door) —
    silently dropping a typo'd column would be silent data loss."""
    if not raw:
        return None
    wanted = {c.strip() for c in raw.split(",") if c.strip()}
    valid = {f.name for f in ENTRY_SCHEMA.fields}
    bad = sorted(wanted - valid)
    if bad or not wanted:
        raise ValueError(
            f"unknown columns {bad}; valid: {sorted(valid)}"
        )
    return tuple(f.name for f in ENTRY_SCHEMA.fields if f.name in wanted)


class ArchivePartition(InputPartition):
    def __init__(self, path: str, is_url: bool):
        self.path = path
        self.is_url = is_url


class ArchiveDataSource(DataSource):
    """``format("archive")`` — recursive archive extraction source."""

    @classmethod
    def name(cls) -> str:
        return "archive"

    def schema(self):
        cols = _parse_columns(self.options.get("columns"))
        if cols is None:
            return ENTRY_SCHEMA
        return StructType([f for f in ENTRY_SCHEMA.fields if f.name in cols])

    def reader(self, schema) -> "ArchiveReader":
        return ArchiveReader(self.options)


class ArchiveReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def _paths(self) -> list[str]:
        paths: list[str] = []
        if self.options.get("paths"):
            paths += [p for p in self.options["paths"].split(",") if p]
        if self.options.get("glob"):
            import glob as globmod

            paths += sorted(globmod.glob(self.options["glob"]))
        if not paths:
            raise ValueError(
                "archive source needs option 'paths' (comma-separated) or 'glob'"
            )
        return paths

    def partitions(self) -> list[ArchivePartition]:
        is_url = str(self.options.get("urls", "false")).lower() == "true"
        return [ArchivePartition(p, is_url) for p in self._paths()]

    def read(self, partition: ArchivePartition) -> Iterator:
        import pyarrow as pa

        from archive_to_parquet_spark.options import ConvertOptions
        from archive_to_parquet_spark.sources.url_source import open_url
        from archive_to_parquet_spark.sources.walker import walk_path, walk_stream

        columns = _parse_columns(self.options.get("columns"))
        options = ConvertOptions(
            extract_strings=str(self.options.get("extract_strings", "false")).lower()
            == "true",
            max_depth=int(self.options.get("max_depth", 16)),
            columns=columns,
        )
        options.validate()
        batch_rows = int(self.options.get("batch_rows", 1024))

        def batches(rows_iter):
            buf: list = []
            for row in rows_iter:
                buf.append(row)
                if len(buf) >= batch_rows:
                    yield _to_arrow(buf)
                    buf = []
            if buf:
                yield _to_arrow(buf)

        _types = {
            "source": pa.string(),
            "path": pa.string(),
            "size": pa.int64(),
            "hash": pa.binary(),
            "content": pa.binary(),
            "format": pa.string(),
        }
        out_cols = columns or tuple(_types)

        def _to_arrow(rows) -> pa.RecordBatch:
            return pa.RecordBatch.from_pydict(
                {
                    c: pa.array([getattr(r, c) for r in rows], type=_types[c])
                    for c in out_cols
                }
            )

        if partition.is_url:
            stream, size = open_url(partition.path)
            try:
                yield from batches(walk_stream(partition.path, stream, size, options))
            finally:
                stream.close()
        else:
            yield from batches(walk_path(partition.path, options))


try:  # streaming reader API (Spark 4)
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = object  # type: ignore


def _is_growable(path: str) -> bool:
    """Append-only record formats whose byte TAIL is itself a valid
    stream: per-record-gzip ``.warc.gz`` (the Common Crawl layout —
    each record is a complete gzip member, so decode can start at any
    member boundary) and uncompressed ``.warc`` (records start at
    ``WARC/`` version lines). tar/zip cannot be tail-walked — a grown
    one is NOT re-read (its first-seen prefix was already emitted)."""
    return path.endswith((".warc.gz", ".warc"))


class _BoundedTail:
    """Sequential reader over a file's byte range [start, end) — pins a
    micro-batch to the size recorded in its offset even if the file
    keeps growing while we read (exactly-once replay needs the range,
    not 'to EOF')."""

    def __init__(self, fh, start: int, end: int):
        fh.seek(start)
        self._fh = fh
        self._left = end - start

    def read(self, n: int = -1) -> bytes:
        if self._left <= 0:
            return b""
        n = self._left if n is None or n < 0 else min(n, self._left)
        data = self._fh.read(n)
        self._left -= len(data)
        return data


class ArchiveStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch walks archives that appeared
    under the glob since the last committed offset — plus, for
    append-only record formats (``.warc.gz`` / ``.warc``), the byte
    tail appended to files already seen (continuous crawl ingestion:
    a crawler appending per-record gzip members to an open segment).

    The offset maps each processed path to the byte size walked so far
    (JSON dict) — simple and replayable: a restart from a checkpoint
    re-lists the directory and walks only bytes beyond each recorded
    size, giving exactly-once rows with an idempotent sink. (Legacy
    list-shaped offsets are read as 'whole file processed'.)
    """

    def __init__(self, options: dict):
        self.options = options
        if not options.get("glob"):
            raise ValueError("archive-stream needs option 'glob'")

    def initialOffset(self) -> dict:
        return {"processed": {}}

    @staticmethod
    def _seen(offset: dict) -> dict[str, int]:
        processed = offset.get("processed", {})
        if isinstance(processed, list):  # legacy whole-file offsets
            return {p: -1 for p in processed}
        return dict(processed)

    def _walk_range(self, path: str, start_b: int, end_b: int, opts):
        from archive_to_parquet_spark.sources.walker import walk_stream

        with open(path, "rb") as fh:
            tail = _BoundedTail(fh, start_b, end_b)
            for r in walk_stream(path, tail, end_b - start_b, opts):
                yield (r.source, r.path, r.size, r.hash, r.content, r.format)

    def read(self, start: dict):
        import glob as globmod
        import os

        from archive_to_parquet_spark.options import ConvertOptions

        seen = self._seen(start)
        files = sorted(globmod.glob(self.options["glob"]))
        opts = ConvertOptions(
            max_depth=int(self.options.get("max_depth", 16)),
        )

        end_sizes = dict(seen)
        work: list[tuple[str, int, int]] = []  # (path, from_byte, to_byte)
        for f in files:
            size = os.path.getsize(f)
            prev = seen.get(f)
            if prev is None:
                work.append((f, 0, size))
                end_sizes[f] = size
            elif 0 <= prev < size and _is_growable(f):
                work.append((f, prev, size))
                end_sizes[f] = size
        end = {"processed": end_sizes}

        # materialized list, not a generator: the simple-stream API
        # prefetches on the driver and caches the batch for replay
        # (generators aren't picklable). Fine for the intended use —
        # per-trigger batches of newly arrived files/records.
        rows = [
            row
            for f, s, e in work
            for row in self._walk_range(f, s, e, opts)
        ]
        # the prefetcher requires a PICKLABLE ITERATOR: a generator
        # fails pickling, a bare list fails the iterator check —
        # a list_iterator satisfies both
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        import glob as globmod
        import os

        from archive_to_parquet_spark.options import ConvertOptions

        before = self._seen(start)
        after = self._seen(end)
        opts = ConvertOptions(max_depth=int(self.options.get("max_depth", 16)))
        present = set(globmod.glob(self.options["glob"]))
        for f in sorted(after):
            if f not in present:
                continue
            prev = before.get(f, 0)
            if prev < 0:
                # fully processed under a legacy whole-file offset —
                # check BEFORE expanding a legacy end offset, or a file
                # carried as -1 in both start and end would be re-walked
                # in full on batch replay (duplicate rows after restart
                # from a pre-upgrade checkpoint)
                continue
            to = after[f]
            if to < 0:  # legacy offset: whole file
                prev, to = 0, os.path.getsize(f)
            if prev < to:
                yield from self._walk_range(f, prev, to, opts)

    def commit(self, end: dict) -> None:
        pass  # offsets carry full state; nothing external to clean up


class ArchiveStreamDataSource(DataSource):
    """``format("archive-stream")`` — streaming recursive extraction."""

    @classmethod
    def name(cls) -> str:
        return "archive-stream"

    def schema(self):
        return ENTRY_SCHEMA

    def simpleStreamReader(self, schema) -> "ArchiveStreamReader":
        return ArchiveStreamReader(self.options)


def register(spark) -> None:
    """Register the 'archive' and 'archive-stream' formats (idempotent)."""
    from archive_to_parquet_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    spark.dataSource.register(ArchiveDataSource)
    spark.dataSource.register(ArchiveStreamDataSource)
