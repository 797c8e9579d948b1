"""Spark 4 Python DataSource ('archive' format) tests."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import gzip_data, tar_archive, zip_archive


@pytest.fixture()
def registered(spark):
    from archive_to_parquet_spark.sources.datasource import register

    register(spark)
    return spark


@pytest.fixture()
def archives(tmp_path):
    a = tmp_path / "a.tar"
    a.write_bytes(
        tar_archive({"x.txt": b"hello", "inner.zip": zip_archive({"y.txt": b"nested"})})
    )
    b = tmp_path / "b.tar.gz"
    b.write_bytes(gzip_data(tar_archive({"z.txt": b"wrapped"})))
    return [str(a), str(b)]


def test_format_archive_load(registered, archives):
    df = (
        registered.read.format("archive")
        .option("paths", ",".join(archives))
        .load()
    )
    rows = df.collect()
    assert {(r.path, bytes(r.content)) for r in rows} == {
        ("x.txt", b"hello"),
        ("inner.zip/y.txt", b"nested"),
        ("z.txt", b"wrapped"),
    }
    for r in rows:
        assert bytes(r.hash) == hashlib.sha256(bytes(r.content)).digest()
    # one planned partition per archive
    assert df.rdd.getNumPartitions() == 2


def test_format_archive_glob_and_pushdown(registered, archives, tmp_path):
    from pyspark.sql import functions as F

    df = (
        registered.read.format("archive")
        .option("glob", f"{tmp_path}/*.tar*")
        .load()
        .filter(F.col("size") >= 6)
        .select("path", "size")
    )
    assert {(r.path, r.size) for r in df.collect()} == {
        ("inner.zip/y.txt", 6),
        ("z.txt", 7),
    }


def test_format_archive_requires_paths(registered):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(Exception):
        registered.read.format("archive").load().collect()
