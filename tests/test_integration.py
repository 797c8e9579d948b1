"""Integration smoke mirroring the reference's CI tier: the same source
tree packed as zip / tar.gz / tar must convert identically (reference
mise.toml [tasks.integration-test] uses the orf/gping checkout; we use
this repo's own package tree)."""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
import tarfile
import zipfile

import pyarrow.parquet as pq
import pytest

from archive_to_parquet_spark.options import ConvertOptions
from archive_to_parquet_spark.plans.convert import convert

PKG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "archive_to_parquet_spark")


def _source_files() -> dict[str, bytes]:
    files = {}
    for path in sorted(glob.glob(f"{PKG_DIR}/**/*.py", recursive=True)):
        rel = os.path.relpath(path, os.path.dirname(PKG_DIR))
        with open(path, "rb") as f:
            files[rel] = f.read()
    assert len(files) > 10
    return files


@pytest.fixture(scope="module")
def archive_forms(tmp_path_factory):
    root = tmp_path_factory.mktemp("forms")
    files = _source_files()
    tb = io.BytesIO()
    with tarfile.open(fileobj=tb, mode="w") as tf:
        for name, data in files.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    tar_bytes = tb.getvalue()
    (root / "src.tar").write_bytes(tar_bytes)
    (root / "src.tar.gz").write_bytes(gzip.compress(tar_bytes))
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    (root / "src.zip").write_bytes(zb.getvalue())
    return root, files


def test_all_archive_forms_convert_identically(spark, archive_forms, tmp_path):
    root, files = archive_forms
    results = {}
    for form in ("src.tar", "src.tar.gz", "src.zip"):
        out = str(tmp_path / f"{form}.parquet")
        counters = convert(spark, [str(root / form)], out, ConvertOptions())
        table = pq.read_table(out)
        assert counters.output_rows == len(files)
        results[form] = {
            r["path"]: (r["size"], bytes(r["hash"])) for r in table.to_pylist()
        }
    # identical content set across all three container formats
    assert results["src.tar"] == results["src.tar.gz"] == results["src.zip"]
    # and hashes match the actual source files
    for name, data in files.items():
        assert results["src.tar"][name] == (
            len(data),
            hashlib.sha256(data).digest(),
        )


def test_multi_form_unique_collapses_to_one_copy(spark, archive_forms, tmp_path):
    """--unique across all three forms: every file appears exactly once
    (the reference's --urls --unique CI variant, minus the network)."""
    root, files = archive_forms
    out = str(tmp_path / "uniq.parquet")
    counters = convert(
        spark,
        [str(root / f) for f in ("src.tar", "src.tar.gz", "src.zip")],
        out,
        ConvertOptions(unique=True),
    )
    assert counters.output_rows == len(files)
    table = pq.read_table(out)
    hashes = [bytes(h) for h in table.column("hash").to_pylist()]
    assert len(hashes) == len(set(hashes)) == len(files)
