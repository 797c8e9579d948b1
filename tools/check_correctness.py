"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares against
``oracle_sql()`` in DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple). Prints one line per query + a summary.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from archive_to_parquet_spark.session import get_spark

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = report[name] = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            rec["err"] = f"spark: {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
            continue
        spark_secs = time.time() - t0
        rec["spark_rows"] = len(rows)
        rec["secs"] = round(spark_secs, 2)
        if name not in oracles:
            print(f"ok?   {name}: rows={len(rows)} (rows-only, no oracle) "
                  f"[{spark_secs:.1f}s]")
            rec["rows_match"] = len(rows) > 0
            if not rows:
                print(f"      WARNING: zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            rec["err"] = f"duckdb: {type(e).__name__}: {str(e)[:200]}"
            failures.append(name)
            continue
        rec["oracle_rows"] = len(o_rows)
        rec["rows_match"] = len(rows) == len(o_rows)
        rec["schema_match"] = sorted(cols) == sorted(o_cols)
        problems = []
        if len(rows) != len(o_rows):
            problems.append(f"rowcount {len(rows)} != {len(o_rows)}")
        if sorted(cols) != sorted(o_cols):
            problems.append(f"cols {sorted(cols)} != {sorted(o_cols)}")
        else:
            h1, h2 = value_hash(cols, rows), value_hash(o_cols, o_rows)
            rec["hash_match"] = h1 == h2
            if h1 != h2:
                problems.append(f"value-hash {h1} != {h2}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{spark_secs:.1f}s]")
            failures.append(name)
            # show a small diff sample
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_set = {tuple(_norm_cell(r[i]) for i in order) for r in rows}
            o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            o_set = {tuple(_norm_cell(r[i]) for i in o_order) for r in o_rows}
            for x in list(s_set - o_set)[:3]:
                print(f"      spark-only: {x}")
            for x in list(o_set - s_set)[:3]:
                print(f"      duckdb-only: {x}")
        else:
            print(f"PASS  {name}: rows={len(rows)} [{spark_secs:.1f}s]")

    print()
    if json_path:
        import json

        import pyspark

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    # engine versions in every artifact (VERDICT r8
                    # missing #1): when a hash diverges between two
                    # oracle stacks, the first question is which
                    # DuckDB/Spark built each side — answer it here
                    # instead of leaving it unfalsifiable
                    "engines": {
                        "duckdb": duckdb.__version__,
                        "pyspark": pyspark.__version__,
                        "python": sys.version.split()[0],
                    },
                    "n_entries": len(report),
                    "n_failures": len(failures),
                    "entries": report,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_path}")
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
