"""Diff a DRIVER_TRACE result capture against the DuckDB oracle.

After a driver round, ``DRIVER_TRACE/<name>.json`` holds the exact
normalized row lines the Spark side produced inside the driver's own
session.  This tool recomputes the oracle side for the same entry and
prints the first divergent rows, pinpointing a hash mismatch instead of
leaving it to guesswork.

Usage: python tools/diff_trace.py <name> [sf_dir]

Retention: DRIVER_TRACE/ holds one trace per live catalog entry —
``__spark_entry__.queries()`` prunes only ``*.json`` files whose entry
no longer exists in the catalog, and each run overwrites the per-entry
files it actually executes, so a partial run (the 50-entry driver
window, or an ad-hoc smoke) refreshes its own traces without deleting
the rest of the committed full-catalog set.
Per-entry traces store at most 1000 rows, and entries whose result
exceeds the 20,000-row pull budget record a skip marker instead of
rows, so the artifact dir stays bounded (~a few MB) round over round.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from archive_to_parquet_spark import queries as catmod

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    path = os.path.join(REPO, "DRIVER_TRACE", f"{name}.json")
    with open(path) as fh:
        trace = json.load(fh)

    sql = catmod.oracle_sql().get(name)
    if sql is None:
        print(f"{name}: no oracle SQL (rows-only entry)")
        return 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    oracle_lines = sorted(
        "\x1f".join(entrymod._norm_cell(r[i]) for i in order)
        for r in rel.fetchall()
    )

    spark_lines = trace["rows"]
    print(f"trace: {trace['n_rows']} rows, hash {trace['value_hash']}, "
          f"cols {trace['columns']}")
    print(f"oracle: {len(oracle_lines)} rows, cols {[cols[i] for i in order]}")
    # the COUNT check always compares the trace's full row count against
    # the untrimmed oracle count — trimming is only for the line diff,
    # else a divergence past the stored-row cap reads as "identical"
    full_oracle_rows = len(oracle_lines)
    trace_rows = trace["n_rows"]
    diff_oracle_lines = oracle_lines
    if trace.get("rows_truncated"):
        print("NOTE: trace rows were truncated; diff covers the stored prefix")
        diff_oracle_lines = oracle_lines[: len(spark_lines)]

    n_shown = 0
    for i, (a, b) in enumerate(zip(spark_lines, diff_oracle_lines)):
        if a != b:
            print(f"row {i}:\n  spark : {a.replace(chr(31), ' | ')}\n"
                  f"  oracle: {b.replace(chr(31), ' | ')}")
            n_shown += 1
            if n_shown >= 10:
                break
    if trace_rows != full_oracle_rows:
        print(f"row-count differs: spark {trace_rows} "
              f"vs oracle {full_oracle_rows}")
    if n_shown == 0 and trace_rows == full_oracle_rows:
        print("identical (the divergence was not reproduced at this sf_dir)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
