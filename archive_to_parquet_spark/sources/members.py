"""Read structured table files that live INSIDE archives.

The walker emits parquet/ORC/Avro members of an archive as opaque
``content`` bytes with ``format`` sniffed (functions/sniff.py). This
module turns those bytes back into ROWS without ever touching disk —
the "lake inside an archive" path: a tar of parquet shards (a common
dataset-distribution shape) becomes a queryable DataFrame in one
pipeline, extraction-free.

Scale: decode runs where the bytes already are (Arrow ``mapInPandas``,
no shuffle); each member decodes independently, so parallelism is the
member count. Memory per task is bounded by the largest single member
(same budget as the walker's spool guard) — shard datasets accordingly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parquet_members_to_rows(
    entries: DataFrame,
    schema: T.StructType | str,
    content_col: str = "content",
    format_col: str = "format",
    include_member: bool = True,
) -> DataFrame:
    """Decode every ``format == 'parquet'`` member of an entries table
    into its rows via pyarrow, selecting exactly the declared
    ``schema`` columns (extra member columns are pruned; a member
    missing a declared column fails loudly — schema drift should never
    pass silently). With ``include_member`` each output row carries a
    ``_member`` column (the member path) for provenance.

    The declared schema doubles as a projection pushed into the
    pyarrow read — only the needed columns are decoded from each
    member's row groups, mirroring parquet column pruning on a real
    scan."""
    out_schema = (
        T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    names = [f.name for f in out_schema.fields]
    full_schema = (
        T.StructType(
            [T.StructField("_member", T.StringType(), False), *out_schema.fields]
        )
        if include_member
        else out_schema
    )

    members = entries.filter(F.col(format_col) == "parquet").select(
        F.col("path").alias("_member"), F.col(content_col).alias("_bytes")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import pyarrow.parquet as pq

        for pdf in batches:
            for member, blob in zip(pdf["_member"], pdf["_bytes"]):
                table = pq.read_table(io.BytesIO(bytes(blob)), columns=names)
                out = table.to_pandas()
                missing = [n for n in names if n not in out.columns]
                if missing:
                    raise ValueError(
                        f"parquet member {member!r} lacks declared columns "
                        f"{missing}"
                    )
                out = out[names]
                if include_member:
                    out.insert(0, "_member", member)
                yield out

    return members.mapInPandas(decode, full_schema)
