"""Partitioned CSV export of lake tables.

The reference's mission statement is "exporting Bridge data to
Parquet/CSV" (README.md:3); parquet is the lake format, CSV the
consumer-facing export (analysts, R/SAS pipelines, spreadsheet review of
reconciliation reports). The export is a format transcription of a lake
table, not a second pipeline: read parquet → write CSV with the same
``assessmentid/year/month/day`` layout.

CSV caveats handled here rather than by every caller:

- **Nested columns**: CSV has no struct/array representation. Arrays and
  structs are serialized as JSON text (``to_json``) so the export is
  lossless-by-parse; relationalized child tables are already flat, which
  is the preferred export surface.
- **Headers + declared read-back**: files carry a header row, but reading
  back uses the declared schema (never ``inferSchema`` — same
  no-inference contract as the JSON lake scan).
- **Timestamps** serialize as microsecond ISO-8601 UTC, matching the
  engine's UTC session pin.

Scale: one narrow projection + the same clustered partitioned write as
the parquet sink — file count bounded by partitions, not tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_csv_dataset", "read_csv_dataset"]

#: timestamp wire format for CSV (microsecond ISO, UTC session)
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _flatten_for_csv(df: DataFrame) -> DataFrame:
    """Serialize non-scalar columns to JSON text; scalars pass through."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_csv_dataset(
    df: DataFrame,
    csv_root: str,
    table_name: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> str:
    """Write one table as partitioned CSV under ``csv_root/table_name``.

    Mirrors ``write_parquet_dataset``'s layout contract (partition-key
    clustering before the write) so CSV and parquet exports of the same
    table are directory-for-directory parallel. Returns the table path.
    """
    if partition_cols is None:
        partition_cols = [
            c for c in ("assessmentid", "year", "month", "day") if c in df.columns
        ]
    path = os.path.join(csv_root, table_name)
    out = _flatten_for_csv(df)
    if partition_cols:
        out = out.repartition(*partition_cols)
    writer = (
        out.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        # quote/escape defaults are RFC-4180; emit a real NULL marker so
        # empty string and NULL stay distinguishable on read-back
        .option("nullValue", "\\N")
        # byte-faithful values: Spark's CSV writer/reader trim surrounding
        # whitespace by default, which would silently corrupt text fields
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.csv(path)
    return path


def read_csv_dataset(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read a CSV export back through its declared schema — never
    ``inferSchema`` (one extra full pass at scale, and per-file type
    drift; the same no-inference rule as the JSON lake scan)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .option("nullValue", "\\N")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("basePath", path)
        .csv(path)
    )
