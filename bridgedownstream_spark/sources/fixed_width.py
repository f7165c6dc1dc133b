"""Fixed-width text source/sink — the mainframe/SAS-feed sibling of the
CSV export (reference mission: "exporting Bridge data to Parquet/CSV",
README.md:3; fixed-width is what the downstream SAS/COBOL consumers of
such exports historically ingest).

A dataset is lines of constant byte width; each field owns a declared
(name, width, kind) slice:

- ``str``  — right-padded with spaces, ``rtrim`` on read (internal
  spaces survive; a value with meaningful TRAILING spaces is not
  representable and must be escaped upstream).
- ``int``  — non-negative integer, zero-padded left, ``BIGINT`` on read.
- ``sint`` — signed integer: explicit ``+``/``-`` sign char then
  ``width-1`` zero-padded digits (no COBOL overpunch — the explicit sign
  keeps the file human-auditable and the parse engine-portable).

**Overflow is an error, never a truncation**: a value wider than its
field raises at write time (``raise_error`` inside the projection — the
check rides the same codegen pass, no extra scan). Silent truncation is
data corruption in this format's native habitat. **NULL is likewise an
explicit write-time error** — the format has no null representation, so
callers filter or fill upstream.

Scale: both directions are pure projections (concat/lpad/rpad out,
substring/trim/cast back) — zero shuffles, whole-stage codegen, and the
line-oriented text files split by newline like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_fixed_width", "read_fixed_width"]

#: (name, width, kind) — kind in {"str", "int", "sint"}
FieldSpec = tuple[str, int, str]


def _fmt(name: str, width: int, kind: str):
    c = F.col(name)
    if kind == "str":
        body = F.rpad(c, width, " ")
        too_wide = F.length(c) > width
    elif kind == "int":
        s = c.cast("bigint").cast("string")
        body = F.lpad(s, width, "0")
        too_wide = (F.length(s) > width) | (c < 0)
    elif kind == "sint":
        digits = F.abs(c.cast("bigint")).cast("string")
        body = F.concat(
            F.when(c < 0, F.lit("-")).otherwise(F.lit("+")),
            F.lpad(digits, width - 1, "0"),
        )
        too_wide = F.length(digits) > width - 1
    else:
        raise ValueError(f"unknown fixed-width kind {kind!r} for {name!r}")
    # NULL must be an explicit error, not a fall-through: a NULL value
    # makes too_wide NULL (F.when treats it as false) and would propagate
    # a NULL line into the text writer, which dies with an opaque
    # "null value in value column" error. The format has no NULL
    # representation — reject with the same raise_error discipline as
    # overflow so the message names the field.
    return (
        F.when(
            c.isNull(),
            F.raise_error(
                F.lit(
                    f"fixed-width null: field {name!r} is NULL and the format "
                    "has no null representation; filter or fill upstream"
                )
            ),
        )
        .when(
            too_wide,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed-width overflow: field {name!r} width {width}, value "
                    ),
                    c.cast("string"),
                )
            ),
        )
        .otherwise(body)
    )


def write_fixed_width(df: DataFrame, path: str, fields: list[FieldSpec]) -> str:
    """Write ``df`` (columns exactly the spec'd names) as fixed-width text."""
    line = F.concat(*[_fmt(n, w, k) for n, w, k in fields]).alias("value")
    df.select(line).write.mode("overwrite").text(path)
    return path


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[FieldSpec]
) -> DataFrame:
    """Read a fixed-width dataset back through the declared spec (never
    inference — the same contract as every declared-schema scan here)."""
    raw = spark.read.text(path)
    cols, start = [], 1
    for name, width, kind in fields:
        sl = F.substring("value", start, width)
        if kind == "str":
            cols.append(F.rtrim(sl).alias(name))
        elif kind == "int":
            cols.append(sl.cast("bigint").alias(name))
        elif kind == "sint":
            sign = F.when(F.substring("value", start, 1) == "-", -1).otherwise(1)
            mag = F.substring("value", start + 1, width - 1).cast("bigint")
            cols.append((sign * mag).cast("bigint").alias(name))
        else:
            raise ValueError(f"unknown fixed-width kind {kind!r} for {name!r}")
        start += width
    return raw.select(*cols)
