"""Relationalize: recursively flatten nested DataFrames into a tree of flat
tables linked by surrogate keys.

This is the one genuinely custom operator of the engine — the Spark-first
re-expression of Glue's ``DynamicFrame.relationalize`` plus the reference's
``add_index_to_table`` repair step (reference: src/glue/jobs/
json_s3_to_parquet.py:105-177, invoked at :199-224; output contract
documented in schemas/BridgeDownstream.json:8-16 — ``id`` is the "foreign
key of the parent dataset", ``index`` the "position of this element in the
original JSON array").

Output contract (matches the reference's golden test,
tests/test_json_s3_to_parquet.py:387-425):

- **root table**: struct fields flattened to ``parent_child`` columns;
  each ``array`` column replaced by a surrogate key column of the same
  name (BIGINT ``id`` of the child table, NULL when the array was NULL).
- **child table** per array field, named ``{root}_{field}`` (nested:
  ``{root}_{field}_{subfield}``, i.e. ``.val.`` → ``_`` per reference
  json_s3_to_parquet.py:211-217): columns
  ``id, index, <flattened element fields>, <inherited key columns>``.
  A scalar array's value column is named ``{field}_val``
  (reference json_s3_to_parquet.py:166-169). On flattened-name collision
  the already-present column keeps the short name and the newcomer keeps
  its path-qualified name (reference's duplicate-name guard,
  json_s3_to_parquet.py:172-174).

Scale design — **no join, no shuffle**: the reference inherits key columns
into children by joining each child against a ``distinct()`` parent index
(json_s3_to_parquet.py:151-160), a shuffle per nested level. We instead
propagate the key columns *at explode time* — the child is
``select(id, posexplode(arr), *keys)`` so the whole tree is produced by
narrow transformations over a single scan. The surrogate ``id`` is a
deterministic ``xxhash64(path, *link_cols, array_value)`` rather than
Glue's opaque transient integers, so re-runs and retries produce stable
keys (idempotent writes remain idempotent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["has_nested_fields", "relationalize"]

#: Key columns every table inherits, in the reference's output order
#: (reference: json_s3_to_parquet.py:151-155 — parent index selects
#: [field, assessmentid, year, month, day, recordid]).
DEFAULT_KEY_COLS = ("assessmentid", "year", "month", "day", "recordid")


def has_nested_fields(schema: T.StructType) -> bool:
    """True if any top-level field is an array or struct — i.e. the table
    must be relationalized before it can be written flat.

    Reference: json_s3_to_parquet.py:37-57.
    """
    return any(
        isinstance(f.dataType, (T.ArrayType, T.StructType)) for f in schema.fields
    )


def _unique_name(wanted: str, taken: set[str], fallback: str) -> str:
    """Duplicate-name guard: prefer ``wanted``; on collision keep the
    path-qualified ``fallback`` (reference json_s3_to_parquet.py:172-174
    keeps the original prefixed name for duplicates)."""
    if wanted not in taken:
        return wanted
    if fallback not in taken:
        return fallback
    i = 1
    while f"{fallback}_{i}" in taken:
        i += 1
    return f"{fallback}_{i}"


def _flatten_structs(df: DataFrame, protected: set[str]) -> DataFrame:
    """Flatten all top-level struct columns to ``parent_child`` columns,
    repeatedly, until no struct remains. Arrays are left in place (they
    become child tables). Pure projection — narrow, no shuffle."""
    while True:
        struct_fields = [
            f
            for f in df.schema.fields
            if isinstance(f.dataType, T.StructType) and f.name not in protected
        ]
        if not struct_fields:
            return df
        taken = {c for c in df.columns}
        cols: list[Column] = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType) and f.name not in protected:
                taken.discard(f.name)
                for sub in f.dataType.fields:
                    name = _unique_name(
                        f"{f.name}_{sub.name}", taken, f"{f.name}_{sub.name}"
                    )
                    taken.add(name)
                    cols.append(F.col(f.name).getField(sub.name).alias(name))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)


def _surrogate_id(path: str, link_cols: list[str], arr_col: str) -> Column:
    """Deterministic surrogate key for one array column of one row.

    Hashing (path literal, linking columns, array contents) makes the id
    stable across runs/retries and unique per distinct parent row + value —
    rows with identical keys *and* identical arrays share an id, which is
    exactly the reference's semantics (its parent index is ``distinct()``-ed
    before the child join, json_s3_to_parquet.py:151-155).
    """
    return F.xxhash64(F.lit(path), *[F.col(c) for c in link_cols], F.col(arr_col))


def relationalize(
    df: DataFrame,
    name: str,
    key_cols: tuple[str, ...] = DEFAULT_KEY_COLS,
) -> dict[str, DataFrame]:
    """Flatten ``df`` into ``{table_name: flat DataFrame}``.

    ``key_cols`` (those present in ``df``) are inherited by every child
    table, appended after the element fields in the given order.
    The root table is returned under ``name``; children under
    ``{name}_{field}`` etc. Parent tables always sort before their children
    (same guarantee the reference gets from ``sorted(keys)``,
    json_s3_to_parquet.py:204).
    """
    present_keys = [c for c in key_cols if c in df.columns]
    out: dict[str, DataFrame] = {}
    _relationalize_level(
        df,
        name,
        link_cols=present_keys,
        inherit_cols=present_keys,
        out=out,
        is_root=True,
    )
    return dict(sorted(out.items()))


def _relationalize_level(
    df: DataFrame,
    name: str,
    link_cols: list[str],
    inherit_cols: list[str],
    out: dict[str, DataFrame],
    is_root: bool,
) -> None:
    # 1. Flatten structs (never the linking/inherited columns themselves).
    df = _flatten_structs(df, protected=set())

    # 2. Each array column becomes a child table; the parent keeps a
    #    surrogate-key column under the array's name.
    array_fields = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.ArrayType)
    ]
    for field in array_fields:
        child_name = f"{name}_{field}"
        path = child_name  # unique per table ⇒ fine as the hash salt
        sid = _surrogate_id(path, link_cols, field)
        id_col = F.when(F.col(field).isNotNull(), sid).alias("__sid__")

        elem_type = df.schema[field].dataType.elementType
        exploded = (
            df.where(F.col(field).isNotNull())
            .select(
                sid.alias("id"),
                F.posexplode(field).alias("index", "__val__"),
                *[F.col(c) for c in inherit_cols],
            )
        )
        if isinstance(elem_type, T.StructType):
            taken = {"id", "index", *inherit_cols}
            elem_cols: list[Column] = []
            for sub in elem_type.fields:
                n = _unique_name(sub.name, taken, f"{field}_{sub.name}")
                taken.add(n)
                elem_cols.append(F.col("__val__").getField(sub.name).alias(n))
            child = exploded.select("id", "index", *elem_cols, *inherit_cols)
        else:
            # scalar (or array-of-array) element → single value column
            val_name = f"{field}_val"
            child = exploded.select(
                "id", "index", F.col("__val__").alias(val_name), *inherit_cols
            )

        # Recurse: the child may itself contain structs/arrays. Its rows are
        # linked by (id, index), which therefore join the hash inputs of any
        # grandchild surrogate ids.
        _relationalize_level(
            child,
            child_name,
            link_cols=["id", "index"],
            inherit_cols=inherit_cols,
            out=out,
            is_root=False,
        )

        # Parent: replace the array column with the surrogate key.
        df = df.withColumn(field, id_col)

    # _relationalize_level is re-entered for children *before* the parent is
    # stored, but children never collide with the parent key.
    if is_root:
        out[name] = df
    else:
        # Children keep contract order: id, index, fields..., inherited keys.
        out[name] = df
