"""Lake catalog: expose every parquet table under a lake root as SQL views.

The reference's interactive surface is SQL strings against cataloged
tables (`select * from {source_table} where ...`,
src/scripts/bootstrap_trigger/bootstrap_trigger.py:98-118; Glue Catalog
EXTERNAL_TABLEs per study, templates/study-pipeline-infra.j2:149-176).
This module is that surface for the whole lake in one call: each table
directory (root + relationalized children) becomes a temp view, so every
query the reference user runs today ships unchanged through `spark.sql`.

Views are lazy — registration reads only footers for schema; partition
discovery and pruning happen per query, so registering a 100 TB lake
costs a directory listing.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from bridgedownstream_spark.pipeline.fsutil import has_data_files, list_dirs

__all__ = ["register_lake_views"]

#: reserved lake-root directories that are not tables
_NON_TABLE_DIRS = {"archive", "quarantine", "checkpoints"}

_VALID_VIEW = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def register_lake_views(
    spark: SparkSession, parquet_root: str, prefix: str = ""
) -> list[str]:
    """Register every readable table under ``parquet_root`` as a temp view
    named ``{prefix}{table_dir}``; returns the view names (sorted).

    Skips reserved non-table directories (``archive``/``quarantine``/
    ``checkpoints``) and directories with no visible data files (emptied
    tables, crashed-write residue). Directory names that are not valid
    SQL identifiers raise rather than being silently skipped — a lake
    with such names needs renaming, not invisible tables.
    """
    out: list[str] = []
    for name in list_dirs(spark, parquet_root):
        if name in _NON_TABLE_DIRS:
            continue
        view = f"{prefix}{name}"
        if not _VALID_VIEW.match(view):
            raise ValueError(
                f"register_lake_views: {view!r} is not a valid SQL view "
                "name — rename the table directory"
            )
        path = os.path.join(parquet_root, name)
        if not has_data_files(spark, path):
            continue
        spark.read.parquet(path).createOrReplaceTempView(view)
        out.append(view)
    return sorted(out)
