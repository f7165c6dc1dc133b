"""Query registry: every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) exposed as (spark, sf_dir) -> DataFrame
callables, each with a DuckDB-oracle ANSI SQL twin where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bridgedownstream_spark.queries import (
    advanced,
    core,
    curation,
    llm,
    multimodal_q,
    ops,
    pipeline_q,
    similarity,
)

#: name -> (query_fn, oracle_sql_or_None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
REGISTRY.update(core.QUERIES)
REGISTRY.update(advanced.QUERIES)
REGISTRY.update(ops.QUERIES)
REGISTRY.update(llm.QUERIES)
REGISTRY.update(curation.QUERIES)
REGISTRY.update(similarity.QUERIES)
REGISTRY.update(multimodal_q.QUERIES)
REGISTRY.update(pipeline_q.QUERIES)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}
