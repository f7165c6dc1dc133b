"""Domain rebalancing: deterministic resampling to a target corpus mix.

Training-data pipelines control the DOMAIN MIX of a corpus (web vs code vs
books, or per-source shares) by downsampling over-represented domains.
The reference has no such operator (its datasets are per-study); this is
part of the LLM-pipeline extension surface, alongside the quality-weighted
and stratified samplers (queries/curation.py, queries/advanced.py) which
decide membership per row — this one decides per-domain RATES from the
observed counts, then applies them with the same hash-gate determinism.

Scale shape: one (domain, count) partial-aggregated shuffle to learn the
distribution (domains are few — the rate table always broadcasts), then a
pure filter: membership is ``md5-hash(key) % 10000 < rate_bp``, a
projection-stage predicate with no RNG and no partition-order dependence,
so a 100 TB resample is reproducible, resumable, and auditable — the same
properties the stratified sampler documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["domain_rates", "rebalance_domains"]


def _hash60(col: Column) -> Column:
    # portable md5-60 (identical in DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def domain_rates(
    df: DataFrame, domain_col: str, target_bp: dict[str, int] | None = None
) -> DataFrame:
    """Per-domain acceptance rates ``(domain, n_docs, rate_bp)``.

    With ``target_bp=None`` (uniform-at-minority): every domain is
    downsampled to the smallest domain's size — ``rate_bp =
    (10000 * min_n) div n_d`` — the classic balancing that equalizes
    domain exposure without upsampling. With an explicit ``{domain:
    share_bp}`` target (shares summing to ≤10000), the output is scaled
    to the largest total the data can satisfy: ``T = min_d(n_d * 10000 /
    share_d)``, ``rate_bp = (T * share_d) div (n_d)`` — domains absent
    from the target get rate 0. Integer basis-point arithmetic keeps the
    rates (and therefore membership) engine-portable and exact.
    """
    c = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    if target_bp is None:
        m = c.agg(F.min("n_docs").alias("__mn"))
        return c.crossJoin(F.broadcast(m)).select(
            domain_col,
            "n_docs",
            F.expr("CAST((10000 * __mn) div n_docs AS BIGINT)").alias("rate_bp"),
        )
    total = sum(target_bp.values())
    if not 0 < total <= 10000:
        raise ValueError(
            f"rebalance_domains: target shares sum to {total} bp, need (0, 10000]"
        )
    tgt = F.create_map(
        *[F.lit(x) for kv in target_bp.items() for x in kv]
    )
    withs = c.withColumn("share_bp", F.coalesce(tgt[F.col(domain_col)], F.lit(0)))
    cap = withs.where(F.col("share_bp") > 0).agg(
        F.min(F.expr("(n_docs * 10000) div share_bp")).alias("__t")
    )
    return withs.crossJoin(F.broadcast(cap)).select(
        domain_col,
        "n_docs",
        F.expr("CAST(CASE WHEN share_bp = 0 THEN 0 "
               "ELSE (__t * share_bp) div (n_docs) END AS BIGINT)"
               ).alias("rate_bp"),
    )


def rebalance_domains(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_bp: dict[str, int] | None = None,
) -> DataFrame:
    """Rows of ``df`` surviving the rebalance: each row kept iff
    ``hash60(key) % 10000 < rate_bp(domain)``. Deterministic in the row
    KEY — re-running on re-partitioned input keeps the same rows."""
    rates = domain_rates(df, domain_col, target_bp)
    gate = _hash60(F.col(key_col).cast("string")) % 10000 < F.col("rate_bp")
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(gate)
        .drop("n_docs", "rate_bp")
    )
