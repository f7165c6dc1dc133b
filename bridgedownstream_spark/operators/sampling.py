"""Domain rebalancing: deterministic resampling to a target corpus mix.

Training-data pipelines control the DOMAIN MIX of a corpus (web vs code vs
books, or per-source shares) by downsampling over-represented domains.
The reference has no such operator (its datasets are per-study); this is
part of the LLM-pipeline extension surface, alongside the quality-weighted
and stratified samplers (queries/curation.py, queries/advanced.py) which
decide membership per row — this one decides per-domain RATES from the
observed counts, then applies them with the same hash-gate determinism.

Rates are integers in PARTS-PER-BILLION (ppb), not basis points: a bp gate
truncates to 0 whenever a domain outnumbers the minority by >10^4 — a real
web-vs-niche ratio — silently dropping the whole majority domain. At ppb
the truncation threshold is 10^9:1, and ``rebalance_domains`` warns loudly
if a targeted domain's rate still rounds to zero. Intermediate products
(``SCALE * count``) go through DECIMAL(38,0) so a 10^12-row domain cannot
overflow BIGINT.

Scale shape: one (domain, count) partial-aggregated shuffle to learn the
distribution (domains are few — the rate table always broadcasts), then a
pure filter: membership is ``md5-hash(key) % 10^9 < rate_ppb``, a
projection-stage predicate with no RNG and no partition-order dependence,
so a 100 TB resample is reproducible, resumable, and auditable — the same
properties the stratified sampler documents.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SCALE_PPB", "domain_rates", "rebalance_domains"]

#: Gate denominator: parts-per-billion.
SCALE_PPB = 1_000_000_000


def _hash60(col: Column) -> Column:
    # portable md5-60 (identical in DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def domain_rates(
    df: DataFrame, domain_col: str, target_bp: dict[str, int] | None = None
) -> DataFrame:
    """Per-domain acceptance rates ``(domain, n_docs, rate_ppb)``.

    With ``target_bp=None`` (uniform-at-minority): every domain is
    downsampled to the smallest domain's size — ``rate_ppb =
    (10^9 * min_n) div n_d`` — the classic balancing that equalizes
    domain exposure without upsampling. With an explicit ``{domain:
    share_bp}`` target (each share > 0, shares summing to ≤10000), the
    output is scaled to the largest total the data can satisfy:
    ``T = min_d(n_d * 10^9 / share_ppb_d)``, ``rate_ppb =
    (T * share_ppb_d) div n_d`` — domains absent from the target get
    rate 0. Integer ppb arithmetic keeps the rates (and therefore
    membership) engine-portable and exact; intermediates are
    DECIMAL(38,0) so counts up to ~10^28 cannot overflow.
    """
    c = df.groupBy(domain_col).agg(F.count("*").alias("__bds_n"))
    if target_bp is None:
        m = c.agg(F.min("__bds_n").alias("__bds_mn"))
        return c.crossJoin(F.broadcast(m)).select(
            domain_col,
            F.col("__bds_n").alias("n_docs"),
            F.expr(
                "CAST((CAST(__bds_mn AS DECIMAL(38,0)) * 1000000000)"
                " div __bds_n AS BIGINT)"
            ).alias("rate_ppb"),
        )
    bad = {k: v for k, v in target_bp.items() if v <= 0}
    if bad:
        raise ValueError(
            f"rebalance_domains: non-positive target shares (bp): {bad}"
        )
    total = sum(target_bp.values())
    if not 0 < total <= 10000:
        raise ValueError(
            f"rebalance_domains: target shares sum to {total} bp, need (0, 10000]"
        )
    # shares arrive in basis points (user-friendly); the gate runs in ppb
    tgt = F.create_map(
        *[F.lit(x) for k, v in target_bp.items() for x in (k, v * 100_000)]
    )
    withs = c.withColumn(
        "__bds_share_ppb", F.coalesce(tgt[F.col(domain_col)], F.lit(0))
    )
    cap = withs.where(F.col("__bds_share_ppb") > 0).agg(
        F.min(
            F.expr(
                "(CAST(__bds_n AS DECIMAL(38,0)) * 1000000000)"
                " div __bds_share_ppb"
            )
        ).alias("__bds_t")
    )
    return withs.crossJoin(F.broadcast(cap)).select(
        domain_col,
        F.col("__bds_n").alias("n_docs"),
        F.expr(
            "CAST(CASE WHEN __bds_share_ppb = 0 THEN 0 "
            "ELSE (CAST(__bds_t AS DECIMAL(38,0)) * __bds_share_ppb)"
            " div __bds_n END AS BIGINT)"
        ).alias("rate_ppb"),
    )


def rebalance_domains(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_bp: dict[str, int] | None = None,
    rates: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``df`` surviving the rebalance: each row kept iff
    ``hash60(key) % 10^9 < rate_ppb(domain)``. Deterministic in the row
    KEY — re-running on re-partitioned input keeps the same rows.

    The rate table is domain-cardinality (it always broadcasts), so it is
    materialized driver-side once — this both avoids recomputing the
    counts inside the join and lets us validate loudly instead of
    silently dropping data: a targeted domain with no rows raises, and a
    domain whose computed rate truncates to 0 warns (the caller would
    otherwise see it vanish from the output).

    ``rates`` lets a caller that already materialized the rate table
    (e.g. to report it alongside the survivors) share ONE counting scan
    instead of recomputing it here; it must be the
    ``domain_rates(df, domain_col, target_bp)`` frame, ideally
    checkpointed.
    """
    if rates is None:
        rates = domain_rates(df, domain_col, target_bp)
    # bounded collect: one row per domain (see docstring)
    rate_rows = rates.collect()
    if target_bp is not None:
        present = {r[domain_col] for r in rate_rows}
        missing = sorted(set(target_bp) - present)
        if missing:
            raise ValueError(
                f"rebalance_domains: targeted domains have no rows: {missing}"
            )
    eliminated = sorted(
        r[domain_col]
        for r in rate_rows
        if r["rate_ppb"] == 0
        and (target_bp is None or target_bp.get(r[domain_col], 0) > 0)
    )
    if eliminated:
        warnings.warn(
            "rebalance_domains: computed rate rounds to 0 ppb — these "
            f"domains will contribute ZERO rows: {eliminated}",
            stacklevel=2,
        )
    # internal prefixed names so an input df that already carries
    # n_docs/rate_ppb columns is neither clobbered nor made ambiguous
    rates_local = (
        df.sparkSession.createDataFrame(rate_rows, rates.schema)
        .withColumnRenamed("n_docs", "__bds_n_docs")
        .withColumnRenamed("rate_ppb", "__bds_rate_ppb")
    )
    gate = (
        _hash60(F.col(key_col).cast("string")) % SCALE_PPB
        < F.col("__bds_rate_ppb")
    )
    return (
        df.join(F.broadcast(rates_local), domain_col)
        .where(gate)
        .drop("__bds_n_docs", "__bds_rate_ppb")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    seed: str = "split-v1",
    train_ppb: int = 800_000_000,
    val_ppb: int = 100_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment — the canonical ML-data
    split, as a pure function of (key, seed): every engine, every run,
    every shard of a 100 TB corpus assigns each key the same split, so
    train/eval contamination cannot creep in through reshuffles,
    retries, or re-ingestion (the property random() splits lose the
    moment a partition recomputes).

    Gate: portable md5-60 of ``key || ':' || seed`` reduced to parts per
    billion; [0, train) → train, [train, train+val) → val, rest → test.
    Changing the seed re-rolls the whole assignment; keys added later
    fall into splits at the same expected rates. Narrow projection —
    no shuffle, no state.
    """
    if train_ppb <= 0 or val_ppb < 0:
        raise ValueError(
            f"split_assign: need train_ppb > 0 and val_ppb >= 0, got "
            f"train_ppb={train_ppb}, val_ppb={val_ppb}"
        )
    if not 0 < train_ppb + val_ppb < 1_000_000_000:
        raise ValueError(
            f"split_assign: train+val ppb must be in (0, 1e9), got "
            f"{train_ppb + val_ppb}"
        )
    gate = _hash60(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))
    ) % F.lit(1_000_000_000).cast("long")
    return df.withColumn(
        "split",
        F.when(gate < train_ppb, "train")
        .when(gate < train_ppb + val_ppb, "val")
        .otherwise("test"),
    )
