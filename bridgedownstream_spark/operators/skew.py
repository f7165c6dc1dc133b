"""Salted join: manual hot-key mitigation for shuffle joins.

AQE's skew-join split (enabled in session.py) handles most skew by
splitting oversized shuffle partitions, but it only fires for sort-merge /
shuffled-hash joins inside one stage and only past its size thresholds.
When one key holds 30% of a 100 TB fact table, the classic manual remedy
still wins: **salt** the fact side into S sub-keys and **replicate** the
other side S times, so the hot key's rows spread over S tasks instead of
melting one executor.

    fact:  salt = pmod(xxhash64(<row>), S)       (deterministic spread)
    dim:   explode(sequence(0, S-1)) as salt     (S copies per row)
    join on (key…, salt)                          → S-way parallel hot keys

Cost model: the dim side shuffles S× its size — worth it when
(dim_bytes × S) ≪ (hot_key_rows / tasks-without-salting). Use broadcast
instead when the dim fits in memory; use AQE alone when skew is mild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with an ``salt``-way salted key.

    Result is identical to ``fact.join(dim, on, how)`` for ``inner`` and
    ``left`` joins (each fact row keeps exactly the matches it had — the
    salt pairs every fact row with the one dim replica sharing its salt).
    Right/full joins would multiply unmatched dim rows by the replica
    count and are refused.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    fact_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)
    ).cast("int")
    f = fact.withColumn("__salt", fact_salt)
    d = dim.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(salt - 1).cast("int"))
        ).alias("__salt"),
    )
    return f.join(d, [*on, "__salt"], how).drop("__salt")
