"""Domain rebalancing: rates derive from observed counts, membership is
hash-deterministic, targeted mode honors explicit shares."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridgedownstream_spark.operators.sampling import (
    domain_rates,
    rebalance_domains,
)


def _corpus(spark):
    rows = (
        [("web", f"w{i}") for i in range(800)]
        + [("code", f"c{i}") for i in range(150)]
        + [("books", f"b{i}") for i in range(50)]
    )
    return spark.createDataFrame(rows, "source string, doc_id string")


def test_uniform_rates_target_minority(spark):
    d = _corpus(spark)
    rates = {r["source"]: r for r in domain_rates(d, "source").collect()}
    assert rates["books"]["rate_bp"] == 10000  # minority kept whole
    assert rates["web"]["rate_bp"] == 10000 * 50 // 800
    assert rates["code"]["rate_bp"] == 10000 * 50 // 150


def test_rebalance_is_deterministic_and_near_target(spark):
    d = _corpus(spark)
    out = rebalance_domains(d, "source", "doc_id")
    # identical row set on re-run over re-partitioned input
    again = rebalance_domains(d.repartition(7), "source", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["books"] == 50  # rate 10000 keeps everything
    # hash gate approximates the rate: within ±40% at these tiny counts
    assert 25 <= by["web"] <= 75 and 25 <= by["code"] <= 75
    # original columns survive, helper columns do not
    assert set(out.columns) == {"source", "doc_id"}


def test_targeted_shares_scale_to_feasible_total(spark):
    d = _corpus(spark)
    # 80/20 code/books. Feasible total T = min(150*10000//8000,
    # 50*10000//2000) = min(187, 250) = 187 — code is the binding domain.
    rates = {
        r["source"]: r
        for r in domain_rates(
            d, "source", {"code": 8000, "books": 2000}
        ).collect()
    }
    assert rates["web"]["rate_bp"] == 0  # untargeted domain excluded
    assert rates["code"]["rate_bp"] == 187 * 8000 // 150  # = 9973
    assert rates["books"]["rate_bp"] == 187 * 2000 // 50  # = 7480
    # expected kept counts land near T*share: 0.8*187 ~= 150, 0.2*187 ~= 37
    out = rebalance_domains(d, "source", "doc_id", {"code": 8000, "books": 2000})
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "web" not in by
    assert 120 <= by["code"] <= 150 and 20 <= by["books"] <= 50

    with pytest.raises(ValueError, match="bp"):
        domain_rates(d, "source", {"code": 0})
