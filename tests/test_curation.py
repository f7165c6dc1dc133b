"""Edge-case tests for the curation operators (queries/curation.py).

The oracle gate exercises the happy path at sf0.01; these pin the corner
the synthetic corpus never hits: documents too short to produce a single
n-gram. Spark's ``sequence(1, n)`` DESCENDS when n < 1, so an unguarded
shingle generator would emit garbage grams for short docs instead of none.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridgedownstream_spark.queries import curation


@pytest.fixture(scope="module")
def tiny_docs_dir(spark, tmp_path_factory):
    """A documents.parquet with degenerate rows: 1 token, exactly 8 tokens,
    and a doc_id divisible by both 5 (PII injection) and 20 (benchmark)."""
    path = str(tmp_path_factory.mktemp("curation") / "lake")
    rows = [
        (1, "one two three four five six seven eight", "en", "src0", 39),
        (5, "short", "en", "src1", 5),
        (7, "a b c d e f g h i j", "en", "src2", 19),
        (20, "one two three four five six seven eight nine", "en", "src3", 44),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_short_doc_produces_zero_grams_not_garbage(spark, tiny_docs_dir):
    # doc 5 has 1 token: the 8-gram guard must emit an empty array, so the
    # doc simply doesn't appear in the per-doc gram counts (explode drops it).
    out = curation.contamination_check(spark, tiny_docs_dir).collect()
    by_id = {r.doc_id: r for r in out}
    assert 5 not in by_id
    # docs 1 and 7 are training docs with >= 8 tokens -> exactly
    # size - 7 grams each.
    assert by_id[1].n_grams == 1
    assert by_id[7].n_grams == 3
    # doc 20 is benchmark (20 % 20 == 0), never a training row.
    assert 20 not in by_id
    # doc 1's single 8-gram is a prefix of benchmark doc 20 -> contaminated.
    assert by_id[1].n_overlap == 1 and by_id[1].contamination_ratio == 1.0
    assert by_id[7].n_overlap == 0


def test_repetition_stats_single_token_doc_dropped(spark, tiny_docs_dir):
    out = {r.doc_id: r for r in curation.repetition_stats(spark, tiny_docs_dir).collect()}
    assert 5 not in out  # no bigrams from a 1-token doc
    r = out[1]
    assert r.n_bigrams == 7 and r.n_unique_bigrams == 7
    assert r.dup_bigram_ratio == 0.0 and r.max_bigram_repeats == 1


def test_pii_redact_injected_rows_only(spark, tiny_docs_dir):
    out = {r.doc_id: r for r in curation.pii_redact(spark, tiny_docs_dir).collect()}
    # doc_id % 5 == 0 rows get one email + one phone injected; others none.
    assert out[5].n_emails == 1 and out[5].n_phones == 1
    assert out[20].n_emails == 1 and out[20].n_phones == 1
    assert out[1].n_emails == 0 and out[1].n_phones == 0
    assert out[7].n_emails == 0 and out[7].n_phones == 0
    # redaction actually removed the PII: digest differs from the raw body's.
    raw = {
        r.doc_id: r.m
        for r in spark.read.parquet(f"{tiny_docs_dir}/documents.parquet")
        .select("doc_id", F.md5("text").alias("m"))
        .collect()
    }
    assert out[7].redacted_md5 == raw[7]  # untouched doc: digest unchanged
    assert out[5].redacted_md5 != raw[5]


def test_train_shards_cover_all_docs(spark, tiny_docs_dir):
    rows = curation.train_shards(spark, tiny_docs_dir).collect()
    assert sum(r.n_docs for r in rows) == 4
    assert all(0 <= r.shard < 16 for r in rows)
