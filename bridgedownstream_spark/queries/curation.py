"""Training-data curation operators beyond basic dedup/quality: PII
redaction, benchmark-contamination checks, repetition stats, weighted
sampling, shard assignment, and corpus n-gram stats.

These are the remaining ops a 100 TB curation pipeline runs between "raw
documents" and "training shards". Like :mod:`queries.llm`, every operator
uses engine-portable primitives (md5, RE2-safe ASCII regexes, array
lambdas, integer `div`) so each has an exact DuckDB oracle.

Scale notes are per-operator; the common theme is that everything heavy is
either a pure projection (scales with the scan) or a shuffle on small keys
(grams/digests), never on document bodies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bridgedownstream_spark.queries.util import (
    HASH60,
    portable_hash60,
    tbl,
    wide,
)

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


# RE2-and-Java-compatible ASCII patterns (no backrefs, no lookaround).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
#: Spark SQL single-quoted literals PROCESS backslash escapes (an
#: unrecognized escape like \. silently drops the backslash, turning the
#: regex's literal dot into any-char), while DuckDB literals and the
#: Python-API pattern argument pass backslashes through verbatim. Any
#: pattern embedded in an F.expr/spark.sql string must use this doubled
#: form or the three paths match DIFFERENT regexes.
_EMAIL_RE_SPARK_SQL = _EMAIL_RE.replace("\\", "\\\\")

# The synthetic corpus contains no PII, so the detector would only ever see
# zeros; inject deterministic synthetic PII into every 5th doc (identically
# in both engines) so the positive path is actually exercised and graded.
_PII_AUG_SQL = """
    CASE WHEN doc_id % 5 = 0
         THEN text || ' contact doc' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-000-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END
"""


@q(
    "pii_redact",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS body FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_redact(spark, sf_dir):
    """PII detection + redaction: count and mask emails/phone numbers.

    Pure projection (regexp_extract_all / regexp_replace are codegen'd
    JVM-side) — no shuffle, scales with the scan. The redacted body is
    returned as an md5 digest so the oracle compare stays 32 bytes/row.
    """
    d = tbl(spark, sf_dir, "documents")
    body = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-000-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    aug = d.select("doc_id", body.alias("body"))
    return aug.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(body, '{_EMAIL_RE_SPARK_SQL}', 0))")
        .cast("int")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all(body, '{_PHONE_RE}', 0))")
        .cast("int")
        .alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("redacted_md5"),
    )


# Word-shingle generator shared by contamination / repetition / top-k.
# Spark `sequence(1, n)` DESCENDS when n < 1, so the guard is mandatory.
def _grams_expr(tok_col: str, n: int) -> str:
    return (
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(1, size({tok_col}) - {n - 1}), "
        f"i -> array_join(slice({tok_col}, i, {n}), ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def _grams_sql(tok_col: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({tok_col}) - {n - 1}, 0)), "
        f"i -> array_to_string({tok_col}[i:i+{n - 1}], ' '))"
    )


_NORM_TOKS_SQL = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
_NORM_TOKS_EXPR = "split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"


@q(
    "contamination_check",
    f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct({_grams_sql("t", 8)})) AS g FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    train AS (SELECT doc_id, g FROM grams WHERE doc_id % 20 <> 0)
    SELECT train.doc_id,
           CAST(count(*) AS INT) AS n_grams,
           CAST(count(bench.g) AS INT) AS n_overlap,
           round(CAST(count(bench.g) AS DOUBLE) / count(*), 4) AS contamination_ratio
    FROM train LEFT JOIN bench ON train.g = bench.g
    GROUP BY 1
    """,
)
def contamination_check(spark, sf_dir):
    """Benchmark-contamination check: 8-gram overlap of each training doc
    against a held-out benchmark slice (here: every 20th doc stands in for
    the eval set).

    Scale path: shingles are DISTINCT'd per doc before the join and the
    join key is the gram string, so the only wide shuffles are gram-sized,
    never document bodies. The benchmark side carries NO broadcast hint:
    real benchmark suites are bounded (MBs) and the planner/AQE broadcast
    them from true sizes, but this fixture's stand-in (5% of the corpus)
    GROWS with the data — force-broadcasting a data-proportional side is
    the classic contamination-check OOM, so the choice is left adaptive.
    This is the standard "n-gram decontamination" pass (GPT-3 appendix C /
    PaLM style).
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_NORM_TOKS_EXPR).alias("t"))
    grams = toks.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_grams_expr("t", 8)))).alias("g")
    )
    bench = grams.where(F.col("doc_id") % 20 == 0).select("g").distinct()
    train = grams.where(F.col("doc_id") % 20 != 0)
    joined = train.join(
        bench.withColumnRenamed("g", "bg"),
        train.g == F.col("bg"),
        "left",
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_grams"),
        F.count("bg").cast("int").alias("n_overlap"),
        F.round(F.count("bg").cast("double") / F.count("*"), 4).alias(
            "contamination_ratio"
        ),
    )


@q(
    "repetition_stats",
    f"""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    grams AS (SELECT doc_id, unnest({_grams_sql("t", 2)}) AS g FROM toks),
    per AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS INT) AS n_bigrams,
           CAST(count(*) AS INT) AS n_unique_bigrams,
           round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 4) AS dup_bigram_ratio,
           CAST(max(c) AS INT) AS max_bigram_repeats
    FROM per GROUP BY 1
    """,
)
def repetition_stats(spark, sf_dir):
    """Intra-document repetition (Gopher-style quality rule): duplicate
    bigram fraction and the hottest bigram's multiplicity.

    Two-level aggregation, both keyed on (doc_id[, gram]) — partial
    aggregation absorbs most of it map-side; nothing wide moves.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("t"))
    grams = toks.select("doc_id", F.explode(F.expr(_grams_expr("t", 2))).alias("g"))
    per = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("int").alias("n_bigrams"),
        F.count("*").cast("int").alias("n_unique_bigrams"),
        F.round(1.0 - F.count("*").cast("double") / F.sum("c"), 4).alias(
            "dup_bigram_ratio"
        ),
        F.max("c").cast("int").alias("max_bigram_repeats"),
    )


@q(
    "quality_weighted_sample",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             len(list_distinct(string_split(trim(text), ' '))) AS uq,
             len(string_split(trim(text), ' ')) AS nt
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST((10000 * uq) // nt AS BIGINT) AS weight_bp
    FROM s
    WHERE {HASH60.format(x="CAST(doc_id AS VARCHAR)")} % 10000
          < (10000 * uq) // nt
    """,
)
def quality_weighted_sample(spark, sf_dir):
    """Deterministic quality-weighted sampling: keep each doc with
    probability proportional to its type-token ratio, decided by a portable
    hash of doc_id — reproducible across runs, engines, and cluster sizes
    (no RNG, no partition-order dependence). Pure filter+projection.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    s = d.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(toks)).alias("uq"),
        F.size(toks).alias("nt"),
    )
    weight = F.expr("(10000 * uq) div nt")
    return (
        s.where(
            portable_hash60(F.col("doc_id").cast("string")) % 10000 < weight
        ).select("doc_id", "n_chars", weight.cast("bigint").alias("weight_bp"))
    )


@q(
    "duplicate_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct({_grams_sql("t", 8)})) AS g FROM toks
    ),
    h AS (SELECT doc_id, {{hash_g}} AS gh FROM grams),
    c AS (SELECT doc_id, count(*) OVER (PARTITION BY gh) AS n_g FROM h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(CASE WHEN n_g > 1 THEN 1 END) AS BIGINT) AS n_shared,
           CAST((10000 * count(CASE WHEN n_g > 1 THEN 1 END))
                // greatest(count(*), 1) AS BIGINT) AS shared_bp
    FROM c GROUP BY 1
    """.format(hash_g=HASH60.format(x="g")),
)
def duplicate_spans(spark, sf_dir):
    """Cross-document repeated-span detection (the substring-dedup
    diagnostic of Lee et al.'s "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499, approximated at 8-gram
    granularity): for every document, how many of its distinct 8-gram
    spans also appear in ANOTHER document, and the duplicated share in
    basis points. The downstream dedup decision (drop spans vs drop
    docs) keys off shared_bp.

    Scale shape: ONE tokenize pass — gram strings hash to 60-bit ids at
    the scan (narrow), the sharers count is a single COUNT(*) window over
    the gram hash (each doc contributes at most one row per hash, so
    row-count == sharing-doc-count; both engines define sharing this same
    way, so the rare 60-bit intra-doc collision cannot diverge them), and
    only (doc_id, gh) pairs ever shuffle. The previous agg+join
    formulation re-ran the tokenize explode on both input branches (no
    exchange reuse — the two subtrees shuffle different payloads); the
    window form halves the dominant cost. Documents shorter than 8
    tokens have no spans and are absent by construction (both engines
    explode zero rows)."""
    from pyspark.sql import Window as W

    # NO scan-width floor here — measured as a regression (r9, two
    # interleaved A/B pairs: 2.44 s narrow vs 3.18 s widened, min-of-2
    # each, controls flat): the count-window shuffle on gh dominates and
    # the extra round-robin exchange of (doc_id, text) costs more than
    # the single-task tokenize saves at bench scale. At cluster layouts
    # wide() is a no-op anyway, so nothing is lost at 100 TB either.
    d = tbl(spark, sf_dir, "documents").select("doc_id", "text").withColumn(
        "t", F.expr(_NORM_TOKS_EXPR)
    )
    h = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_grams_expr("t", 8)))).alias("g"),
    ).select("doc_id", portable_hash60(F.col("g")).alias("gh"))
    n_g = F.count("*").over(W.partitionBy("gh"))
    return (
        h.select("doc_id", n_g.alias("n_g"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("n_g") > 1, 1)).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.expr(
                "CAST((10000 * n_shared) div greatest(n_grams, 1) AS BIGINT)"
            ).alias("shared_bp"),
        )
    )


@q(
    "rebalance_domains",
    f"""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT min(n_docs) AS mn FROM c),
    r AS (SELECT source, n_docs,
                 CAST((CAST(1000000000 AS BIGINT) * m.mn) // n_docs AS BIGINT)
                     AS rate_ppb
          FROM c, m)
    SELECT r.source, r.n_docs, r.rate_ppb,
           CAST(count(CASE WHEN {HASH60.format(x="CAST(doc_id AS VARCHAR)")}
                                % 1000000000 < r.rate_ppb THEN 1 END) AS BIGINT)
               AS n_kept
    FROM documents d JOIN r USING (source)
    GROUP BY 1, 2, 3
    """,
)
def rebalance_domains(spark, sf_dir):
    """Domain-mix rebalancing (operators/sampling.py): every source domain
    deterministically downsampled to the smallest domain's size —
    rate_ppb = (10^9·min_n) div n_d, membership = portable-hash gate on
    doc_id (ppb, not bp: a bp gate zeroes any domain >10^4× the minority).
    The audited output is the per-domain plan + achieved counts;
    the oracle recomputes rates AND membership, so a pass certifies both
    the rate derivation and the exact surviving-row set. At 100 TB: ONE
    (domain, count) shuffle learns the rates (checkpointed — the
    domain-sized table feeds the operator's gate, its validation
    collect, AND the report join without recounting the corpus), then a
    broadcast-joined projection-stage filter — bodies never shuffle."""
    from bridgedownstream_spark.operators.sampling import (
        domain_rates,
        rebalance_domains as _rebalance,
    )

    d = tbl(spark, sf_dir, "documents")
    rates = domain_rates(d, "source").localCheckpoint(eager=False)
    kept = (
        _rebalance(d, "source", "doc_id", rates=rates)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "rate_ppb",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


@q(
    "train_shards",
    f"""
    SELECT CAST({HASH60.format(x="CAST(doc_id AS VARCHAR)")} % 16 AS INT) AS shard,
           CAST(count(*) AS INT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def train_shards(spark, sf_dir):
    """Global deterministic shuffle-to-shards: assign every doc to one of 16
    training shards by portable hash and report shard balance. At 100 TB
    this is the final write stage — hash assignment gives uniform shards
    with no global sort and a single small aggregation to audit balance.
    """
    d = tbl(spark, sf_dir, "documents")
    shard = (portable_hash60(F.col("doc_id").cast("string")) % 16).cast("int")
    return d.groupBy(shard.alias("shard")).agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@q(
    "ngram_topk",
    f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    grams AS (SELECT unnest({_grams_sql("t", 2)}) AS bigram FROM toks)
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM grams GROUP BY 1
    ORDER BY cnt DESC, bigram ASC
    LIMIT 20
    """,
)
def ngram_topk(spark, sf_dir):
    """Corpus-level top-k n-grams (vocabulary/boilerplate audit). The
    groupBy key is the bigram string; partial aggregation collapses each
    partition's counts before the shuffle, and TakeOrderedAndProject keeps
    the top-k without a global sort. Tie-break on the gram itself makes the
    cut deterministic in both engines.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(F.expr(_NORM_TOKS_EXPR).alias("t"))
    grams = toks.select(F.explode(F.expr(_grams_expr("t", 2))).alias("bigram"))
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


_CHUNK_W = 32  # tokens per chunk (context-window size)
_CHUNK_S = 24  # stride: 8-token overlap between consecutive chunks


@q(
    "doc_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    starts AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t), 1), {_CHUNK_S})) AS s
      FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) // {_CHUNK_S} AS INT)       AS chunk_idx,
           CAST(s AS INT)                           AS start_tok,
           CAST(len(t[s:s+{_CHUNK_W - 1}]) AS INT)  AS n_tokens,
           md5(array_to_string(t[s:s+{_CHUNK_W - 1}], ' ')) AS chunk_md5
    FROM starts
    """,
)
def doc_chunking(spark, sf_dir):
    """Context-window chunking: split each document into overlapping
    {W}-token windows at stride {S} — the preprocessing step that turns raw
    documents into model-sized training/embedding inputs.

    Entirely native (sequence → posexplode → slice): chunking is a pure
    row-local projection, so it scales with the scan — no shuffle, no UDF.
    At 100 TB the explode multiplies rows ~n_tokens/stride ×, which is why
    the chunk payload here is the md5 of the window (what a real pipeline
    would hash-bucket or embed next), never a copy of the text.
    """
    d = tbl(spark, sf_dir, "documents")
    t = "split(trim(regexp_replace(text, '\\\\s+', ' ')), ' ')"
    return (
        d.select(
            "doc_id",
            F.expr(t).alias("t"),
        )
        # sequence() guard: greatest(n,1) keeps empty docs emitting exactly
        # one (empty) chunk instead of a descending sequence
        .select(
            "doc_id",
            "t",
            F.explode(
                F.expr(f"sequence(1, greatest(size(t), 1), {_CHUNK_S})")
            ).alias("s"),
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / _CHUNK_S).cast("int").alias("chunk_idx"),
            F.col("s").cast("int").alias("start_tok"),
            F.expr(f"CAST(size(slice(t, s, {_CHUNK_W})) AS INT)").alias("n_tokens"),
            F.expr(f"md5(array_join(slice(t, s, {_CHUNK_W}), ' '))").alias("chunk_md5"),
        )
    )


_SEG_W = 16  # tokens per dedup segment (the "paragraph" unit)


@q(
    "segment_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    segs AS (
      SELECT doc_id,
             CAST((s - 1) // {_SEG_W} AS INT) AS seg_idx,
             md5(array_to_string(t[s:s+{_SEG_W - 1}], ' ')) AS seg_md5
      FROM (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t), 1), {_SEG_W})) AS s
        FROM toks
      )
    ),
    ranked AS (
      SELECT doc_id, seg_idx,
             row_number() OVER (PARTITION BY seg_md5 ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_segments,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
           round(1.0 - CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 4) AS drop_ratio
    FROM ranked GROUP BY 1
    """,
)
def segment_dedup(spark, sf_dir):
    """Paragraph-level exact dedup (CCNet-style): split every document into
    fixed {W}-token segments, hash each, and keep only the FIRST corpus-wide
    occurrence of every segment (first = lowest (doc_id, seg_idx)); report
    per-doc how much survives. This is the line/paragraph dedup pass web
    corpora run before document-level near-dup — boilerplate (headers,
    nav bars, license blocks) repeats across documents that are nowhere
    near duplicates as wholes.

    Scale path: the only wide shuffle is the window partitioned by the
    32-byte segment md5 — groups are duplicate-sets (tiny, usually 1), so
    the window state is bounded and skew-free; document bodies never move.
    First-occurrence choice is total-ordered by (doc_id, seg_idx), so the
    result is deterministic on any cluster size.
    """
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_NORM_TOKS_EXPR).alias("t"))
    segs = (
        toks.select(
            "doc_id",
            "t",
            F.explode(
                F.expr(f"sequence(1, greatest(size(t), 1), {_SEG_W})")
            ).alias("s"),
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / _SEG_W).cast("int").alias("seg_idx"),
            F.expr(f"md5(array_join(slice(t, s, {_SEG_W}), ' '))").alias("seg_md5"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("seg_md5").orderBy("doc_id", "seg_idx")
    )
    # integer (bigint) sum: exact at any partial-agg merge order, and
    # visibly so to the registry-wide float-stabilization guard
    kept = F.sum((F.col("rn") == 1).cast("bigint"))
    return (
        segs.withColumn("rn", rn)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_segments"),
            kept.cast("int").alias("n_kept"),
            F.round(1.0 - kept.cast("double") / F.count("*"), 4).alias("drop_ratio"),
        )
    )


@q(
    "lm_perplexity",
    f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    big AS (
      SELECT doc_id, g, string_split(g, ' ')[1] AS w1
      FROM (SELECT doc_id, unnest({_grams_sql("t", 2)}) AS g FROM toks)
    ),
    c2 AS (SELECT g, count(*) AS c2 FROM big GROUP BY 1),
    c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
    v AS (
      SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(t) AS w FROM toks)
    ),
    scored AS (
      SELECT big.doc_id,
             CAST(round(-ln((c2.c2 + 1.0) / (c1.c1 + v.v)), 7)
                  AS DECIMAL(18,7)) AS nll
      FROM big JOIN c2 USING (g) JOIN c1 USING (w1) CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_bigrams,
           round(CAST(sum(nll) AS DOUBLE) / count(*), 4) AS avg_nll
    FROM scored GROUP BY 1
    """,
)
def lm_perplexity(spark, sf_dir):
    """Statistical-LM quality filter (CCNet/Gopher style): score every
    document by its average negative log-likelihood under an add-one-
    smoothed bigram model trained on the corpus itself. High avg_nll =
    improbable token sequences (gibberish, OCR noise, wrong language);
    a curation pipeline thresholds or buckets on this score.

    Plan shape: bigram extraction is a row-local explode; the model
    "training" is two partial-agg counts keyed on gram strings (never
    bodies); scoring re-joins the grams to their counts — shuffle keys are
    grams, exactly the contamination_check topology, so it scales the same
    way. The vocabulary size V is a one-row aggregate broadcast into the
    scoring join. Determinism: per-token NLL is rounded to 7 decimals and
    summed as DECIMAL, so the doc average is independent of partial-agg
    merge order (the skew_salted_agg lesson) — ln() itself agrees across
    engines at well under 1e-7 for these count ratios.
    """
    d = tbl(spark, sf_dir, "documents")
    # scan-width floor: toks feeds FOUR passes (c2, c1, V, scoring) and
    # each re-runs the tokenize+explode over the scan — on a single-row-
    # group input all four ran on one task (see util.wide; cluster no-op)
    toks = wide(spark, d.select("doc_id", "text"), sf_dir, "documents").select(
        "doc_id", F.expr(_NORM_TOKS_EXPR).alias("t")
    )
    big = toks.select(
        "doc_id", F.explode(F.expr(_grams_expr("t", 2))).alias("g")
    ).withColumn("w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
    # bigram model: vocabulary-sized, two consumers (the unigram marginal
    # + the scoring join) — checkpoint so the corpus explode+aggregate
    # runs once, and derive the unigram counts by REAGGREGATING it
    # (count of bigrams starting with w ≡ Σ c2 over grams with that left
    # word) instead of a second corpus pass
    c2 = (
        big.groupBy("g")
        .agg(
            F.count("*").alias("c2"),
            F.any_value(F.col("w1")).alias("w1"),
        )
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    c2 = c2.drop("w1")
    v = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    nll = F.round(
        -F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))), 7
    ).cast("decimal(18,7)")
    scored = (
        big.join(c2, "g")
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", nll.alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        F.round(F.sum("nll").cast("double") / F.count("*"), 4).alias("avg_nll"),
    )


_PACK_BUDGET = 2048  # tokens per training sequence/pack


@q(
    "pack_sequences",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                 AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM toks
    )
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
           CAST(cum_before // {_PACK_BUDGET} AS INT) AS pack_id,
           CAST(cum_before % {_PACK_BUDGET} AS INT)  AS pack_offset
    FROM c
    """,
)
def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing: lay documents end-to-end (per source,
    in doc_id order) into fixed {BUDGET}-token packs, recording each doc's
    pack id and byte^W token offset. This is the streaming-fill packing
    used to build pretraining batches without padding waste; docs that
    straddle a boundary are split at training time by the recorded offset.

    Plan: one window (cumulative sum) partitioned by source — the shuffle
    key is the corpus/source, so at 100 TB each source packs independently
    and in parallel. A giant single source would skew one partition; the
    production remedy is a two-level key (source, shard) where shard comes
    from the same hash used by train_shards, at the cost of per-shard
    rather than global contiguity.
    """
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.expr(
            "size(split(trim(regexp_replace(text, '\\\\s+', ' ')), ' '))"
        ).alias("n_tokens"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (cum / _PACK_BUDGET).cast("int").alias("pack_id"),
        (cum % _PACK_BUDGET).cast("int").alias("pack_offset"),
    )


@q(
    "train_val_test_split",
    """
    WITH s AS (
      SELECT lang,
             CASE WHEN g < 800000000 THEN 'train'
                  WHEN g < 900000000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT lang,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'),
                                   1, 15))::BIGINT % 1000000000 AS g
            FROM documents)
    )
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the document corpus
    (operators/sampling.py::split_assign), audited per language — the
    split every training pipeline runs first, certified engine-portable:
    the DuckDB oracle recomputes the md5-ppb gate per document and must
    land every doc in the identical split. Stratification quality (each
    language's mass splits ~80/10/10) follows from the hash gate's
    uniformity; CONTAMINATION-PROOFNESS follows from determinism — a
    recomputed partition, a retried task, or a re-ingested shard can
    never flip a document across the train/eval boundary.

    Plan/scale: the gate is a narrow md5 projection inside the scan
    stage; the only exchange is the audit's (split, lang) aggregate."""
    from bridgedownstream_spark.operators.sampling import split_assign

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        split_assign(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


@q(
    "domain_mix_kl",
    """
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
      FROM documents
    ),
    cur AS (SELECT source, CAST(sum(n) AS BIGINT) AS cur_toks
            FROM t GROUP BY 1),
    ref AS (SELECT source, CAST(sum(n) AS BIGINT) AS ref_toks
            FROM t WHERE doc_id % 10 < 9 GROUP BY 1),
    tot AS (SELECT (SELECT CAST(sum(cur_toks) AS BIGINT) FROM cur) AS ct,
                   (SELECT CAST(sum(ref_toks) AS BIGINT) FROM ref) AS rt)
    SELECT c.source, c.cur_toks, r.ref_toks,
           round((CAST(c.cur_toks AS DOUBLE) / ct)
                 * ln((CAST(c.cur_toks AS DOUBLE) * rt)
                      / (CAST(ct AS DOUBLE) * r.ref_toks)), 9) AS kl_term
    FROM cur c JOIN ref r USING (source) CROSS JOIN tot
    ORDER BY source
    """,
)
def domain_mix_kl(spark, sf_dir):
    """Training-mix drift monitor: per-domain KL-divergence terms of the
    CURRENT corpus token mix p against a reference snapshot mix q (the
    ``doc_id % 10 < 9`` slice stands in for yesterday's corpus, the
    profile_drift convention). Σ kl_term = KL(p ∥ q) in nats — the
    standard alarm for a crawl batch silently tilting the domain
    balance a data-mixture recipe was tuned on; per-domain terms
    localize WHICH source drifted (positive = over-represented vs the
    recipe, negative = starved).

    Portability: the inputs to ln() are exact BIGINT token counts
    combined in IEEE-exact double divisions, so both engines evaluate
    ln on bit-identical arguments; the result rounds to 9 decimals
    (the lm_perplexity discipline — libm agreement is far inside 1e-9
    for these O(1) ratios) and lands in DECIMAL so the hash compare is
    byte-stable.

    Plan/scale: token counts are size(split(...)) projections inside
    the scan stage — bodies never shuffle; both mixes aggregate from
    ONE scan (the reference mass is a conditional sum), the totals are
    a broadcast 1-row frame, and the output is domain-cardinality.
    """
    t = tbl(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n"),
    )
    mix = t.groupBy("source").agg(
        F.sum("n").cast("long").alias("cur_toks"),
        F.sum(F.when(F.col("doc_id") % 10 < 9, F.col("n")))
        .cast("long")
        .alias("ref_toks"),
    )
    tot = mix.agg(
        F.sum("cur_toks").cast("long").alias("ct"),
        F.sum("ref_toks").cast("long").alias("rt"),
    )
    p = F.col("cur_toks").cast("double") / F.col("ct")
    ratio = (F.col("cur_toks").cast("double") * F.col("rt")) / (
        F.col("ct").cast("double") * F.col("ref_toks")
    )
    return (
        # a source absent from the reference slice has no q to diverge
        # from — the oracle's inner join drops it, so must we (it would
        # surface via cur_toks in a totals-drift alarm, not KL)
        mix.where(F.col("ref_toks").isNotNull())
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "cur_toks",
            "ref_toks",
            F.round(p * F.log(ratio), 9).alias("kl_term"),
        )
        .orderBy("source")
    )


# -- BPE vocabulary induction -------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_round_duck(r: int) -> str:
    """One unrolled BPE merge round for the DuckDB oracle.

    DuckDB has no fold-with-state over lists, so the greedy left-to-right
    non-overlapping merge is stated relationally: candidate positions
    (pair match) group into runs of consecutive indices (gaps-and-islands)
    and a merge fires at every EVEN offset within its run — exactly the
    positions a left-to-right scanner consumes. The Spark side implements
    the same spec as a row-local aggregate() fold; two different
    algorithms, one answer (the near_dup_components pattern)."""
    return f"""
    s{r} AS (SELECT word, cnt, string_split(trim(repr), ' ') AS syms FROM w{r - 1}),
    p{r} AS (
        SELECT ls, rs, CAST(sum(cnt) AS BIGINT) AS pair_cnt FROM (
            SELECT syms[i.i] AS ls, syms[i.i + 1] AS rs, cnt
            FROM s{r}, unnest(generate_series(1, len(syms) - 1)) AS i(i))
        GROUP BY ls, rs),
    win{r} AS (SELECT ls, rs, pair_cnt FROM p{r}
               ORDER BY pair_cnt DESC, ls, rs LIMIT 1),
    pos{r} AS (
        SELECT word, cnt, i.i AS i, syms[i.i] AS sym,
               lead(syms[i.i]) OVER (PARTITION BY word ORDER BY i.i) AS nxt
        FROM s{r}, unnest(generate_series(1, len(syms))) AS i(i)),
    cand{r} AS (
        SELECT p.word, p.i FROM pos{r} p, win{r} w
        WHERE p.sym = w.ls AND p.nxt = w.rs),
    -- w{r} LEFT-joins win{r} ON TRUE (not CROSS JOIN): if a round finds
    -- no adjacent pairs (all words collapsed to single symbols), the
    -- empty winner must keep the vocabulary unchanged, not empty it —
    -- mirroring the Spark trainer's empty-winner early stop.
    mrg{r} AS (
        SELECT word, i FROM (
            SELECT word, i, min(i) OVER (PARTITION BY word, g) AS i0
            FROM (SELECT word, i,
                         i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
                  FROM cand{r}))
        WHERE (i - i0) % 2 = 0),
    w{r} AS (
        SELECT p.word, max(p.cnt) AS cnt,
               ' ' || string_agg(
                   CASE WHEN m.i IS NOT NULL THEN w.ls || w.rs ELSE p.sym END,
                   ' ' ORDER BY p.i) || ' ' AS repr
        FROM pos{r} p
        LEFT JOIN win{r} w ON TRUE
        LEFT JOIN mrg{r} m  ON m.word = p.word AND m.i = p.i
        LEFT JOIN mrg{r} sk ON sk.word = p.word AND sk.i = p.i - 1
        WHERE sk.i IS NULL
        GROUP BY p.word)
    """


#: shared CTE chain: initial character-split vocabulary w0 through the
#: merge-applied vocabularies w1..w3 (each round's winner in win1..win3) —
#: bpe_vocab_induction reads the winners, bpe_learned_segmentation reads
#: the final vocabulary.
_BPE_DUCK_CTES = (
    """
    WITH w0 AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS repr
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word),
    """
    + ",".join(_bpe_round_duck(r) for r in range(1, _BPE_ROUNDS + 1))
)

_BPE_DUCK = (
    _BPE_DUCK_CTES
    + """
    SELECT * FROM (
        SELECT CAST(1 AS INT) AS merge_round, ls AS left_sym, rs AS right_sym,
               ls || rs AS merged, pair_cnt FROM win1
        UNION ALL
        SELECT CAST(2 AS INT), ls, rs, ls || rs, pair_cnt FROM win2
        UNION ALL
        SELECT CAST(3 AS INT), ls, rs, ls || rs, pair_cnt FROM win3)
    ORDER BY merge_round
    """
)

#: adjacent symbol pairs of a word, row-local (no join): transform with the
#: index lambda, CASE-without-ELSE nulls the last slot, filter drops it.
_BPE_PAIRS_SPARK = (
    "filter(transform(syms, (s, i) -> CASE WHEN i < size(syms) - 1 THEN "
    "named_struct('ls', syms[i], 'rs', syms[i + 1]) END), x -> x IS NOT NULL)"
)

#: greedy left-to-right non-overlapping merge of (ls, rs) in one row-local
#: fold: the accumulator carries the rebuilt symbol list plus a skip bit
#: covering the element the previous merge consumed.
_BPE_MERGE_SPARK = """
    aggregate(
      sequence(0, size(syms) - 1),
      named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
      (acc, i) -> CASE
          WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
          WHEN i < size(syms) - 1 AND syms[i] = ls AND syms[i + 1] = rs
              THEN named_struct('out', array_append(acc.out, concat(ls, rs)),
                                'skip', true)
          ELSE named_struct('out', array_append(acc.out, syms[i]), 'skip', false)
      END,
      acc -> concat(' ', array_join(acc.out, ' '), ' '))
"""


def _bpe_train(spark, sf_dir):
    """Shared BPE trainer: returns (final vocabulary frame after ALL
    merge rounds applied, list of per-round 1-row winner frames). The
    loop state is vocab-sized; see bpe_vocab_induction for the scale
    argument."""
    docs = tbl(spark, sf_dir, "documents")
    # scan-width floor before the word explode (util.wide — cluster no-op)
    words = (
        wide(spark, docs.select("text"), sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn(
            "repr", F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 "))
        )
        .localCheckpoint(eager=False)
    )
    rounds = []
    for r in range(1, _BPE_ROUNDS + 1):
        with_syms = words.withColumn("syms", F.expr("split(trim(repr), ' ')"))
        winner = (
            with_syms.select("cnt", F.explode(F.expr(_BPE_PAIRS_SPARK)).alias("p"))
            .select("cnt", "p.ls", "p.rs")
            .groupBy("ls", "rs")
            .agg(F.sum("cnt").cast("bigint").alias("pair_cnt"))
            .orderBy(F.desc("pair_cnt"), "ls", "rs")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        rounds.append(
            winner.select(
                F.lit(r).cast("int").alias("merge_round"),
                F.col("ls").alias("left_sym"),
                F.col("rs").alias("right_sym"),
                F.concat("ls", "rs").alias("merged"),
                "pair_cnt",
            )
        )
        if not winner.take(1):
            # Degenerate corpus: no adjacent pairs remain (every word
            # already a single symbol). Without this stop the broadcast
            # cross join below would silently EMPTY the vocabulary and
            # every downstream aggregate would go NULL. Keep the current
            # vocabulary; the oracle's LEFT JOIN win{r} ON TRUE mirrors
            # this exactly (empty winner => repr unchanged, empty round
            # rows). winner is a checkpointed 1-row frame, so take(1)
            # costs one driver fetch per round, never a corpus scan.
            break
        words = (
            with_syms.crossJoin(F.broadcast(winner.select("ls", "rs")))
            .select("word", "cnt", F.expr(_BPE_MERGE_SPARK).alias("repr"))
            .localCheckpoint(eager=True)
        )
    return words, rounds


@q("bpe_vocab_induction", _BPE_DUCK)
def bpe_vocab_induction(spark, sf_dir):
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
    arXiv:1508.07909) — the tokenizer-training half that bpe_token_count's
    segmenter presupposes: 3 merge rounds, each electing the corpus-wide
    most frequent adjacent symbol pair (ties break lexicographically) and
    merging its non-overlapping occurrences greedily left to right.
    Output: (merge_round, left_sym, right_sym, merged, pair_count).

    A FIFTH iterative mechanism class beside frontier-BFS,
    relaxation-SSSP, fixed-point PageRank and peeling-k-core: the loop
    state is the corpus VOCABULARY (distinct word × count × symbol
    string), not the corpus — the only corpus-sized work is the initial
    word count, which map-side combines on the word key. Each round is
    (a) a row-local pair explode + one vocab-keyed partial aggregation,
    (b) a 1-row winner elected by TakeOrdered — kept distributed as a
    broadcast cross join, never collected — and (c) a row-local
    aggregate() fold applying the merge; the round's vocab frame
    localCheckpoints so iteration lineage stays O(1) (the kmeans/
    components pattern). At 100 TB the vocab is ~10^7 rows against a
    corpus of ~10^11 — rounds cost vocab-scan, not corpus-scan.

    Counting uses the standard zip-adjacent convention (overlapping pairs
    count each occurrence) while application merges non-overlapping
    greedily — both engines implement the identical spec, DuckDB stating
    the greedy scan relationally (see _bpe_round_duck) and Spark folding
    it row-locally."""
    _, rounds = _bpe_train(spark, sf_dir)
    out = rounds[0]
    for fr in rounds[1:]:
        out = out.unionByName(fr)
    return out.orderBy("merge_round")


@q(
    "bpe_learned_segmentation",
    _BPE_DUCK_CTES + f"""
    SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * length(word)) AS BIGINT) AS char_tokens,
           CAST(sum(cnt * len(string_split(trim(repr), ' '))) AS BIGINT)
               AS bpe_tokens,
           CAST(sum(cnt * len(string_split(trim(repr), ' '))) * 1000000
                // sum(cnt * length(word)) AS BIGINT) AS compression_ppm
    FROM w{_BPE_ROUNDS}
    """,
)
def bpe_learned_segmentation(spark, sf_dir):
    """Close the tokenizer loop: apply the vocabulary bpe_vocab_induction
    just learned back to the corpus and certify the achieved compression —
    total corpus tokens under the merged vocabulary vs the character
    baseline (exact integer ppm). This is the induce→segment round trip a
    tokenizer-training pipeline runs end to end; a bug in EITHER half
    (wrong winner, wrong greedy application) shifts the token totals and
    fails the hash.

    Same scale shape as the trainer: segmentation statistics come from
    the vocab-sized frame (token count per distinct word × corpus count),
    so the corpus is scanned once and everything downstream is
    vocab-sized."""
    words, _ = _bpe_train(spark, sf_dir)
    toks = F.col("cnt") * F.size(F.expr("split(trim(repr), ' ')"))
    chars = F.col("cnt") * F.length("word")
    return words.agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.sum(chars).cast("bigint").alias("char_tokens"),
        F.sum(toks).cast("bigint").alias("bpe_tokens"),
        (F.sum(toks) * 1000000)
        .cast("bigint")
        .alias("_t"),
    ).select(
        "n_words",
        "char_tokens",
        "bpe_tokens",
        F.expr("_t div char_tokens").cast("bigint").alias("compression_ppm"),
    )


_KFOLD_K = 5


@q(
    "kfold_assign",
    f"""
    WITH f AS (
      SELECT source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv-v1'),
                                  1, 15))::BIGINT % {_KFOLD_K} AS INT) AS fold,
             n_chars
      FROM documents
    )
    SELECT fold, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM f GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def kfold_assign(spark, sf_dir):
    """Deterministic k-fold cross-validation assignment (k=5) — the CV
    sibling of train_val_test_split, sharing its md5 gate discipline:
    fold = portable 60-bit md5 of (doc_id, salt) mod k, so the folds are
    RNG-free, merge-order-free, and reproducible from the id alone (a
    re-ingested doc lands in the same fold forever — the property that
    keeps fold membership stable across corpus versions, which seeded
    RNG splits cannot give). Output is the per-(fold, source) stratum
    audit (doc and char counts) a CV pipeline checks before training.

    One scan → one tiny grouped aggregate (k × sources rows); the fold
    gate is a row-local projection, so the operator is scan-bound at any
    corpus size."""
    d = tbl(spark, sf_dir, "documents")
    fold = (
        portable_hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":cv-v1")))
        % _KFOLD_K
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("fold", "source")
    )


# -- DSIR importance resampling ------------------------------------------------

_DSIR_B = 64        # hashed n-gram feature buckets
_DSIR_K = 100       # documents selected
#: 2^60 + 2: maps the 60-bit doc hash to u in (0, 1) exclusive — u = 1
#: would send the Gumbel reparameterization -ln(-ln(u)) to +inf
_DSIR_U_DEN = 1152921504606846978.0

_DSIR_DUCK = f"""
    WITH toks AS (SELECT doc_id, lang, {_NORM_TOKS_SQL} AS t FROM documents),
    grams AS (
        SELECT doc_id, lang, unnest(t || {_grams_sql('t', 2)}) AS g FROM toks
    ),
    bucketed AS (
        SELECT doc_id, lang, {HASH60.format(x='g')} % {_DSIR_B} AS b FROM grams
    ),
    raw_c AS (SELECT b, count(*) AS c FROM bucketed GROUP BY b),
    tgt_c AS (SELECT b, count(*) AS c FROM bucketed WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT count(*) FROM bucketed) AS nr,
                   (SELECT count(*) FROM bucketed WHERE lang = 'en') AS nt),
    ratio AS (
        SELECT bb.b,
               CAST(round(ln(CAST((COALESCE(t.c, 0) + 1) * (tot.nr + {_DSIR_B}) AS DOUBLE)
                             / CAST((COALESCE(r.c, 0) + 1) * (tot.nt + {_DSIR_B}) AS DOUBLE)),
                          7) AS DECIMAL(18,7)) AS ratio
        FROM range({_DSIR_B}) AS bb(b)
        LEFT JOIN raw_c r ON r.b = bb.b
        LEFT JOIN tgt_c t ON t.b = bb.b, tot
    ),
    logw AS (
        SELECT doc_id, CAST(sum(ratio) AS DECIMAL(28,7)) AS logw
        FROM bucketed JOIN ratio USING (b) GROUP BY doc_id
    ),
    scored AS (
        -- score stays DECIMAL end to end: logw is a 7-decimal quantity
        -- and the gumbel a 6-decimal one, so their double sum lands
        -- EXACTLY on the round-6 half boundary whenever logw's 7th digit
        -- is 5 (~10% of docs) — and Spark's round (shortest-repr
        -- HALF_UP) disagrees with DuckDB's (binary) precisely there.
        -- Exact decimal addition has no boundary to disagree on.
        SELECT d.doc_id, d.lang,
               round(CAST(l.logw AS DOUBLE), 4) AS logw,
               CAST(l.logw + CAST(round(-ln(-ln(({HASH60.format(x='CAST(d.doc_id AS VARCHAR)')} + 1)
                                             / {_DSIR_U_DEN})), 6)
                                  AS DECIMAL(18,6))
                    AS DECIMAL(28,7)) AS score_dec
        FROM documents d JOIN logw l USING (doc_id)
    )
    SELECT doc_id, lang, logw, CAST(score_dec AS DOUBLE) AS score,
           CAST(row_number() OVER (ORDER BY score_dec DESC, doc_id) AS INT) AS rnk
    FROM scored ORDER BY score_dec DESC, doc_id LIMIT {_DSIR_K}
    """


@q("dsir_select", _DSIR_DUCK)
def dsir_select(spark, sf_dir):
    """DSIR data selection via importance resampling (Xie et al. 2023,
    arXiv:2302.03169): documents are featurized as hashed uni+bigram
    counts over {B} buckets, scored by the log importance ratio
    log p_target(x) − log q_raw(x) under add-one-smoothed bucket
    distributions (target = the 'en' slice, raw = the whole corpus), and
    the top-K are selected by Gumbel-top-k — the paper's sampling-
    without-replacement scheme, made RNG-free by reparameterizing the
    Gumbel noise from each doc's md5 (u = (h60+1)/(2^60+2), g =
    −ln(−ln(u))), so selection is deterministic, merge-order-free, and
    re-ingest-stable like every sampling gate here.

    Spark shape (the 100 TB argument): featurization and scoring are
    ROW-LOCAL — each doc folds its own grams against the broadcast
    64-element log-ratio array (built from ONE one-pass bucket count
    carrying raw+target partials — r9-opt merged the r8 form's three
    separate corpus passes — whose wire is (bucket, partial counts)
    after map-side combine, then collected into ONE row via
    array_sort(collect_list(struct))) — so
    the corpus is scanned once with zero gram-string shuffles and zero
    doc-keyed exchanges; the only data-sized movement is the final
    TakeOrdered(K). The DuckDB oracle states the same spec relationally
    (explode → bucket join → group-by-doc sum) — two formulations, one
    decimal-exact answer. Log ratios round to 7 decimals into DECIMAL
    before any summation (the lm_perplexity ln-parity discipline).

    r10 (VERDICT r9 #5): the model and scoring phases used to EACH run
    the tokenize + per-gram md5 expressions (two corpus-sized passes of
    the dominant per-task work). Now ONE pass folds each doc's grams to
    an INT bucket array, localCheckpointed doc-keyed (doc_id, lang,
    bs[]) — gram-order preserved, so the scoring fold's decimal
    accumulation sequence is bit-identical — and both the model
    aggregate (explode → groupBy(b)) and the row-local score fold read
    that materialization: tokenize ×1, md5-per-gram ×1, and the scoring
    branch's codegen no longer re-contains the tokenizer."""
    d = tbl(spark, sf_dir, "documents")
    bucket_of = (
        f"CAST(conv(substring(md5({{g}}), 1, 15), 16, 10) AS BIGINT) % {_DSIR_B}"
    )
    # scan-width floor BEFORE the tokenize/gram/md5 expressions so the
    # per-gram work runs machine-wide (single-row-group local input
    # serializes the scan; no-op on cluster-wide layouts — see util.wide)
    toks = wide(
        spark, d.select("doc_id", "lang", "text"), sf_dir, "documents"
    ).select(
        "doc_id", "lang", F.expr(_NORM_TOKS_EXPR).alias("t")
    ).withColumn(
        "grams", F.expr(f"concat(t, {_grams_expr('t', 2)})")
    ).select(
        "doc_id",
        "lang",
        F.expr(
            f"transform(grams, g -> CAST({bucket_of.format(g='g')} AS INT))"
        ).alias("bs"),
    ).localCheckpoint(eager=False)
    bucketed = toks.select(
        "lang",
        F.explode("bs").alias("b"),
    )
    # ONE corpus pass for the whole model: raw + target bucket counts as
    # two aggregates of the same map-side-combined groupBy (the r8 form
    # ran THREE separate corpus-sized explode+md5 passes — raw counts,
    # target counts, totals; the totals now reduce the 64-row frame).
    # The explode reads the checkpointed bucket arrays — no md5 here.
    bc = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tc"),
    )
    grid = spark.range(_DSIR_B).select(F.col("id").cast("int").alias("b"))
    totals = F.broadcast(
        bc.agg(
            F.sum("rc").alias("nr"),
            F.sum("tc").alias("nt"),
        )
    )
    ratio = (
        grid.join(F.broadcast(bc), "b", "left")
        .crossJoin(totals)
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce("tc", F.lit(0)) + 1)
                        * (F.col("nr") + _DSIR_B)
                    ).cast("double")
                    / (
                        (F.coalesce("rc", F.lit(0)) + 1)
                        * (F.col("nt") + _DSIR_B)
                    ).cast("double")
                ),
                7,
            )
            .cast("decimal(18,7)")
            .alias("ratio"),
        )
    )
    # ONE row holding the bucket-ordered ratio array — the broadcast model
    ratios_row = F.broadcast(
        ratio.agg(
            F.expr(
                "transform(array_sort(collect_list(struct(b, ratio))), x -> x.ratio)"
            ).alias("ratios")
        )
    )
    # row-local scoring fold: every doc dots its PRECOMPUTED bucket array
    # against the model — same per-doc accumulation order as the former
    # per-gram fold (transform preserves gram order), so the decimal sum
    # is bit-identical, with zero md5/tokenize work left in this branch
    logw_expr = (
        "aggregate(bs, CAST(0 AS DECIMAL(28,7)), "
        # the merge re-casts to the accumulator type: decimal addition
        # widens (28,7)+(18,7) -> (29,7) and aggregate() requires the
        # lambda to return exactly the zero's type
        "(acc, b) -> CAST(acc + element_at(ratios, b + 1) "
        "AS DECIMAL(28,7)), "
        "acc -> acc)"
    )
    u = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        )
        + 1
    ) / F.lit(_DSIR_U_DEN)
    gumbel = F.round(-F.log(-F.log(u)), 6)
    scored = (
        toks.crossJoin(ratios_row)
        .select(
            "doc_id",
            "lang",
            F.expr(logw_expr).alias("lw"),
        )
        .select(
            "doc_id",
            "lang",
            F.round(F.col("lw").cast("double"), 4).alias("logw"),
            # exact decimal sum — see the oracle's boundary note
            (F.col("lw") + gumbel.cast("decimal(18,6)"))
            .cast("decimal(28,7)")
            .alias("score_dec"),
        )
    )
    topk = scored.orderBy(F.col("score_dec").desc(), "doc_id").limit(_DSIR_K)
    # rank over the K-row result only (post-limit — never a global window)
    from pyspark.sql import Window as W

    return topk.withColumn(
        "rnk",
        F.row_number()
        .over(W.orderBy(F.col("score_dec").desc(), "doc_id"))
        .cast("int"),
    ).select(
        "doc_id",
        "lang",
        "logw",
        F.col("score_dec").cast("double").alias("score"),
        "rnk",
    )


# -- Heaps'-law vocabulary growth curve ----------------------------------------

_HEAPS_SLICES = 10

_HEAPS_DUCK = f"""
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    sliced AS (
        SELECT doc_id,
               -- floor, explicitly: DuckDB CAST(double AS INT) ROUNDS
               -- while Spark's cast truncates
               CAST(floor(doc_id * {_HEAPS_SLICES} / (mx.m + 1)) AS INT) AS s,
               {_NORM_TOKS_SQL} AS t
        FROM documents, mx
    ),
    inst AS (SELECT s, unnest(t) AS w FROM sliced),
    first_seen AS (SELECT w, min(s) AS fs FROM inst GROUP BY w),
    per_slice AS (
        SELECT i.s,
               count(*) AS toks,
               (SELECT count(*) FROM first_seen f WHERE f.fs = i.s) AS new_types
        FROM inst i GROUP BY i.s
    ),
    cum AS (
        SELECT s,
               CAST(sum(toks) OVER (ORDER BY s) AS BIGINT) AS tokens_cum,
               CAST(sum(new_types) OVER (ORDER BY s) AS BIGINT) AS vocab_cum
        FROM per_slice
    ),
    pts AS (
        SELECT s, tokens_cum, vocab_cum,
               CAST(round(ln(CAST(tokens_cum AS DOUBLE)), 7) AS DECIMAL(18,7)) AS x,
               CAST(round(ln(CAST(vocab_cum AS DOUBLE)), 7) AS DECIMAL(18,7)) AS y
        FROM cum
    ),
    fit AS (
        SELECT CAST(count(*) AS DECIMAL(18,0)) AS k,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts
    )
    SELECT p.s AS slice, p.tokens_cum, p.vocab_cum,
           round(CAST((f.k * f.sxy - f.sx * f.sy)
                      / (f.k * f.sxx - f.sx * f.sx) AS DOUBLE), 6) AS heaps_beta
    FROM pts p, fit f
    ORDER BY p.s
    """


@q("vocab_growth_curve", _HEAPS_DUCK)
def vocab_growth_curve(spark, sf_dir):
    """Heaps'-law vocabulary growth curve — the corpus statistic behind
    tokenizer vocabulary sizing and dedup QC (V(n) = K·n^beta; a beta
    near 1 means the corpus keeps minting new types — heavy noise/IDs —
    while a low beta flags heavy duplication): the corpus is cut into
    {S} cumulative ingest-order slices (row-local bucket from a
    broadcast max-id — never a global sort), each token's FIRST slice is
    one gram-keyed aggregation, and the curve is cumulative (tokens,
    vocabulary) per slice with the log-log least-squares slope as
    heaps_beta (the groupwise_regression closed-form on 10 points,
    ln values rounded to 7 decimals into DECIMAL sufficient statistics —
    merge-order-exact).

    Scale shape: the only corpus-sized shuffles key on token strings
    (min-slice per type — map-side combined, the contamination_check
    topology) and on the {S}-value slice id; the regression runs on
    {S} rows. First-occurrence-via-min is the same trick segment_dedup
    certifies at the segment level."""
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    mx = F.broadcast(d.agg(F.max("doc_id").alias("m")))
    sliced = d.crossJoin(mx).select(
        F.floor(F.col("doc_id") * _HEAPS_SLICES / (F.col("m") + 1))
        .cast("int")
        .alias("s"),
        F.expr(_NORM_TOKS_EXPR).alias("t"),
    )
    inst = sliced.select("s", F.explode("t").alias("w"))
    first_seen = inst.groupBy("w").agg(F.min("s").alias("fs"))
    new_types = first_seen.groupBy("fs").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    toks = inst.groupBy("s").agg(F.count(F.lit(1)).alias("toks"))
    per_slice = toks.join(
        F.broadcast(new_types), toks.s == new_types.fs, "left"
    ).select("s", "toks", F.coalesce("new_types", F.lit(0)).alias("new_types"))
    # running sums over exactly _HEAPS_SLICES rows — K-sized window
    wc = W.orderBy("s").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_slice.select(
        "s",
        F.sum("toks").over(wc).cast("bigint").alias("tokens_cum"),
        F.sum("new_types").over(wc).cast("bigint").alias("vocab_cum"),
    )
    pts = cum.select(
        "s",
        "tokens_cum",
        "vocab_cum",
        F.round(F.log(F.col("tokens_cum").cast("double")), 7)
        .cast("decimal(18,7)")
        .alias("x"),
        F.round(F.log(F.col("vocab_cum").cast("double")), 7)
        .cast("decimal(18,7)")
        .alias("y"),
    )
    fit = F.broadcast(
        pts.agg(
            F.count(F.lit(1)).cast("decimal(18,0)").alias("k"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    beta = F.round(
        (
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).cast("double"),
        6,
    )
    return (
        pts.crossJoin(fit)
        .select(
            F.col("s").alias("slice"),
            "tokens_cum",
            "vocab_cum",
            beta.alias("heaps_beta"),
        )
        .orderBy("slice")
    )


# -- per-language tokenizer fertility ------------------------------------------

_FERTILITY_DUCK = (
    _BPE_DUCK_CTES
    + f""",
    lw AS (
        SELECT lang, word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT lang,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY lang, word),
    seg AS (
        SELECT word,
               CAST(len(string_split(trim(repr), ' ')) AS BIGINT) AS ntok,
               CAST(length(word) AS BIGINT) AS nchr
        FROM w{_BPE_ROUNDS})
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_words,
           CAST(sum(c * nchr) AS BIGINT) AS char_tokens,
           CAST(sum(c * ntok) AS BIGINT) AS bpe_tokens,
           CAST(sum(c * ntok) * 1000000 // sum(c) AS BIGINT) AS fertility_ppm,
           CAST(sum(c * ntok) * 1000000 // sum(c * nchr) AS BIGINT)
               AS compression_ppm
    FROM lw JOIN seg USING (word)
    GROUP BY lang ORDER BY lang
    """
)


@q("tokenizer_fertility_by_lang", _FERTILITY_DUCK)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Per-language tokenizer fertility — the multilingual-tokenizer QC
    (how many subword tokens a word costs per language; a language whose
    fertility is far above the corpus mean is under-served by the learned
    vocabulary and its documents are effectively longer/more expensive to
    train on): the corpus-wide BPE vocabulary from the certified trainer
    (_bpe_train — same merge rounds bpe_vocab_induction pins) scores each
    language's word distribution; fertility = subword tokens per word and
    compression = tokens per character, both exact integer ppm.

    Scale shape: training is the certified vocab-sized loop; scoring
    joins the per-(lang, word) count table to the vocab on the word key —
    both sides are VOCABULARY-sized (distinct words), never corpus-sized;
    per-lang sums map-side combine to |langs| rows. Bodies never move."""
    words, _ = _bpe_train(spark, sf_dir)
    seg = words.select(
        "word",
        F.expr("CAST(size(split(trim(repr), ' ')) AS BIGINT)").alias("ntok"),
        F.length("word").cast("bigint").alias("nchr"),
    )
    docs = tbl(spark, sf_dir, "documents")
    lw = (
        docs.select(
            "lang", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    joined = lw.join(seg, "word")
    return (
        joined.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("nchr")).cast("bigint").alias("char_tokens"),
            F.sum(F.col("c") * F.col("ntok")).cast("bigint").alias("bpe_tokens"),
            F.expr("CAST(sum(c * ntok) * 1000000 div sum(c) AS BIGINT)").alias(
                "fertility_ppm"
            ),
            F.expr(
                "CAST(sum(c * ntok) * 1000000 div sum(c * nchr) AS BIGINT)"
            ).alias("compression_ppm"),
        )
        .orderBy("lang")
    )


@q(
    "char_entropy_quality",
    """
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(lower(text))),
                                   i -> lower(text)[i:i])) AS ch
      FROM documents
    ),
    hist AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
    terms AS (
      SELECT doc_id, c,
             CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 7)
                  AS DECIMAL(28,7)) AS term
      FROM hist
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_chars,
           CAST(count(*) AS INT) AS n_distinct_chars,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - CAST(sum(term) AS DOUBLE) / sum(c), 4) AS entropy_nats
    FROM terms GROUP BY 1
    """,
)
def char_entropy_quality(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic cheap
    gibberish / encoding-noise / low-diversity quality signal (binary blobs
    and base64 runs score near ln(alphabet); single-character spam scores
    near 0). H = ln(n) - (sum_i c_i ln c_i) / n over the per-document
    character histogram.

    Plan shape: the per-character explode is row-local and pipelined; the
    (doc_id, ch) histogram aggregate map-side combines each document to
    its ~alphabet-sized histogram BEFORE its exchange, and the per-doc
    reduction exchanges those histogram partials on doc_id — both shuffles
    move ~|alphabet| rows per document, never per character. Portability: each c*ln(c) term is
    rounded to 7 decimals and summed as DECIMAL (merge-order-exact, the
    lm_perplexity ln-parity discipline); the final entropy is one double
    expression over exact inputs, rounded at 4.
    """
    d = tbl(spark, sf_dir, "documents")
    # scan-width floor before the per-character explode (util.wide);
    # lower() hoisted out of the lambda so it runs once per doc, and the
    # char at i comes from a pre-split array instead of substring(,i,1)
    # — substring walks from the string head each call, making the old
    # per-doc cost quadratic in doc length; the values are identical.
    chars = wide(spark, d.select("doc_id", "text"), sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(split(lower(text), ''), c -> c != '')"
            )
        ).alias("ch"),
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    term = F.round(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")), 7
    ).cast("decimal(28,7)")
    return (
        hist.select("doc_id", "c", term.alias("term"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("int").alias("n_distinct_chars"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum("term").cast("double") / F.sum("c"),
                4,
            ).alias("entropy_nats"),
        )
    )


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


@q(
    "collocation_pmi",
    f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    big AS (
      SELECT g, string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
      FROM (SELECT unnest({_grams_sql("t", 2)}) AS g FROM toks)
    ),
    cxy AS (SELECT g, any_value(w1) AS w1, any_value(w2) AS w2,
                   count(*) AS pair_count
            FROM big GROUP BY g),
    cx  AS (SELECT w1, count(*) AS left_count  FROM big GROUP BY 1),
    cy  AS (SELECT w2, count(*) AS right_count FROM big GROUP BY 1),
    n   AS (SELECT count(*) AS n FROM big),
    scored AS (
      SELECT g AS gram,
             CAST(pair_count AS BIGINT)  AS pair_count,
             CAST(left_count AS BIGINT)  AS left_count,
             CAST(right_count AS BIGINT) AS right_count,
             CAST(round(ln(CAST(n AS DOUBLE) * CAST(pair_count AS DOUBLE)
                           / (CAST(left_count AS DOUBLE)
                              * CAST(right_count AS DOUBLE))), 7)
                  AS DECIMAL(18,7)) AS pmi_dec
      FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
      WHERE pair_count >= {_PMI_MIN_COUNT}
    )
    SELECT gram, pair_count, left_count, right_count,
           CAST(pmi_dec AS DOUBLE) AS pmi
    FROM scored
    ORDER BY pmi_dec DESC, gram LIMIT {_PMI_TOP_K}
    """,
)
def collocation_pmi(spark, sf_dir):
    """Collocation mining by pointwise mutual information: the corpus's
    top-{k} adjacent word pairs by PMI(x,y) = ln(N*c_xy / (c_x*c_y)), where
    c_x / c_y are positional (first-word / second-word) occurrence counts
    and N the total bigram count — the standard phrase-detection pass
    (Mikolov-style word2phrase) a pipeline runs before tokenizer training
    or phrase-aware dedup, with a min-support floor of {m} to keep the
    estimator out of its low-count noise regime.

    Plan shape: bigram extraction is a row-local explode; the three count
    tables shuffle grams/words (partial-agg map-side combine compresses to
    vocabulary-sized tables); PMI scoring joins the VOCABULARY-sized pair
    table to the two word tables (never back to the corpus), and the 1-row
    N aggregate broadcasts. The final cut is a TakeOrdered over the
    pair-vocabulary with a full-key (pmi, gram) deterministic tie-break.
    Portability: PMI's input is a single double expression over exact
    BIGINT counts with identical parenthesization on both engines, rounded
    at 7 (the lm_perplexity ln-parity discipline).
    """
    d = tbl(spark, sf_dir, "documents")
    # scan-width floor before the tokenize+gram explode (util.wide)
    toks = wide(spark, d.select("doc_id", "text"), sf_dir, "documents").select(
        "doc_id", F.expr(_NORM_TOKS_EXPR).alias("t")
    )
    big = toks.select(
        F.explode(F.expr(_grams_expr("t", 2))).alias("g")
    ).select(
        "g",
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    cxy = (
        big.groupBy("g")
        .agg(
            F.any_value("w1").alias("w1"),
            F.any_value("w2").alias("w2"),
            F.count(F.lit(1)).alias("pair_count"),
        )
        # vocabulary-sized state with four consumers (cx, cy, n, the
        # scored join): checkpoint so the corpus explode+aggregate runs
        # once (the BPE/kmeans small-state discipline)
        .localCheckpoint(eager=False)
    )
    # marginal counts and the total REAGGREGATE the vocabulary-sized gram
    # table instead of re-scanning the corpus: count of bigram instances
    # with left word w ≡ Σ pair_count over grams with that left word (the
    # r8 form ran the tokenize+explode pipeline four times — cxy, cx, cy,
    # n — each a separate corpus pass; 4 corpus-sized passes → 1)
    cx = cxy.groupBy("w1").agg(F.sum("pair_count").alias("left_count"))
    cy = cxy.groupBy("w2").agg(F.sum("pair_count").alias("right_count"))
    n = cxy.agg(F.sum("pair_count").alias("n"))
    pmi = F.round(
        F.log(
            F.col("n").cast("double")
            * F.col("pair_count").cast("double")
            / (F.col("left_count").cast("double") * F.col("right_count").cast("double"))
        ),
        7,
    ).cast("decimal(18,7)")
    return (
        cxy.where(F.col("pair_count") >= _PMI_MIN_COUNT)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("g").alias("gram"),
            F.col("pair_count").cast("bigint").alias("pair_count"),
            F.col("left_count").cast("bigint").alias("left_count"),
            F.col("right_count").cast("bigint").alias("right_count"),
            pmi.alias("pmi_dec"),
        )
        .orderBy(F.col("pmi_dec").desc(), "gram")
        .limit(_PMI_TOP_K)
        .select(
            "gram",
            "pair_count",
            "left_count",
            "right_count",
            F.col("pmi_dec").cast("double").alias("pmi"),
        )
    )


collocation_pmi.__doc__ = collocation_pmi.__doc__.format(
    k=_PMI_TOP_K, m=_PMI_MIN_COUNT
)


@q(
    "readability_score",
    """
    WITH m AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS t,
             len(regexp_extract_all(text, '[.!?]+')) + 1 AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS w,
             CAST(s AS BIGINT) AS s,
             CAST(vg + len(list_filter(t,
                 x -> NOT regexp_matches(x, '[aeiouy]'))) AS BIGINT) AS syl
      FROM m
    )
    SELECT doc_id,
           CAST(w AS INT)   AS n_words,
           CAST(s AS INT)   AS n_sentences,
           CAST(syl AS INT) AS n_syllables,
           CAST(floor(CAST(206835 * s * w - 1015 * w * w - 84600 * syl * s
                           AS DOUBLE) / (s * w)) AS BIGINT) AS flesch_milli
    FROM c
    """,
)
def readability_score(spark, sf_dir):
    """Flesch reading-ease readability per document, in exact milli-units:
    F = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words), with
    sentences approximated by terminal-punctuation runs (+1) and syllables
    by vowel-group counts (min 1 per word) — the standard cheap heuristics.
    A curation pipeline buckets on this to balance reading-level mix or to
    drop degenerate text (huge negative scores = run-on token soup).

    Pure projection — tokenize, two regexp_extract_all counts and one
    array-lambda filter per row, zero exchanges; scales with the scan.
    Portability: the score is computed over the common denominator s*w as
    floor(numerator/denominator) in one double division over exact BIGINT
    inputs — exact while |numerator| < 2^53, i.e. documents under ~3e6
    words (chunking upstream guarantees far less); floor() sidesteps the
    Spark-div-truncates vs DuckDB-//-floors divergence for the negative
    scores long word-soup documents produce.
    """
    d = tbl(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.expr(_NORM_TOKS_EXPR).alias("t"),
        (
            F.expr("size(regexp_extract_all(text, '[.!?]+', 0))") + F.lit(1)
        ).alias("s"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").alias(
            "vg"
        ),
    )
    c = m.select(
        "doc_id",
        F.size("t").cast("bigint").alias("w"),
        F.col("s").cast("bigint").alias("s"),
        (
            F.col("vg")
            + F.expr("size(filter(t, x -> NOT (x rlike '[aeiouy]')))")
        )
        .cast("bigint")
        .alias("syl"),
    )
    num = (
        F.lit(206835) * F.col("s") * F.col("w")
        - F.lit(1015) * F.col("w") * F.col("w")
        - F.lit(84600) * F.col("syl") * F.col("s")
    )
    return c.select(
        "doc_id",
        F.col("w").cast("int").alias("n_words"),
        F.col("s").cast("int").alias("n_sentences"),
        F.col("syl").cast("int").alias("n_syllables"),
        F.floor(num.cast("double") / (F.col("s") * F.col("w")))
        .cast("bigint")
        .alias("flesch_milli"),
    )


_HRW_K = 16  # baseline shard count; the resize audit adds one


def _hrw_list_sql(k: int) -> str:
    """DuckDB: the doc's HRW hash list over shards 0..k-1."""
    key = "CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)"
    return f"list_transform(range(0, {k}), s -> {HASH60.format(x=key)})"


def _hrw_list_expr(k: int) -> str:
    """Spark twin of :func:`_hrw_list_sql`."""
    return (
        f"transform(sequence(0, {k - 1}), s -> "
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
        "CAST(s AS STRING))), 1, 15), 16, 10) AS BIGINT))"
    )


@q(
    "rendezvous_shards",
    f"""
    WITH h AS (
      SELECT doc_id,
             {_hrw_list_sql(_HRW_K)} AS h16,
             {_hrw_list_sql(_HRW_K + 1)} AS h17
      FROM documents
    ),
    a AS (
      SELECT doc_id,
             CAST(list_position(h16, list_aggregate(h16, 'max')) - 1 AS INT)
                 AS shard,
             CAST(list_position(h17, list_aggregate(h17, 'max')) - 1 AS INT)
                 AS shard_resized
      FROM h
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN shard_resized <> shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST(sum(CASE WHEN shard_resized <> shard THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS moved_ppm
    FROM a GROUP BY 1
    """,
)
def rendezvous_shards(spark, sf_dir):
    """Rendezvous (highest-random-weight) consistent sharding with a
    resize-movement audit: every document goes to the shard whose
    (doc, shard) hash is highest; growing the fleet {k} -> {k1} moves
    ONLY the documents whose new shard wins the rendezvous — an expected
    1/{k1} of the corpus — where the mod-{k} assignment `train_shards`
    uses would reshuffle ~{frac}% of all documents. At 100 TB this is
    the difference between a rebalance that copies ~6% of the lake and
    one that copies ~94% of it; the audit quantifies exactly that, per
    shard.

    Plan shape: both assignments are row-local HOF folds over a
    {k}/{k1}-element hash list (pure projection — the corpus never
    shuffles); the audit is ONE groupBy on the {k}-value shard id,
    map-side combined. Portability: 60-bit md5 scores (the portable_hash60
    primitive), argmax as first-position-of-max on both engines — ties
    (cryptographically negligible) resolve identically. The HRW stability
    property is also what makes the assignment INCREMENTAL: a re-ingested
    document recomputes its shard from its id alone, no directory state.
    """
    d = tbl(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.expr(_hrw_list_expr(_HRW_K)).alias("h16"),
        F.expr(_hrw_list_expr(_HRW_K + 1)).alias("h17"),
    )
    a = h.select(
        "doc_id",
        (F.expr("array_position(h16, array_max(h16))") - 1)
        .cast("int")
        .alias("shard"),
        (F.expr("array_position(h17, array_max(h17))") - 1)
        .cast("int")
        .alias("shard_resized"),
    )
    moved = F.sum(
        F.when(F.col("shard_resized") != F.col("shard"), 1).otherwise(0)
    )
    return a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        moved.cast("bigint").alias("n_moved"),
        F.expr(
            "CAST(sum(CASE WHEN shard_resized <> shard THEN 1 ELSE 0 END)"
            " * 1000000 div count(*) AS BIGINT)"
        ).alias("moved_ppm"),
    )


rendezvous_shards.__doc__ = rendezvous_shards.__doc__.format(
    k=_HRW_K, k1=_HRW_K + 1, frac=round(100 * _HRW_K / (_HRW_K + 1))
)


_ZIPF_TOP = 100


@q(
    "zipf_slope",
    f"""
    WITH toks AS (SELECT {_NORM_TOKS_SQL} AS t FROM documents),
    counts AS (
      SELECT w, count(*) AS cnt
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ),
    top AS (
      SELECT w, cnt FROM counts ORDER BY cnt DESC, w LIMIT {_ZIPF_TOP}
    ),
    ranked AS (
      SELECT w, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, w) AS INT) AS rnk
      FROM top
    ),
    pts AS (
      SELECT w, cnt, rnk,
             CAST(round(ln(CAST(rnk AS DOUBLE)), 7) AS DECIMAL(18,7)) AS x,
             CAST(round(ln(CAST(cnt AS DOUBLE)), 7) AS DECIMAL(18,7)) AS y
      FROM ranked
    ),
    fit AS (
      SELECT CAST(count(*) AS DECIMAL(18,0)) AS k,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT p.rnk AS rank, p.w AS word, CAST(p.cnt AS BIGINT) AS cnt,
           round(CAST((f.k * f.sxy - f.sx * f.sy)
                      / (f.k * f.sxx - f.sx * f.sx) AS DOUBLE), 6)
               AS zipf_slope
    FROM pts p, fit f
    ORDER BY p.rnk
    """,
)
def zipf_slope(spark, sf_dir):
    """Zipf rank-frequency fit — the corpus-health twin of the Heaps'-law
    curve (`vocab_growth_curve`): the log-log least-squares slope over the
    top-{k} word ranks. Natural language sits near -1; a slope far above
    flags templated/boilerplate-heavy text (flat head), far below flags
    degenerate repetition (one token dominating). Curation pipelines
    track this per crawl snapshot as a drift alarm.

    Plan shape: ONE corpus-sized shuffle keyed on token strings (map-side
    combined word counts — the contamination_check topology), a
    TakeOrdered top-{k} cut, and a {k}-row post-limit window + closed-form
    fit (the vocab_growth_curve regression discipline: ln values rounded
    to 7 into DECIMAL sufficient statistics, merge-order-exact).
    """
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.expr(_NORM_TOKS_EXPR)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), "w").limit(_ZIPF_TOP)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("cnt").desc(), "w")).cast("int"),
    )
    pts = ranked.select(
        "w",
        "cnt",
        "rnk",
        F.round(F.log(F.col("rnk").cast("double")), 7)
        .cast("decimal(18,7)")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 7)
        .cast("decimal(18,7)")
        .alias("y"),
    )
    fit = F.broadcast(
        pts.agg(
            F.count(F.lit(1)).cast("decimal(18,0)").alias("k"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    slope = F.round(
        (
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).cast("double"),
        6,
    )
    return (
        pts.crossJoin(fit)
        .select(
            F.col("rnk").alias("rank"),
            F.col("w").alias("word"),
            F.col("cnt").cast("bigint").alias("cnt"),
            slope.alias("zipf_slope"),
        )
        .orderBy("rank")
    )


zipf_slope.__doc__ = zipf_slope.__doc__.format(k=_ZIPF_TOP)


_TSPLIT_BP = 8000  # train share of the time range, basis points


@q(
    "temporal_split_leakage",
    f"""
    WITH rng AS (
      SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi FROM events
    ),
    cut AS (
      SELECT lo + (hi - lo) * {_TSPLIT_BP} // 10000 AS c FROM rng
    ),
    tagged AS (
      SELECT user_id, epoch_us(ts) < (SELECT c FROM cut) AS is_train
      FROM events
    ),
    u AS (
      SELECT user_id,
             max(CASE WHEN is_train THEN 1 ELSE 0 END) AS in_train,
             max(CASE WHEN is_train THEN 0 ELSE 1 END) AS in_test
      FROM tagged GROUP BY 1
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM tagged WHERE is_train)
          AS n_train_events,
      (SELECT CAST(count(*) AS BIGINT) FROM tagged WHERE NOT is_train)
          AS n_test_events,
      CAST(sum(in_train) AS BIGINT) AS train_users,
      CAST(sum(in_test) AS BIGINT)  AS test_users,
      CAST(sum(in_train * in_test) AS BIGINT) AS leaked_users,
      CAST(sum(in_train * in_test) * 1000000
           // greatest(sum(in_test), 1) AS BIGINT) AS leakage_ppm
    FROM u
    """,
)
def temporal_split_leakage(spark, sf_dir):
    """Temporal train/test split with an identity-leakage audit: events
    before the 80%-of-time-range cutoff train, the rest test — and the
    audit counts users present on BOTH sides (for user-conditioned models
    that is target leakage: the model memorizes test users at train
    time). Releasing a temporal split without this number is the classic
    recommender-eval mistake; pipelines either accept it (cold-start-free
    eval) or re-split by user — the ppm says which regime you are in.

    Plan shape: the cutoff is a broadcast 1-row min/max aggregate in
    exact epoch-microsecond integers (no timestamp arithmetic
    divergence); tagging is a row-local comparison; the audit is one
    user-keyed aggregate (map-side combined to per-user flag pairs) plus
    a 1-row reduction. Event counts ride the same scan.
    """
    e = tbl(spark, sf_dir, "events")
    rng = F.broadcast(
        e.agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
        ).select(
            F.expr(f"lo + (hi - lo) * {_TSPLIT_BP} div 10000").alias("c")
        )
    )
    tagged = e.crossJoin(rng).select(
        "user_id", (F.unix_micros("ts") < F.col("c")).alias("is_train")
    )
    u = tagged.groupBy("user_id").agg(
        F.max(F.when(F.col("is_train"), 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("is_train"), 0).otherwise(1)).alias("in_test"),
    )
    ev = F.broadcast(
        tagged.agg(
            F.sum(F.when(F.col("is_train"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train_events"),
            F.sum(F.when(F.col("is_train"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_test_events"),
        )
    )
    return (
        u.agg(
            F.sum("in_train").cast("bigint").alias("train_users"),
            F.sum("in_test").cast("bigint").alias("test_users"),
            F.sum(F.col("in_train") * F.col("in_test"))
            .cast("bigint")
            .alias("leaked_users"),
            F.expr(
                "CAST(sum(in_train * in_test) * 1000000"
                " div greatest(sum(in_test), 1) AS BIGINT)"
            ).alias("leakage_ppm"),
        )
        .crossJoin(ev)
        .select(
            "n_train_events",
            "n_test_events",
            "train_users",
            "test_users",
            "leaked_users",
            "leakage_ppm",
        )
    )


_IPF_ROUNDS = 3


def _ipf_round_duck(r: int) -> str:
    """One IPF round (row fit then column fit) as DuckDB CTEs."""
    prev = f"w{r - 1}"
    return f"""
    rs{r} AS (SELECT lang, sum(w) AS s FROM {prev} GROUP BY 1),
    rf{r} AS (SELECT lang,
                     CAST((SELECT tr FROM tgt)::HUGEINT * 1000000000 // s
                          AS BIGINT) AS f
              FROM rs{r}),
    wa{r} AS (SELECT p.lang, p.source, p.n,
                     CAST(p.w::HUGEINT * rf{r}.f // 1000000000 AS BIGINT) AS w
              FROM {prev} p JOIN rf{r} USING (lang)),
    cs{r} AS (SELECT source, sum(w) AS s FROM wa{r} GROUP BY 1),
    cf{r} AS (SELECT source,
                     CAST((SELECT tc FROM tgt)::HUGEINT * 1000000000 // s
                          AS BIGINT) AS f
              FROM cs{r}),
    w{r} AS (SELECT p.lang, p.source, p.n,
                    CAST(p.w::HUGEINT * cf{r}.f // 1000000000 AS BIGINT) AS w
             FROM wa{r} p JOIN cf{r} USING (source))"""


_IPF_DUCK = (
    """
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) * 1000000 AS t,
                   count(DISTINCT lang) AS nr,
                   count(DISTINCT source) AS nc
            FROM cells),
    tgt AS (SELECT t // nr AS tr, t // nc AS tc FROM tot),
    w0 AS (SELECT lang, source, n, n * 1000000 AS w FROM cells),"""
    + ",".join(_ipf_round_duck(r) for r in range(1, _IPF_ROUNDS + 1))
    + f"""
    SELECT lang, source, n AS n_docs,
           CAST(w AS BIGINT) AS weight_micro,
           CAST(w // n AS BIGINT) AS factor_ppm
    FROM w{_IPF_ROUNDS}
    """
)


@q("ipf_raking", _IPF_DUCK)
def ipf_raking(spark, sf_dir):
    """Iterative proportional fitting (raking) of the corpus mixture —
    the survey-statistics algorithm a data pipeline uses to reweight a
    (language x source) contingency table toward target marginals
    (uniform here) without destroying the observed interaction structure:
    alternately scale rows then columns to hit their targets, {r} rounds.
    The output weight per cell is the resampling rate that makes the
    training mix match the target language AND source shares
    simultaneously — the principled version of per-axis rebalancing
    (`rebalance_domains` fixes one axis; raking fixes both).

    A SIXTH iterative mechanism class (after frontier-BFS, relaxation-
    SSSP, fixed-point PageRank, subgraph-peeling k-core, and vocab-state
    BPE): the loop state is the MARGINAL SCALING FACTOR vectors — the
    corpus appears only in the initial contingency aggregate (the one
    corpus-sized, map-side-combined shuffle); every round operates on the
    |langs| x |sources| cell table with broadcast factor joins, so 100x
    data changes only the first aggregate's scan. Portability: weights
    live in integer micro-units, factors in exact ppb via the KMV
    DECIMAL(38,0)-div ≡ HUGEINT-// idiom — every round is bit-identical
    across engines and merge orders (the pagerank integer-arithmetic
    discipline).
    """
    d = tbl(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tgt = F.broadcast(
        cells.agg(
            (F.sum("n").cast("bigint") * 1000000).alias("t"),
            F.countDistinct("lang").alias("nr"),
            F.countDistinct("source").alias("nc"),
        ).select(
            F.expr("t div nr").alias("tr"), F.expr("t div nc").alias("tc")
        )
    )
    w = cells.select(
        "lang", "source", "n", (F.col("n") * 1000000).alias("w")
    )
    for _ in range(_IPF_ROUNDS):
        for axis, t_col in (("lang", "tr"), ("source", "tc")):
            s = w.groupBy(axis).agg(F.sum("w").alias("s"))
            f_ = s.crossJoin(tgt).select(
                axis,
                F.expr(
                    f"CAST(CAST({t_col} AS DECIMAL(38,0)) * 1000000000"
                    " div s AS BIGINT)"
                ).alias("f"),
            )
            w = (
                w.join(F.broadcast(f_), axis)
                .select(
                    "lang",
                    "source",
                    "n",
                    F.expr(
                        "CAST(CAST(w AS DECIMAL(38,0)) * f div 1000000000"
                        " AS BIGINT)"
                    ).alias("w"),
                )
                # each step references w TWICE (marginal sum + factor
                # join), so without truncation the logical plan doubles
                # per half-round — 2^6 copies of the contingency
                # aggregate by round 3, all planning cost. The state is
                # |langs| x |sources| cells: checkpointing it per step
                # is the BPE/kmeans small-state discipline (guide §3.3:
                # materialize to truncate a growing plan).
                .localCheckpoint(eager=False)
            )
    return w.select(
        "lang",
        "source",
        F.col("n").alias("n_docs"),
        F.col("w").alias("weight_micro"),
        F.expr("CAST(w div n AS BIGINT)").alias("factor_ppm"),
    )


ipf_raking.__doc__ = ipf_raking.__doc__.format(r=_IPF_ROUNDS)


@q(
    "loo_source_influence",
    f"""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_NORM_TOKS_SQL})) AS BIGINT) AS toks
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
                   CAST(sum(toks) AS BIGINT) AS tt FROM per)
    SELECT source, n_docs,
           CAST(tt * 1000 // nn AS BIGINT) AS mean_with_milli,
           CASE WHEN nn > n_docs
                THEN CAST((tt - toks) * 1000 // (nn - n_docs) AS BIGINT)
                END AS mean_without_milli,
           CASE WHEN nn > n_docs
                THEN CAST((tt - toks) * 1000 // (nn - n_docs)
                          - tt * 1000 // nn AS BIGINT)
                END AS influence_milli
    FROM per CROSS JOIN tot
    """,
)
def loo_source_influence(spark, sf_dir):
    """Leave-one-group-out source influence — the cheapest honest data-
    valuation primitive: for each source, how the corpus mean document
    length (exact milli-tokens) moves when that source is EXCLUDED.
    Negative influence = the source drags the metric down (its docs are
    longer than average, so removing it lowers the mean... sign reads
    directly); pipelines rank sources by |influence| before spending on
    per-source quality review. Unlike retrain-based Shapley this is
    closed-form: for a mean, leave-one-out = (T - t_s)/(N - n_s), so ONE
    corpus scan prices every source simultaneously.

    Plan shape: one map-side-combined groupBy(source) carrying (count,
    token-sum) partials, a broadcast 1-row total, and row-local exact
    integer arithmetic (positive divisions truncate identically on both
    engines; the final difference may be negative but is a SUBTRACTION of
    already-truncated terms, not a division). The single-source corpus
    degenerates to NULL rather than a divide-by-zero.
    """
    d = tbl(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"size({_NORM_TOKS_EXPR})"))
        .cast("bigint")
        .alias("toks"),
    )
    tot = F.broadcast(
        per.agg(
            F.sum("n_docs").cast("bigint").alias("nn"),
            F.sum("toks").cast("bigint").alias("tt"),
        )
    )
    without = F.expr("CAST((tt - toks) * 1000 div (nn - n_docs) AS BIGINT)")
    with_ = F.expr("CAST(tt * 1000 div nn AS BIGINT)")
    return per.crossJoin(tot).select(
        "source",
        "n_docs",
        with_.alias("mean_with_milli"),
        F.when(F.col("nn") > F.col("n_docs"), without).alias(
            "mean_without_milli"
        ),
        F.when(F.col("nn") > F.col("n_docs"), without - with_)
        .cast("bigint")
        .alias("influence_milli"),
    )


@q(
    "quantile_normalize_sources",
    """
    WITH cells AS (
      SELECT source, n_chars AS v, count(*) AS cnt
      FROM documents GROUP BY 1, 2
    ),
    ns AS (SELECT source, sum(cnt) AS n_s FROM cells GROUP BY 1),
    sc AS (
      SELECT source, v, cnt,
             COALESCE(sum(cnt) OVER (PARTITION BY source ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM cells
    ),
    bp AS (
      SELECT sc.source, sc.v, sc.cnt,
             CAST((2 * cb + cnt + 1) * 10000 // (2 * n_s) AS BIGINT)
                 AS pct_bp
      FROM sc JOIN ns USING (source)
    ),
    g AS (SELECT v, sum(cnt) AS gcnt FROM cells GROUP BY 1),
    gc AS (
      SELECT v AS nv,
             COALESCE(sum(gcnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
                 AS start
      FROM g
    ),
    tot AS (SELECT sum(cnt) AS n FROM cells),
    probes AS (
      SELECT source, v, cnt, pct_bp,
             greatest(pct_bp * (SELECT n FROM tot) // 10000, 1) AS k
      FROM bp
    )
    SELECT p.source, CAST(p.v AS BIGINT) AS raw_value,
           CAST(p.cnt AS BIGINT) AS n_docs,
           p.pct_bp AS source_pct_bp,
           CAST(gc.nv AS BIGINT) AS normalized_value
    FROM probes p ASOF JOIN gc ON p.k >= gc.start
    """,
)
def quantile_normalize_sources(spark, sf_dir):
    """Equi-percentile (quantile-matching) normalization of a per-source
    score onto the corpus-wide distribution — the calibration step a
    pipeline runs when per-source quality scores are not comparable
    (each source's scorer has its own scale): a document at the p-th
    percentile WITHIN its source maps to the global value at that same
    percentile. Here the score is document length (n_chars); the recipe
    is score-agnostic. Mid-rank percentiles in exact basis points keep
    tied values at one deterministic percentile.

    Plan shape: everything happens on DOMAIN-sized tables, never per
    document — one map-side-combined (source, value) cell aggregate is
    the only corpus-sized shuffle; within-source and global cumulative
    counts are windows over value-domain-sized frames; the percentile →
    global-value lookup is the union-trick as-of join (no join node) on
    the global cum table. At 100 TB the value domain (distinct score
    values), not the corpus, bounds every post-scan stage. The oracle
    states the lookup as DuckDB's native ASOF JOIN — two algorithms,
    one answer (the asof_join_events precedent).
    """
    from pyspark.sql import Window as W

    from bridgedownstream_spark.operators.asof import asof_join

    d = tbl(spark, sf_dir, "documents")
    cells = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ns = cells.groupBy("source").agg(F.sum("cnt").alias("n_s"))
    wsrc = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sc = cells.select(
        "source",
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wsrc), F.lit(0)).alias("cb"),
    )
    bp = sc.join(F.broadcast(ns), "source").select(
        "source",
        "v",
        "cnt",
        F.expr(
            "CAST((2 * cb + cnt + 1) * 10000 div (2 * n_s) AS BIGINT)"
        ).alias("pct_bp"),
    )
    g = cells.groupBy("v").agg(F.sum("cnt").alias("gcnt"))
    wg = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    gc = g.select(
        F.col("v").alias("nv"),
        (F.coalesce(F.sum("gcnt").over(wg), F.lit(0)) + 1).alias("start"),
        F.lit(1).alias("one"),
    )
    tot = F.broadcast(cells.agg(F.sum("cnt").alias("n")))
    probes = bp.crossJoin(tot).select(
        "source",
        "v",
        "cnt",
        "pct_bp",
        F.greatest(
            F.expr("pct_bp * n div 10000"), F.lit(1).cast("bigint")
        ).alias("k"),
        F.lit(1).alias("one"),
    )
    joined = asof_join(
        probes,
        gc,
        ["one"],
        "k",
        "start",
        ["nv"],
        prefix="g_",
    )
    return joined.select(
        "source",
        F.col("v").cast("bigint").alias("raw_value"),
        F.col("cnt").cast("bigint").alias("n_docs"),
        F.col("pct_bp").alias("source_pct_bp"),
        F.col("g_nv").cast("bigint").alias("normalized_value"),
    )


# -- end-to-end curation pipeline composition --------------------------------

_CURATION_E2E_DUCK = f"""
    WITH base AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 AS fingerprint,
             CASE WHEN (length(text) BETWEEN 50 AND 5000
                        AND len(string_split(trim(text), ' ')) >= 10)
                   AND (10000 * length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                        <= 2000 * greatest(length(text), 1))
                  THEN 1 ELSE 0 END AS passes,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    dd AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM base) WHERE rn = 1
    ),
    q AS (SELECT doc_id, source, n_tokens FROM dd WHERE passes = 1),
    c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
    m AS (SELECT min(n) AS mn FROM c),
    r AS (SELECT source,
                 CAST((CAST(mn AS DECIMAL(38,0)) * 1000000000) // n
                      AS BIGINT) AS rate_ppb
          FROM c, m),
    reb AS (
      SELECT q.* FROM q JOIN r USING (source)
      WHERE {HASH60.format(x="CAST(doc_id AS VARCHAR)")} % 1000000000
            < r.rate_ppb
    ),
    sp AS (
      SELECT *, CASE WHEN g < 800000000 THEN 'train'
                     WHEN g < 900000000 THEN 'val'
                     ELSE 'test' END AS split
      FROM (SELECT *,
                   {HASH60.format(x="CAST(doc_id AS VARCHAR) || ':split-v1'")}
                       % 1000000000 AS g
            FROM reb)
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM sp GROUP BY 1, 2 ORDER BY 1, 2
"""


@q("curation_pipeline_e2e", _CURATION_E2E_DUCK)
def curation_pipeline_e2e(spark, sf_dir):
    """End-to-end curation pipeline in ONE lineage — ingest → exact
    dedup → quality gate → domain rebalance → train/val/test split —
    certifying that the building blocks COMPOSE, not just run solo (the
    workflow_e2e_equiv pattern applied to the LLM side, VERDICT r8 #8a).
    Stages reuse the certified pieces verbatim: the exact_dedup
    fingerprint (md5 of normalized text, keep lowest doc_id), the
    curation_funnel length+punct gates, the rebalance_domains
    uniform-at-minority ppb gate, and split_assign's md5 seed gate. The
    oracle recomputes the ENTIRE composition in SQL, and `id_sum` (exact
    BIGINT sum of surviving doc_ids per cell) certifies the precise
    surviving row SET, not just counts.

    Plan/scale: quality predicates, token counts, and the fingerprint
    are projected inside the scan stage and the BODY IS DROPPED before
    the first shuffle — the dedup window moves ~60-byte rows keyed on
    the 128-bit digest (the exact_dedup wire discipline). Rebalance
    rates are a domain-cardinality broadcast; the split gate is a narrow
    projection; the only other exchange is the final (split, source)
    aggregate. One body scan, two skinny shuffles, at any corpus size.
    """
    from pyspark.sql import Window as W

    from bridgedownstream_spark.operators.sampling import (
        rebalance_domains as _rebalance,
        split_assign,
    )

    d = tbl(spark, sf_dir, "documents")
    toks_len = F.size(F.split(F.trim(F.col("text")), " "))
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    passes = (
        F.length("text").between(50, 5000)
        & (toks_len >= 10)
        & ((punct * 10000) <= (F.greatest(F.length("text"), F.lit(1)) * 2000))
    )
    base = d.select(
        "doc_id",
        "source",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))).alias(
            "fingerprint"
        ),
        passes.alias("passes"),
        toks_len.cast("long").alias("n_tokens"),
    )
    wfp = W.partitionBy("fingerprint").orderBy("doc_id")
    dd = (
        base.withColumn("rn", F.row_number().over(wfp))
        .where(F.col("rn") == 1)
        .drop("rn", "fingerprint")
    )
    q_docs = dd.where(F.col("passes")).select("doc_id", "source", "n_tokens")
    reb = _rebalance(q_docs, "source", "doc_id")
    sp = split_assign(reb, "doc_id")
    return (
        sp.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("split", "source")
    )


# -- exact substring dedup (sliding-window fingerprints) ----------------------

_XSUB_W = 16  # tokens per sliding fingerprint window


_XSUB_DUCK = f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    win AS (
      SELECT doc_id, s,
             md5(array_to_string(t[s:s+{_XSUB_W - 1}], ' ')) AS g
      FROM (SELECT doc_id, t,
                   unnest(generate_series(
                       1, greatest(len(t) - {_XSUB_W - 1}, 0))) AS s
            FROM toks)
    ),
    fl AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, s,
               min(doc_id) OVER (PARTITION BY g) AS mn,
               max(doc_id) OVER (PARTITION BY g) AS mx
        FROM win) WHERE mn <> mx
    ),
    cov AS (
      SELECT doc_id,
             least({_XSUB_W},
                   COALESCE(lead(s) OVER (PARTITION BY doc_id ORDER BY s) - s,
                            {_XSUB_W})) AS c
      FROM fl
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(c) AS BIGINT) AS dup_tokens
      FROM cov GROUP BY 1
    )
    SELECT toks.doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(greatest(len(t) - {_XSUB_W - 1}, 0) AS BIGINT) AS n_windows,
           COALESCE(a.n_dup_windows, 0) AS n_dup_windows,
           COALESCE(a.dup_tokens, 0) AS dup_tokens,
           CAST(COALESCE(a.dup_tokens, 0) * 1000000
                // greatest(len(t), 1) AS BIGINT) AS dup_ppm
    FROM toks LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
"""


@q("exact_substring_dedup", _XSUB_DUCK)
def exact_substring_dedup(spark, sf_dir):
    """Exact substring-level duplication audit (the ExactSubstr
    complement to `segment_dedup`/`duplicate_spans`, VERDICT r8 #8b):
    every {w}-token SLIDING window (stride 1 — alignment-free, unlike
    segment_dedup's fixed grid) is fingerprinted; a window duplicated
    across >= 2 DISTINCT documents marks its span, and per document the
    audit reports the exact token coverage of the UNION of marked spans
    (the mass an ExactSubstr-style cut pass would remove) plus the
    ppm share. Fixed-length spans sorted by start make the interval
    union a closed form: each marked start contributes
    min(W, next_start - start).

    Scale shape: the stride-1 explode is an honest xW row blowup of
    TOKEN positions carrying (doc_id, pos, 32-byte md5) — never document
    bodies (the real ExactSubstr builds a suffix array; this is its
    bucketed-gram formulation at W-token resolution, the standard
    distributed compromise). Cross-doc flagging is ONE exchange keyed on
    the gram hash (window min/max-doc — groups are duplicate sets,
    bounded); span-merge + per-doc totals share ONE doc_id exchange.
    Never all-pairs: duplicated grams join nothing, they just mark.
    """
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_NORM_TOKS_EXPR).alias("t"))
    win = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) >= {_XSUB_W} "
                f"THEN sequence(1, size(t) - {_XSUB_W - 1}) "
                f"ELSE array() END"
            )
        ).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.expr(f"md5(array_join(slice(t, s, {_XSUB_W}), ' '))").alias("g"),
    )
    wg = W.partitionBy("g")
    fl = (
        win.withColumn("mn", F.min("doc_id").over(wg))
        .withColumn("mx", F.max("doc_id").over(wg))
        .where(F.col("mn") != F.col("mx"))
        .select("doc_id", "s")
    )
    wd = W.partitionBy("doc_id").orderBy("s")
    cov = fl.select(
        "doc_id",
        F.least(
            F.lit(_XSUB_W),
            F.coalesce(
                F.lead("s").over(wd) - F.col("s"), F.lit(_XSUB_W)
            ),
        ).alias("c"),
    )
    agg = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"),
        F.sum("c").cast("bigint").alias("dup_tokens"),
    )
    nd = toks.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.greatest(F.size("t") - (_XSUB_W - 1), F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
    )
    return (
        nd.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000"
                " div greatest(n_tokens, 1) AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


exact_substring_dedup.__doc__ = exact_substring_dedup.__doc__.format(w=_XSUB_W)


# -- vocabulary coverage estimation (Chao1 / Good-Turing) ---------------------

_CHAO1_DUCK = f"""
    WITH toks AS (SELECT {_NORM_TOKS_SQL} AS t FROM documents),
    tc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
    ),
    fof AS (SELECT c, CAST(count(*) AS BIGINT) AS f FROM tc GROUP BY 1),
    s AS (
      SELECT CAST(sum(f) AS BIGINT) AS v,
             CAST(sum(c * f) AS BIGINT) AS n,
             CAST(COALESCE(sum(CASE WHEN c = 1 THEN f END), 0) AS BIGINT) AS f1,
             CAST(COALESCE(sum(CASE WHEN c = 2 THEN f END), 0) AS BIGINT) AS f2
      FROM fof
    )
    SELECT v AS vocab_size, n AS total_tokens, f1 AS n_hapax, f2 AS n_dis,
           CAST(v + f1::HUGEINT * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT)
               AS chao1_est,
           CAST(f1::HUGEINT * 1000000 // greatest(n, 1) AS BIGINT)
               AS unseen_mass_ppm,
           CAST(f1::HUGEINT * 1000000 // greatest(v, 1) AS BIGINT)
               AS hapax_ppm
    FROM s
"""


@q("chao1_vocab_richness", _CHAO1_DUCK)
def chao1_vocab_richness(spark, sf_dir):
    """Vocabulary coverage estimation — the "how much unseen vocabulary
    is left" audit a tokenizer/data-mix team runs before freezing a
    vocab: Chao1 richness (bias-corrected: V + f1(f1-1)/(2(f2+1)))
    estimates TOTAL vocabulary including never-seen types from the
    singleton/doubleton counts, and the Good-Turing mass f1/N estimates
    the probability the NEXT token is a new type (in exact ppm), plus
    the hapax share of the observed vocabulary. Complements
    `vocab_growth_curve` (Heaps' law fits the trajectory; Chao1 bounds
    the asymptote) — a NEW coverage-estimation family.

    Plan/scale: one corpus-sized token explode feeding a map-side
    combined vocabulary-sized count (the zipf_slope wire), then the
    frequency-of-frequencies table (at most ~sqrt(2N) distinct counts —
    tiny), then a 1-row exact HUGEINT/DECIMAL(38,0) reduction. No
    sorts, no windows, nothing corpus-sized after the first aggregate.
    """
    d = tbl(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.expr(_NORM_TOKS_EXPR)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    fof = tc.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    s = fof.agg(
        F.sum("f").cast("bigint").alias("v"),
        F.sum(F.col("c") * F.col("f")).cast("bigint").alias("n"),
        F.coalesce(F.sum(F.when(F.col("c") == 1, F.col("f"))), F.lit(0))
        .cast("bigint")
        .alias("f1"),
        F.coalesce(F.sum(F.when(F.col("c") == 2, F.col("f"))), F.lit(0))
        .cast("bigint")
        .alias("f2"),
    )
    return s.select(
        F.col("v").alias("vocab_size"),
        F.col("n").alias("total_tokens"),
        F.col("f1").alias("n_hapax"),
        F.col("f2").alias("n_dis"),
        F.expr(
            "CAST(v + CAST(f1 AS DECIMAL(38,0)) * (f1 - 1)"
            " div (2 * (f2 + 1)) AS BIGINT)"
        ).alias("chao1_est"),
        F.expr(
            "CAST(CAST(f1 AS DECIMAL(38,0)) * 1000000"
            " div greatest(n, 1) AS BIGINT)"
        ).alias("unseen_mass_ppm"),
        F.expr(
            "CAST(CAST(f1 AS DECIMAL(38,0)) * 1000000"
            " div greatest(v, 1) AS BIGINT)"
        ).alias("hapax_ppm"),
    )


# -- split decontamination audit ----------------------------------------------

_SPLIT_CONTAM_DUCK = f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    sp AS (
      SELECT doc_id, t,
             CASE WHEN g < 800000000 THEN 'train'
                  WHEN g < 900000000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, t,
                   {HASH60.format(x="CAST(doc_id AS VARCHAR) || ':split-v1'")}
                       % 1000000000 AS g
            FROM toks)
    ),
    grams AS (
      SELECT doc_id, split, unnest(list_distinct({_grams_sql("t", 8)})) AS g8
      FROM sp
    ),
    tr AS (SELECT DISTINCT g8 FROM grams WHERE split = 'train'),
    te AS (SELECT doc_id, g8 FROM grams WHERE split = 'test'),
    j AS (
      SELECT te.doc_id, CAST(count(*) AS BIGINT) AS n_g,
             CAST(count(tr.g8) AS BIGINT) AS n_hit
      FROM te LEFT JOIN tr USING (g8) GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test_docs,
           CAST(COALESCE(sum(n_g), 0) AS BIGINT) AS n_test_grams,
           CAST(COALESCE(sum(n_hit), 0) AS BIGINT) AS n_contaminated_grams,
           CAST(COALESCE(count(CASE WHEN n_hit > 0 THEN 1 END), 0) AS BIGINT)
               AS n_contaminated_docs,
           CAST(COALESCE(sum(n_hit), 0) * 1000000
                // greatest(COALESCE(sum(n_g), 0), 1) AS BIGINT)
               AS gram_contamination_ppm,
           CAST(COALESCE(count(CASE WHEN n_hit > 0 THEN 1 END), 0) * 1000000
                // greatest(count(*), 1) AS BIGINT)
               AS doc_contamination_ppm
    FROM j
"""


@q("split_contamination", _SPLIT_CONTAM_DUCK)
def split_contamination(spark, sf_dir):
    """Decontamination audit of the train/test split ITSELF: distinct
    8-grams of every TEST document checked against the train split's
    gram set (the GPT-3 appendix-C pass, but pointed at the certified
    md5 split instead of an external benchmark — `contamination_check`
    audits eval suites; THIS audits the randomized split, which near-dup
    documents contaminate by construction). Reports corpus-level gram
    and document contamination in exact ppm — the number a curation
    pipeline must publish before trusting held-out loss.

    Plan/scale: gram sets are per-doc DISTINCT'd before anything wide
    (the contamination_check wire rule); the train side reduces to
    DISTINCT grams; the join key is the gram string and both sides stay
    gram-sized — bodies never shuffle, and the train side carries no
    broadcast hint (it is data-proportional; AQE decides).
    """
    from bridgedownstream_spark.operators.sampling import split_assign

    d = tbl(spark, sf_dir, "documents")
    # widen BEFORE the tokenize (scan-width floor; no-op at cluster scale)
    toks = split_assign(
        wide(spark, d.select("doc_id", "text"), sf_dir, "documents").select(
            "doc_id", F.expr(_NORM_TOKS_EXPR).alias("t")
        ),
        "doc_id",
    )
    grams = toks.select(
        "doc_id",
        "split",
        F.explode(F.array_distinct(F.expr(_grams_expr("t", 8)))).alias("g8"),
    )
    tr = grams.where(F.col("split") == "train").select("g8").distinct()
    te = grams.where(F.col("split") == "test").select("doc_id", "g8")
    j = (
        te.join(tr.withColumnRenamed("g8", "tg"), te.g8 == F.col("tg"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.count("tg").cast("bigint").alias("n_hit"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_docs"),
        F.coalesce(F.sum("n_g"), F.lit(0)).cast("bigint").alias("n_test_grams"),
        F.coalesce(F.sum("n_hit"), F.lit(0))
        .cast("bigint")
        .alias("n_contaminated_grams"),
        F.coalesce(F.count(F.when(F.col("n_hit") > 0, 1)), F.lit(0))
        .cast("bigint")
        .alias("n_contaminated_docs"),
        F.expr(
            "CAST(coalesce(sum(n_hit), 0) * 1000000"
            " div greatest(coalesce(sum(n_g), 0), 1) AS BIGINT)"
        ).alias("gram_contamination_ppm"),
        F.expr(
            "CAST(coalesce(count(CASE WHEN n_hit > 0 THEN 1 END), 0)"
            " * 1000000 div greatest(count(1), 1) AS BIGINT)"
        ).alias("doc_contamination_ppm"),
    )


# -- corpus novelty curve ------------------------------------------------------

_NOVELTY_BUCKETS = 10


_NOVELTY_DUCK = f"""
    WITH toks AS (SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest(list_distinct({_grams_sql("t", 8)})) AS g
      FROM toks
    ),
    fl AS (
      SELECT doc_id,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY g)
                  THEN 1 ELSE 0 END AS is_new
      FROM grams
    ),
    mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS m FROM toks),
    b AS (
      SELECT least(CAST(doc_id * {_NOVELTY_BUCKETS} // (m + 1) AS INT),
                   {_NOVELTY_BUCKETS - 1}) AS bucket,
             is_new
      FROM fl CROSS JOIN mx
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(is_new) AS BIGINT) AS n_new_grams,
           CAST(sum(is_new) * 1000000 // greatest(count(*), 1) AS BIGINT)
               AS novelty_ppm
    FROM b GROUP BY 1 ORDER BY 1
"""


@q("gram_novelty_curve", _NOVELTY_DUCK)
def gram_novelty_curve(spark, sf_dir):
    """Corpus novelty curve — the "is new data still adding anything"
    audit (the marginal-utility companion to `chao1_vocab_richness`'s
    asymptote and `vocab_growth_curve`'s trajectory): docs are ordered
    by doc_id (= ingestion order in this corpus), each distinct 8-gram
    is NEW only in the first document containing it, and the corpus is
    cut into {b} ingestion-order buckets reporting the fraction of their
    gram mass that is first-seen (exact ppm). A flattening curve means
    additional crawl batches mostly repeat the corpus — the signal that
    triggers source re-weighting.

    Plan/scale: per-doc DISTINCT'd grams (the contamination_check wire
    rule — bodies never shuffle); first-seen is ONE exchange keyed on
    the gram (an unordered min window over duplicate-set-sized groups,
    the exact_substring_dedup discipline); the bucket cut is a
    broadcast 1-row max and the curve map-side combines to {b} rows."""
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    # widen BEFORE the tokenize/explode: the 8-gram build is the query's
    # only heavy map stage and otherwise runs at the scan's row-group
    # width (1 task on the local corpus); no-op at cluster layouts
    toks = wide(spark, d.select("doc_id", "text"), sf_dir, "documents").select(
        "doc_id", F.expr(_NORM_TOKS_EXPR).alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_grams_expr("t", 8)))).alias("g"),
    )
    fl = grams.select(
        "doc_id",
        F.when(
            F.col("doc_id") == F.min("doc_id").over(W.partitionBy("g")), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # max over the NARROW scan, not the widened token frame — pruning
    # keeps this side one footer-cheap column read with no exchange
    mx = F.broadcast(d.agg(F.max("doc_id").cast("bigint").alias("m")))
    b = fl.crossJoin(mx).select(
        F.least(
            F.expr(f"CAST(doc_id * {_NOVELTY_BUCKETS} div (m + 1) AS INT)"),
            F.lit(_NOVELTY_BUCKETS - 1),
        ).alias("bucket"),
        "is_new",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("is_new").cast("bigint").alias("n_new_grams"),
        )
        .select(
            "bucket",
            "n_grams",
            "n_new_grams",
            F.expr(
                "CAST(n_new_grams * 1000000"
                " div greatest(n_grams, 1) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("bucket")
    )


gram_novelty_curve.__doc__ = gram_novelty_curve.__doc__.format(
    b=_NOVELTY_BUCKETS
)
