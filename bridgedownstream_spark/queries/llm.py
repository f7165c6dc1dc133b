"""LLM-training-data pipeline operators over the ``documents`` and
``embeddings`` tables: dedup, text analysis, fingerprinting.

These go beyond the reference's own surface (BASELINE.json north star): the
operations a 100 TB training-data pipeline needs, built on the same engine.
All text math uses only engine-portable primitives (md5, regex, array
lambdas) so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bridgedownstream_spark.queries.util import HASH60, tbl, wide

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


# Normalization used by dedup/fingerprint: lowercase + collapse whitespace.
_NORM_SPARK = lambda c: F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))  # noqa: E731
_NORM_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


@q(
    "exact_dedup",
    f"""
    SELECT md5({_NORM_SQL.format(c="text")}) AS fingerprint,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized text, keep lowest doc_id.

    Scale path: the groupBy key is the 128-bit digest, not the document body,
    so the shuffle moves ~32 bytes/row regardless of document size.
    """
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_NORM_SPARK(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@q(
    "incremental_dedup",
    f"""
    WITH corpus AS (
        SELECT DISTINCT md5({_NORM_SQL.format(c="text")}) AS fp
        FROM documents WHERE doc_id % 5 <> 0
    ),
    batch AS (
        SELECT doc_id, md5({_NORM_SQL.format(c="text")}) AS fp
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id, md5({_NORM_SQL.format(c="text")}) AS fp
        FROM documents WHERE doc_id % 35 = 7
    )
    SELECT b.doc_id, b.fp AS fingerprint
    FROM batch b ANTI JOIN corpus c ON b.fp = c.fp
    """,
)
def incremental_dedup(spark, sf_dir):
    """Cross-batch dedup: admit only new-batch documents whose fingerprint
    is absent from the already-ingested corpus — the bookmark-style dedup
    every recurring crawl needs.

    The fixture models a re-crawl: 'corpus' = docs with id % 5 ≠ 0;
    the incoming batch = the genuinely new docs (id % 5 = 0) UNION the
    re-crawled corpus docs (id % 35 = 7 — always ∈ corpus, never ∈ new).
    The anti-join must pass the new docs and reject every replay, so the
    rejection path is exercised at any scale factor.

    Scale path: the corpus side is the persisted fingerprint table
    (32 bytes/doc, not bodies), the batch hashes in-flight, and the
    anti-join shuffles digests only."""
    d = tbl(spark, sf_dir, "documents")
    fp = F.md5(_NORM_SPARK(F.col("text"))).alias("fp")
    corpus = d.where(F.col("doc_id") % 5 != 0).select(fp).distinct()
    batch = (
        d.where(F.col("doc_id") % 5 == 0)
        .select("doc_id", fp)
        .unionAll(d.where(F.col("doc_id") % 35 == 7).select("doc_id", fp))
    )
    return (
        batch.join(corpus, "fp", "left_anti")
        .select("doc_id", F.col("fp").alias("fingerprint"))
    )


@q(
    "doc_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM_SQL.format(c="text")}) AS fingerprint,
           {HASH60.format(x=_NORM_SQL.format(c="text"))} AS fingerprint60
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: full digest + 60-bit engine-portable hash."""
    d = tbl(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint").alias("fingerprint60"),
    )


@q(
    "token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS INT) AS n_unique_tokens,
           round(CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                 / len(string_split(trim(text), ' ')), 4) AS ttr
    FROM documents
    """,
)
def token_stats(spark, sf_dir):
    """Token counting + type-token ratio (quality signal)."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    uniq = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(uniq).alias("n_unique_tokens"),
        F.round(F.size(uniq).cast("double") / F.size(toks), 4).alias("ttr"),
    )


#: tiny stopword lists per language for the n-gram/stopword language-ID
#: heuristic. Deliberately simple — the operator shape (score per language,
#: argmax) is what matters, not lexicon quality.
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "y"],
}


def _langid_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), t -> list_contains([{words}], t)))"
    )


@q(
    "language_id",
    f"""
    SELECT doc_id,
           CASE
             WHEN {_langid_score_sql("de")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("de")} >= {_langid_score_sql("fr")}
              AND {_langid_score_sql("de")} >= {_langid_score_sql("es")}
              AND {_langid_score_sql("de")} > 0 THEN 'de'
             WHEN {_langid_score_sql("fr")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("fr")} >= {_langid_score_sql("es")}
              AND {_langid_score_sql("fr")} > 0 THEN 'fr'
             WHEN {_langid_score_sql("es")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("es")} > 0 THEN 'es'
             WHEN {_langid_score_sql("en")} > 0 THEN 'en'
             ELSE 'und'
           END AS predicted_lang
    FROM documents
    """,
)
def language_id(spark, sf_dir):
    """Stopword-hit language ID with a fixed precedence order (de>fr>es>en)
    so ties resolve identically in both engines."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    de, fr, es, en = score("de"), score("fr"), score("es"), score("en")
    pred = (
        F.when((de >= en) & (de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= en) & (fr >= es) & (fr > 0), "fr")
        .when((es >= en) & (es > 0), "es")
        .when(en > 0, "en")
        .otherwise("und")
    )
    return d.select("doc_id", pred.alias("predicted_lang"))


@q(
    "quality_score",
    """
    SELECT doc_id,
           round(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(CAST(len(list_filter(string_split(lower(text), ' '),
                       t -> list_contains(['the','a','of','and','to','is','in'], t))) AS DOUBLE)
                 / greatest(len(string_split(lower(text), ' ')), 1), 4) AS stopword_ratio,
           CASE WHEN length(text) BETWEEN 50 AND 5000
                 AND len(string_split(trim(text), ' ')) >= 10
                THEN 1 ELSE 0 END AS passes_length_gate
    FROM documents
    """,
)
def quality_score(spark, sf_dir):
    """Quality scoring: punctuation ratio, stopword ratio, length gate —
    the standard cheap pre-filters of a training-data pipeline."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to", "is", "in"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    return d.select(
        "doc_id",
        F.round(punct.cast("double") / F.greatest(F.length("text"), F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(
            n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("stopword_ratio"),
        F.when(
            F.length("text").between(50, 5000) & (F.size(F.split(F.trim(F.col("text")), " ")) >= 10),
            1,
        )
        .otherwise(0)
        .alias("passes_length_gate"),
    )


#: the funnel's stage predicates — identical fragments on both engines
_LANG_KNOWN_SQL = f"({_langid_score_sql('en')} + {_langid_score_sql('de')} + {_langid_score_sql('fr')} + {_langid_score_sql('es')}) > 0"
_LEN_GATE_SQL = (
    "(length(text) BETWEEN 50 AND 5000 "
    "AND len(string_split(trim(text), ' ')) >= 10)"
)
_PUNCT_GATE_SQL = (
    "(10000 * length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))"
    " <= 2000 * greatest(length(text), 1))"
)


@q(
    "curation_funnel",
    f"""
    WITH g AS (
      SELECT {_LANG_KNOWN_SQL} AS c_lang,
             {_LEN_GATE_SQL}   AS c_len,
             {_PUNCT_GATE_SQL} AS c_punct
      FROM documents
    ),
    n AS (
      SELECT count(*) AS n0,
             count(CASE WHEN c_lang THEN 1 END) AS n1,
             count(CASE WHEN c_lang AND c_len THEN 1 END) AS n2,
             count(CASE WHEN c_lang AND c_len AND c_punct THEN 1 END) AS n3
      FROM g
    )
    SELECT 1 AS stage, 'language_known' AS gate,
           CAST(n0 AS BIGINT) AS n_in, CAST(n1 AS BIGINT) AS n_out FROM n
    UNION ALL
    SELECT 2, 'length_gate', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT) FROM n
    UNION ALL
    SELECT 3, 'punct_gate', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT) FROM n
    """,
)
def curation_funnel(spark, sf_dir):
    """The end-to-end curation funnel: language-known → length gate →
    punctuation gate, reported as per-stage attrition (n_in → n_out) —
    the audit table a training-data pipeline publishes alongside every
    corpus build. Composes the language_id and quality_score predicates
    verbatim, so the funnel certifies their filter semantics jointly.

    One scan, one 1-row aggregate (the three cumulative conditionals fuse
    into a single partial agg), exploded to a 3-row report — at 100 TB
    the funnel costs exactly one pass regardless of stage count. The
    punctuation gate compares in integer basis points (10000·punct_len ≤
    2000·len), so stage membership is exact — no float thresholds."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    c_lang = (hits("en") + hits("de") + hits("fr") + hits("es")) > 0
    c_len = F.length("text").between(50, 5000) & (
        F.size(F.split(F.trim(F.col("text")), " ")) >= 10
    )
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    c_punct = (punct * 10000) <= (F.greatest(F.length("text"), F.lit(1)) * 2000)
    n = d.select(
        F.count("*").alias("n0"),
        F.count(F.when(c_lang, 1)).alias("n1"),
        F.count(F.when(c_lang & c_len, 1)).alias("n2"),
        F.count(F.when(c_lang & c_len & c_punct, 1)).alias("n3"),
    )
    rows = F.array(
        F.struct(
            F.lit(1).alias("stage"), F.lit("language_known").alias("gate"),
            F.col("n0").alias("n_in"), F.col("n1").alias("n_out"),
        ),
        F.struct(
            F.lit(2).alias("stage"), F.lit("length_gate").alias("gate"),
            F.col("n1").alias("n_in"), F.col("n2").alias("n_out"),
        ),
        F.struct(
            F.lit(3).alias("stage"), F.lit("punct_gate").alias("gate"),
            F.col("n2").alias("n_in"), F.col("n3").alias("n_out"),
        ),
    )
    return n.select(F.explode(rows).alias("r")).select("r.*")


#: BM25 over a fixed query — all-integer scoring (k1=1.2, b=0.75 scaled to
#: thousandths) per the tfidf_top_terms libm-independence discipline
_BM25_TERMS = ("window", "merge", "stream", "spark")
_BM25_K = 10


def _bm25_tf_sql(term: str) -> str:
    return f"len(list_filter(toks, t -> t = '{term}'))"


def _bm25_sql() -> str:
    per_term = " + ".join(
        f"""(
          CASE WHEN tf_{i} = 0 THEN 0 ELSE
            (((n_docs - df_{i}) * 1000) // (df_{i} + 1) + 1000)
            * ((tf_{i} * 2200 * 1000000)
               // (tf_{i} * 1000
                   + (1200 * (250 + (750 * dl * n_docs) // total_len)) // 1000))
          END)"""
        for i in range(len(_BM25_TERMS))
    )
    tf_cols = ", ".join(
        f"{_bm25_tf_sql(t)} AS tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(CASE WHEN tf_{i} > 0 THEN 1 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    t AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM d),
    g AS (SELECT count(*) AS n_docs, sum(dl) AS total_len, {df_cols} FROM t)
    SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT doc_id, {per_term} AS score,
             row_number() OVER (ORDER BY {per_term} DESC, doc_id) AS rnk
      FROM t CROSS JOIN g
    ) WHERE rnk <= {_BM25_K}
    """


@q("bm25_topk", _bm25_sql())
def bm25_topk(spark, sf_dir):
    """BM25 retrieval for a fixed 4-term query: top-10 documents by the
    Okapi score (k1=1.2, b=0.75), computed entirely in scaled-integer
    arithmetic — idf in thousandths, tf-saturation in millionths — so the
    ranking is bit-identical across engines and libm versions (the same
    discipline tfidf_top_terms documents; a float ln() idf could flip
    last-bit ties).

    Plan: per-doc tf columns are codegen'd HOF filters over ONE tokenize
    (no per-term scans); the corpus-level df/N/total_len fold into a
    1-row aggregate that broadcasts back; ranking is one TakeOrdered-k.
    At 100 TB the dominant cost is the tokenize scan — df/N are
    index-free corpus statistics a production deployment caches per
    corpus version like the PQ codebook."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    t = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.expr(
                f"size(filter(toks, t -> t = '{term}'))"
            ).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    g = t.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    per_term = " + ".join(
        f"""(
          CASE WHEN tf_{i} = 0 THEN CAST(0 AS BIGINT) ELSE
            (((n_docs - df_{i}) * 1000) div (df_{i} + 1) + 1000)
            * ((CAST(tf_{i} AS BIGINT) * 2200 * 1000000)
               div (CAST(tf_{i} AS BIGINT) * 1000
                    + (1200 * (250 + (750 * CAST(dl AS BIGINT) * n_docs)
                               div total_len)) div 1000))
          END)"""
        for i in range(len(_BM25_TERMS))
    )
    from pyspark.sql import Window as W

    scored = t.crossJoin(F.broadcast(g)).select(
        "doc_id", F.expr(per_term).alias("score")
    )
    # TakeOrdered cut BEFORE the rank window: a global row_number would
    # funnel the whole corpus into one task (the hot_key_report rule);
    # the window then ranks only the k survivors
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_BM25_K)
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("int").alias("rnk")
    )


#: BPE-ish pre-tokenizer regex (GPT-2-style word/number/punct split,
#: ASCII classes so Java regex and RE2 agree character-for-character)
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@q(
    "bpe_token_count",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INT) AS n_bpe_tokens,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_ws_tokens,
           round(CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE)
                 / greatest(len(string_split(trim(text), ' ')), 1), 4)
               AS tokens_per_word
    FROM documents
    """,
)
def bpe_token_count(spark, sf_dir):
    """Subword-proxy token counting: a BPE-style pre-tokenizer regex
    (letter runs / digit runs / single punctuation) next to the whitespace
    count, plus their ratio — the cost estimator a training-data pipeline
    runs before paying for real BPE. Pure regexp_extract_all projection:
    no UDF, no shuffle, scales with the scan."""
    d = tbl(spark, sf_dir, "documents")
    bpe = F.expr(f"size(regexp_extract_all(text, '{_BPE_RE}', 0))")
    ws = F.size(F.split(F.trim(F.col("text")), " "))
    return d.select(
        "doc_id",
        bpe.cast("int").alias("n_bpe_tokens"),
        ws.cast("int").alias("n_ws_tokens"),
        F.round(
            bpe.cast("double") / F.greatest(ws, F.lit(1)), 4
        ).alias("tokens_per_word"),
    )


# -- retrieval ranking-quality evaluation -------------------------------------

_EVAL_K = 10
#: round(log2(r+1) * 1e6) for ranks r = 1..10 — shared integer literals so
#: neither engine touches libm (the bm25 scaled-integer discipline)
_LOG2_MICRO = [
    1000000, 1584963, 2000000, 2321928, 2584963,
    2807355, 3000000, 3169925, 3321928, 3459432,
]


def _l2m_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {r + 1} THEN {v}" for r, v in enumerate(_LOG2_MICRO)
    )
    return f"(CASE {rank_col} {whens} END)"


_GAIN_CASE = "(CASE rel WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 7 ELSE 0 END)"


def _eval_sql() -> str:
    tf_cols = ", ".join(
        f"{_bm25_tf_sql(t)} AS tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    melt = " UNION ALL ".join(
        f"SELECT '{t}' AS term, doc_id, dl, tf_{i} AS tf FROM t"
        for i, t in enumerate(_BM25_TERMS)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    t AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM d),
    g AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM t),
    melt AS ({melt}),
    dfs AS (SELECT term, count(*) AS df FROM melt WHERE tf > 0 GROUP BY 1),
    sc AS (
      SELECT m.term, m.doc_id, least(m.tf - 1, 3) AS rel,
             (((g.n_docs - f.df) * 1000) // (f.df + 1) + 1000)
             * ((m.tf * 2200 * 1000000)
                // (m.tf * 1000
                    + (1200 * (250 + (750 * m.dl * g.n_docs) // g.total_len))
                      // 1000)) AS score
      FROM melt m JOIN dfs f USING (term) CROSS JOIN g
      WHERE m.tf > 0
    ),
    top AS (
      SELECT term, rel,
             row_number() OVER (
                 PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
      FROM sc
    ),
    ideal AS (
      SELECT term, rel,
             row_number() OVER (
                 PARTITION BY term ORDER BY rel DESC, doc_id) AS irnk
      FROM sc WHERE rel > 0
    ),
    dcg AS (
      SELECT term,
             CAST(sum({_GAIN_CASE}::BIGINT * 1000000000
                      // {_l2m_case("rnk")}) AS BIGINT) AS dcg_milli
      FROM top WHERE rnk <= {_EVAL_K} GROUP BY 1
    ),
    idcg AS (
      SELECT term,
             CAST(sum({_GAIN_CASE}::BIGINT * 1000000000
                      // {_l2m_case("irnk")}) AS BIGINT) AS idcg_milli
      FROM ideal WHERE irnk <= {_EVAL_K} GROUP BY 1
    ),
    mrr AS (SELECT term, min(rnk) AS fr
            FROM top WHERE rnk <= {_EVAL_K} AND rel > 0 GROUP BY 1),
    nrel AS (SELECT term, CAST(count(*) AS BIGINT) AS n_relevant
             FROM sc WHERE rel > 0 GROUP BY 1),
    terms AS ({" UNION ALL ".join(f"SELECT '{t}' AS term" for t in _BM25_TERMS)})
    SELECT terms.term,
           COALESCE(nrel.n_relevant, 0) AS n_relevant,
           COALESCE(dcg.dcg_milli, 0) AS dcg_milli,
           COALESCE(idcg.idcg_milli, 0) AS idcg_milli,
           CAST(COALESCE(dcg.dcg_milli, 0) * 1000000
                // greatest(COALESCE(idcg.idcg_milli, 0), 1)
                AS BIGINT) AS ndcg_ppm,
           CAST(COALESCE(1000000 // mrr.fr, 0) AS BIGINT) AS mrr_ppm
    FROM terms LEFT JOIN dcg USING (term) LEFT JOIN idcg USING (term)
               LEFT JOIN mrr USING (term) LEFT JOIN nrel USING (term)
    ORDER BY term
    """


@q("retrieval_eval_ndcg", _eval_sql())
def retrieval_eval_ndcg(spark, sf_dir):
    """Retrieval ranking-quality evaluation — NDCG@{k} and MRR@{k} for
    each of the four BM25 terms run as single-term queries: graded
    relevance rel = min(tf-1, 3) (a doc mentioning the term ONCE is
    retrieved-but-irrelevant; repetition grades it), gain = 2^rel - 1,
    discounts from SHARED integer log2 literals (micro-units) so the
    metric is bit-identical across engines — no libm in the wire. This
    is the eval harness a retrieval/RAG pipeline publishes next to its
    index builds: DCG from the system ranking vs IDCG from the ideal
    (rel-sorted) ranking, plus the first-relevant-rank reciprocal.

    Plan/scale: ONE tokenize scan melts to (term, doc) rows via stack;
    per-term df/corpus stats are a broadcast 4-row + 1-row pair; the
    candidate frame (docs CONTAINING a term) localCheckpoints once and
    every per-term ranking is a TakeOrdered({k}) over it — no global
    row_number, no corpus sort (the hot_key_report rule); DCG/IDCG/MRR
    reduce the {k}-row survivors."""
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    t = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.expr(f"size(filter(toks, t -> t = '{term}'))").alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    g = F.broadcast(t.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    ))
    stack = ", ".join(f"'{term}', tf_{i}" for i, term in enumerate(_BM25_TERMS))
    melt = t.select(
        "doc_id",
        "dl",
        F.expr(f"stack({len(_BM25_TERMS)}, {stack}) AS (term, tf)"),
    ).where(F.col("tf") > 0)
    dfs = F.broadcast(
        melt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    sc = (
        melt.join(dfs, "term")
        .crossJoin(g)
        .select(
            "term",
            "doc_id",
            F.least(F.col("tf") - 1, F.lit(3)).alias("rel"),
            F.expr(
                "(((n_docs - df) * 1000) div (df + 1) + 1000)"
                " * ((CAST(tf AS BIGINT) * 2200 * 1000000)"
                " div (CAST(tf AS BIGINT) * 1000"
                " + (1200 * (250 + (750 * CAST(dl AS BIGINT) * n_docs)"
                " div total_len)) div 1000))"
            ).alias("score"),
        )
        .localCheckpoint(eager=False)
    )
    gain = F.expr(f"CAST({_GAIN_CASE} AS BIGINT)")
    out = None
    for term in _BM25_TERMS:
        b = sc.where(F.col("term") == term)
        top = b.orderBy(F.desc("score"), F.asc("doc_id")).limit(_EVAL_K)
        w = W.orderBy(F.desc("score"), F.asc("doc_id"))
        top = top.select("rel", F.row_number().over(w).alias("rnk"))
        ideal = b.where(F.col("rel") > 0).orderBy(
            F.desc("rel"), F.asc("doc_id")
        ).limit(_EVAL_K)
        wi = W.orderBy(F.desc("rel"), F.asc("doc_id"))
        ideal = ideal.select("rel", F.row_number().over(wi).alias("irnk"))
        dcg = top.agg(
            F.coalesce(
                F.sum(
                    F.expr(f"{_GAIN_CASE} * CAST(1000000000 AS BIGINT)"
                           f" div {_l2m_case('rnk')}")
                ),
                F.lit(0),
            ).cast("bigint").alias("dcg_milli"),
            F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("fr"),
        )
        idcg = ideal.agg(
            F.coalesce(
                F.sum(
                    F.expr(f"{_GAIN_CASE} * CAST(1000000000 AS BIGINT)"
                           f" div {_l2m_case('irnk')}")
                ),
                F.lit(0),
            ).cast("bigint").alias("idcg_milli")
        )
        nrel = b.agg(
            F.coalesce(
                F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_relevant")
        )
        row = (
            dcg.crossJoin(idcg)
            .crossJoin(nrel)
            .select(
                F.lit(term).alias("term"),
                "n_relevant",
                "dcg_milli",
                "idcg_milli",
                F.expr(
                    "CAST(dcg_milli * 1000000"
                    " div greatest(idcg_milli, 1) AS BIGINT)"
                ).alias("ndcg_ppm"),
                F.expr(
                    "CAST(coalesce(1000000 div fr, 0) AS BIGINT)"
                ).alias("mrr_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("term")


retrieval_eval_ndcg.__doc__ = retrieval_eval_ndcg.__doc__.format(k=_EVAL_K)


# -- inter-rater agreement (label-quality audit) -------------------------------


@q(
    "cohens_kappa",
    f"""
    WITH f AS (
      SELECT CASE WHEN {_LANG_KNOWN_SQL} THEN 1 ELSE 0 END AS a,
             CASE WHEN {_LEN_GATE_SQL} AND {_PUNCT_GATE_SQL}
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM f
    )
    SELECT n, n11, n10, n01, n00,
           CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(((n11 + n10)::HUGEINT * (n11 + n01)
                 + (n01 + n00)::HUGEINT * (n10 + n00)) * 1000000
                // (n::HUGEINT * n) AS BIGINT) AS pe_ppm,
           CAST(((n11 + n00)::HUGEINT * n
                 - ((n11 + n10)::HUGEINT * (n11 + n01)
                    + (n01 + n00)::HUGEINT * (n10 + n00))) * 1000000
                // greatest(n::HUGEINT * n
                            - ((n11 + n10)::HUGEINT * (n11 + n01)
                               + (n01 + n00)::HUGEINT * (n10 + n00)), 1)
                AS BIGINT) AS kappa_ppm
    FROM c
    """,
)
def cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two independent document classifiers — the
    language-known gate (rater A) and the combined length+punctuation
    quality gate (rater B) — the label-quality audit run before trusting
    heuristic labels as training filters: kappa = (p_o - p_e)/(1 - p_e)
    corrects raw agreement for chance, in exact ppm (2x2 cross-products
    in DECIMAL(38,0)/HUGEINT, so a 10^12-row corpus cannot overflow).
    Reuses the curation_funnel predicates verbatim, so the kappa row
    co-certifies their filter semantics.

    Plan/scale: both raters are row-local predicates folded into ONE
    map-side-combined 1-row aggregate over a single scan — the
    chi_square_independence topology without even the cell shuffle."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    a = (
        (hits("en") + hits("de") + hits("fr") + hits("es")) > 0
    ).cast("int")
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    b = (
        F.length("text").between(50, 5000)
        & (F.size(F.split(F.trim(F.col("text")), " ")) >= 10)
        & ((punct * 10000) <= (F.greatest(F.length("text"), F.lit(1)) * 2000))
    ).cast("int")
    c = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    pe_num = (
        f"({dec.format('n11 + n10')} * (n11 + n01)"
        f" + {dec.format('n01 + n00')} * (n10 + n00))"
    )
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr("CAST((n11 + n00) * 1000000 div n AS BIGINT)").alias("po_ppm"),
        F.expr(
            f"CAST({pe_num} * 1000000 div ({dec.format('n')} * n) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(
            f"CAST(({dec.format('n11 + n00')} * n - {pe_num}) * 1000000"
            f" div greatest({dec.format('n')} * n - {pe_num},"
            f" CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("kappa_ppm"),
    )


# -- language-label quality: confusion matrix ----------------------------------

_LANG_PRED_SQL = f"""CASE
             WHEN {_langid_score_sql("de")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("de")} >= {_langid_score_sql("fr")}
              AND {_langid_score_sql("de")} >= {_langid_score_sql("es")}
              AND {_langid_score_sql("de")} > 0 THEN 'de'
             WHEN {_langid_score_sql("fr")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("fr")} >= {_langid_score_sql("es")}
              AND {_langid_score_sql("fr")} > 0 THEN 'fr'
             WHEN {_langid_score_sql("es")} >= {_langid_score_sql("en")}
              AND {_langid_score_sql("es")} > 0 THEN 'es'
             WHEN {_langid_score_sql("en")} > 0 THEN 'en'
             ELSE 'und'
           END"""


@q(
    "lang_confusion_matrix",
    f"""
    WITH p AS (
      SELECT lang AS declared, {_LANG_PRED_SQL} AS predicted FROM documents
    ),
    cell AS (
      SELECT declared, predicted, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(sum(CASE WHEN declared = predicted THEN n END)
                        AS BIGINT) AS hit
            FROM cell)
    SELECT declared, predicted, n,
           CAST(n * 1000000 // t AS BIGINT) AS share_ppm,
           CAST(COALESCE(hit, 0) * 1000000 // t AS BIGINT) AS accuracy_ppm
    FROM cell CROSS JOIN tot
    ORDER BY declared, predicted
    """,
)
def lang_confusion_matrix(spark, sf_dir):
    """Label-quality confusion matrix: the corpus's DECLARED language
    column cross-tabulated against the engine's stopword language
    detector (`language_id` verbatim) — the audit that catches mislabeled
    crawl slices before a language-stratified sample inherits the error.
    Each cell carries its corpus share and every row repeats the global
    diagonal accuracy (both in exact ppm), so one table answers "how
    wrong are the labels and in which direction".

    Plan/scale: the detector is a row-local HOF projection inside the
    scan; the only shuffle is the (declared, predicted) cell aggregate —
    at most |langs|^2 cells; totals are a broadcast 1-row frame."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    de, fr, es, en = score("de"), score("fr"), score("es"), score("en")
    pred = (
        F.when((de >= en) & (de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= en) & (fr >= es) & (fr > 0), "fr")
        .when((es >= en) & (es > 0), "es")
        .when(en > 0, "en")
        .otherwise("und")
    )
    cell = (
        d.select(F.col("lang").alias("declared"), pred.alias("predicted"))
        .groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = F.broadcast(
        cell.agg(
            F.sum("n").cast("bigint").alias("t"),
            F.sum(F.when(F.col("declared") == F.col("predicted"), F.col("n")))
            .cast("bigint")
            .alias("hit"),
        )
    )
    return (
        cell.crossJoin(tot)
        .select(
            "declared",
            "predicted",
            "n",
            F.expr("CAST(n * 1000000 div t AS BIGINT)").alias("share_ppm"),
            F.expr(
                "CAST(coalesce(hit, 0) * 1000000 div t AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("declared", "predicted")
    )


# -- context-budget truncation loss curve --------------------------------------

_TRUNC_BUDGETS = (64, 128, 256)


@q(
    "context_truncation_loss",
    f"""
    WITH t AS (
      SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
      FROM documents
    ),
    b AS ({" UNION ALL ".join(f"SELECT {c} AS budget" for c in _TRUNC_BUDGETS)})
    SELECT b.budget,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n > b.budget THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_over_budget,
           CAST(sum(greatest(n - b.budget, 0)) AS BIGINT) AS lost_tokens,
           CAST(sum(greatest(n - b.budget, 0)) * 1000000
                // greatest(sum(n), 1) AS BIGINT) AS lost_ppm
    FROM t CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
)
def context_truncation_loss(spark, sf_dir):
    """Context-budget truncation loss curve: for each candidate context
    length the token mass a truncate-at-budget policy would discard and
    the share of documents it would cut (exact ppm) — the one-scan audit
    that decides between truncation and chunking (`doc_chunking`) and
    sizes the packing budget (`pack_sequences`) before a training run.

    Plan/scale (r9): the budgets are compile-time literals, so the curve
    needs NO row replication at all — one aggregate computes every
    budget's (docs_over, lost) as conditional sums side by side, and the
    {len(_TRUNC_BUDGETS)}-row curve unpivots from the single result row.
    The previous broadcast cross-join replicated every corpus row
    |budgets|x before the partial aggregate ({len(_TRUNC_BUDGETS)}x the
    map-side agg input for values derivable from one copy); folding it
    away is guide-§2.3 "aggregate before you shuffle" taken to its
    limit — the shuffle now carries one row of partials. The token-count
    split is the only heavy map work, so the scan floors at core width
    (`wide`, no-op on cluster layouts)."""
    d = tbl(spark, sf_dir, "documents")
    t = wide(spark, d.select("text"), sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    ]
    for c in _TRUNC_BUDGETS:
        aggs += [
            F.sum(F.when(F.col("n") > c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"over_{c}"),
            F.sum(F.greatest(F.col("n") - c, F.lit(0)))
            .cast("bigint")
            .alias(f"lost_{c}"),
        ]
    one = t.agg(*aggs)
    curve = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).cast("int").alias("budget"),
                        F.col("n_docs"),
                        F.col("total_tokens"),
                        F.col(f"over_{c}").alias("docs_over_budget"),
                        F.col(f"lost_{c}").alias("lost_tokens"),
                    )
                    for c in _TRUNC_BUDGETS
                ]
            )
        ).alias("r")
    )
    return curve.select(
        "r.budget",
        "r.n_docs",
        "r.total_tokens",
        "r.docs_over_budget",
        "r.lost_tokens",
        F.expr(
            "CAST(r.lost_tokens * 1000000"
            " div greatest(r.total_tokens, 1) AS BIGINT)"
        ).alias("lost_ppm"),
    ).orderBy("budget")


# -- classifier discrimination: exact AUC + cumulative gains -------------------

#: integer basis-point punctuation score — the "rater" under evaluation
_PUNCT_BP_SQL = (
    "CAST(10000 * length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))"
    " // greatest(length(text), 1) AS BIGINT)"
)


@q(
    "classifier_auc",
    f"""
    WITH f AS (
      SELECT {_PUNCT_BP_SQL} AS s,
             CASE WHEN {_LANG_KNOWN_SQL} THEN 0 ELSE 1 END AS y
      FROM documents
    ),
    vc AS (
      SELECT s, CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM f GROUP BY 1
    ),
    cum AS (
      SELECT s, cp, cn,
             COALESCE(sum(cp + cn) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
      FROM vc
    ),
    agg AS (
      SELECT CAST(sum(cp) AS BIGINT) AS np,
             CAST(sum(cn) AS BIGINT) AS nn,
             CAST(sum(cp::HUGEINT * (2 * tb + cp + cn + 1)) AS HUGEINT)
                 AS rs2
      FROM cum
    )
    SELECT np AS n_positive, nn AS n_negative,
           CAST((rs2 - np::HUGEINT * (np + 1)) * 1000000
                // greatest(2::HUGEINT * np * nn, 1) AS BIGINT) AS auc_ppm
    FROM agg
    """,
)
def classifier_auc(spark, sf_dir):
    """Exact AUC of the punctuation-ratio score as a detector of
    language-UNKNOWN documents — the threshold-free discrimination
    metric an eval harness reports next to `cohens_kappa`'s agreement
    and `retrieval_eval_ndcg`'s ranking quality: AUC = P(score of a
    random positive > random negative) + ties/2, computed via the
    midrank rank-sum identity in exact integers (the `mann_whitney_u`
    algebra — AUC ≡ U/(n⁺n⁻) — over the score domain), in ppm.

    Plan/scale: the score is an integer BASIS-POINT projection, so the
    distinct-score frame is GENUINELY bounded (≤10001 rows at any
    corpus size — the gini/cusum bounded-domain argument, not the
    ks/mwu corpus-proportional case); one map-side-combined (score,
    pos, neg) aggregate, one bounded window, a 1-row HUGEINT reduction.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    known = (hits("en") + hits("de") + hits("fr") + hits("es")) > 0
    punct = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    s = F.expr(
        "CAST(10000 * length(regexp_replace(text, '[a-z0-9 ]', ''))"
        " div greatest(length(text), 1) AS BIGINT)"
    )
    f = d.select(
        s.alias("s"),
        F.when(known, 0).otherwise(1).alias("y"),
    )
    vc = f.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("cp"),
        F.sum(F.lit(1) - F.col("y")).cast("bigint").alias("cn"),
    )
    wv = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    cum = vc.select(
        "s",
        "cp",
        "cn",
        F.coalesce(F.sum(F.col("cp") + F.col("cn")).over(wv), F.lit(0)).alias(
            "tb"
        ),
    )
    agg = cum.agg(
        F.sum("cp").cast("bigint").alias("np"),
        F.sum("cn").cast("bigint").alias("nn"),
        F.sum(
            F.col("cp").cast("decimal(38,0)")
            * (2 * F.col("tb") + F.col("cp") + F.col("cn") + 1)
        ).alias("rs2"),
    )
    return agg.select(
        F.col("np").alias("n_positive"),
        F.col("nn").alias("n_negative"),
        F.expr(
            "CAST((rs2 - CAST(np AS DECIMAL(38,0)) * (np + 1)) * 1000000"
            " div greatest(CAST(2 AS DECIMAL(38,0)) * np * nn, 1) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@q(
    "cumulative_gains",
    f"""
    WITH f AS (
      SELECT least({_PUNCT_BP_SQL} // 1000, 9) AS bucket,
             CASE WHEN {_LANG_KNOWN_SQL} THEN 0 ELSE 1 END AS y
      FROM documents
    ),
    b AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM f GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                   CAST(sum(n_pos) AS BIGINT) AS tp FROM b),
    c AS (
      SELECT bucket, n_docs, n_pos,
             sum(n_docs) OVER (ORDER BY bucket DESC) AS cum_docs,
             sum(n_pos) OVER (ORDER BY bucket DESC) AS cum_pos
      FROM b
    )
    SELECT CAST(bucket AS INT) AS bucket, n_docs, n_pos,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(cum_pos * 1000000 // greatest(tp, 1) AS BIGINT)
               AS gain_ppm,
           CAST(cum_docs * 1000000 // greatest(td, 1) AS BIGINT)
               AS pop_share_ppm
    FROM c CROSS JOIN tot ORDER BY bucket DESC
    """,
)
def cumulative_gains(spark, sf_dir):
    """Cumulative-gains table for the punctuation score as a
    language-unknown detector — the "top X% of scores capture Y% of
    positives" chart every targeting/triage pipeline publishes: docs
    bucket into 10 equal-width score bands, scanned highest-score-first
    with cumulative positive capture and population share in exact ppm
    (gain_ppm ≫ pop_share_ppm = useful lift; equal = random).

    Plan/scale: one row-local bucket/label projection, one map-side-
    combined ≤10-row aggregate; the cumulative window rides the 10-row
    bucket frame and totals broadcast. One corpus pass."""
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    known = (hits("en") + hits("de") + hits("fr") + hits("es")) > 0
    f = d.select(
        F.least(
            F.expr(
                "CAST(10000 * length(regexp_replace(text, '[a-z0-9 ]', ''))"
                " div greatest(length(text), 1) AS BIGINT)"
            )
            / 1000,
            F.lit(9),
        )
        .cast("int")
        .alias("bucket"),
        F.when(known, 0).otherwise(1).alias("y"),
    )
    b = f.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    tot = F.broadcast(
        b.agg(
            F.sum("n_docs").cast("bigint").alias("td"),
            F.sum("n_pos").cast("bigint").alias("tp"),
        )
    )
    wd = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    c = b.select(
        "bucket",
        "n_docs",
        "n_pos",
        F.sum("n_docs").over(wd).alias("cum_docs"),
        F.sum("n_pos").over(wd).alias("cum_pos"),
    )
    return (
        c.crossJoin(tot)
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "n_pos",
            F.col("cum_pos").cast("bigint").alias("cum_pos"),
            F.expr(
                "CAST(cum_pos * 1000000 div greatest(tp, 1) AS BIGINT)"
            ).alias("gain_ppm"),
            F.expr(
                "CAST(cum_docs * 1000000 div greatest(td, 1) AS BIGINT)"
            ).alias("pop_share_ppm"),
        )
        .orderBy(F.col("bucket").desc())
    )
