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


@pytest.fixture(scope="module")
def seg_docs_dir(spark, tmp_path_factory):
    """Documents with PLANTED duplicate segments: docs 1 and 2 share an
    identical first 16-token segment (boilerplate); their second segments
    differ. Doc 3 is a 1-token doc (single short segment)."""
    path = str(tmp_path_factory.mktemp("segdedup") / "lake")
    boiler = " ".join(f"b{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_b = " ".join(f"c{i}" for i in range(16))
    rows = [
        (1, f"{boiler} {uniq_a}", "en", "s0", 0),
        (2, f"{boiler} {uniq_b}", "en", "s0", 0),
        (3, "solo", "en", "s1", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_segment_dedup_first_occurrence_wins(spark, seg_docs_dir):
    out = {r.doc_id: r for r in curation.segment_dedup(spark, seg_docs_dir).collect()}
    # doc 1 owns the boilerplate's first occurrence: both segments kept.
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[1].drop_ratio == 0.0
    # doc 2's first segment is a corpus-wide duplicate of doc 1's: dropped.
    assert out[2].n_segments == 2 and out[2].n_kept == 1
    assert out[2].drop_ratio == 0.5
    # a 1-token doc yields exactly one (short) segment, kept.
    assert out[3].n_segments == 1 and out[3].n_kept == 1
    # global invariant: total kept == corpus-wide distinct segments
    # (boiler, uniq_a, uniq_b, solo).
    assert sum(r.n_kept for r in out.values()) == 4


def test_lm_perplexity_scores_predictability(spark, tmp_path_factory):
    """A doc that repeats one high-count bigram must score a LOWER average
    NLL than a doc of corpus-unique bigrams, and byte-identical docs must
    score identically (determinism)."""
    path = str(tmp_path_factory.mktemp("lm") / "lake")
    rows = [
        (1, "the cat " * 20, "en", "s0", 0),   # one bigram, seen ~40×
        (2, " ".join(f"w{i}" for i in range(40)), "en", "s0", 0),  # all unique
        (3, "the cat " * 20, "en", "s0", 0),   # exact dup of doc 1
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in curation.lm_perplexity(spark, path).collect()}
    assert out[1].avg_nll > 0 and out[2].avg_nll > 0
    assert out[1].avg_nll < out[2].avg_nll
    assert out[1].avg_nll == out[3].avg_nll
    assert out[2].n_bigrams == 39


def test_domain_mix_kl_terms_and_absent_source(spark, tmp_path_factory):
    """An over-represented source gets a positive KL term, an
    under-represented one negative, terms sum to ~KL >= 0 — and a source
    with NO reference-slice documents (every doc_id ≡ 9 mod 10) is
    dropped, matching the oracle's inner join, instead of surfacing a
    NULL ln() row."""
    path = str(tmp_path_factory.mktemp("klmix") / "lake")
    rows = (
        # sA: 2 ref docs of 10 tokens, plus a NEW 100-token doc (id 19,
        # outside the ref slice) -> current share way above reference
        [(10, "a " * 9 + "a", "en", "sA", 0), (20, "a " * 9 + "a", "en", "sA", 0),
         (19, "a " * 99 + "a", "en", "sA", 0)]
        # sB: stable 2 docs of 10 tokens -> share shrinks vs reference
        + [(30, "b " * 9 + "b", "en", "sB", 0), (40, "b " * 9 + "b", "en", "sB", 0)]
        # sC: exists ONLY outside the reference slice
        + [(9, "c " * 9 + "c", "en", "sC", 0), (29, "c " * 9 + "c", "en", "sC", 0)]
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {r.source: r for r in curation.domain_mix_kl(spark, path).collect()}
    assert set(out) == {"sA", "sB"}
    assert out["sA"].cur_toks == 120 and out["sA"].ref_toks == 20
    assert out["sB"].cur_toks == 20 and out["sB"].ref_toks == 20
    assert out["sA"].kl_term > 0      # over-represented vs reference
    assert out["sB"].kl_term < 0      # starved vs reference


def test_bpe_merges_are_greedy_and_reuse_merged_symbols(spark, tmp_path_factory):
    """The merge fold must be greedy left-to-right NON-overlapping
    ('aaaa' -> [aa, aa]; 'aaa' -> [aa, a]) and later rounds must see
    earlier rounds' merged symbols as single units (round 2 merges
    (aa, aa) -> 'aaaa') — the corner the synthetic corpus (no doubled
    letters) never exercises."""
    path = str(tmp_path_factory.mktemp("bpe") / "lake")
    rows = [(1, "aaaa aaaa aaaa aaa xyz xyz", "en", "src0", 26)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_cnt)
        for r in curation.bpe_vocab_induction(spark, path).collect()
    ]
    # r1: (a,a) counts 3 per 'aaaa' (x3) + 2 per 'aaa' (x1) = 11
    # r2: after greedy merge 'aaaa'->' aa aa ', 'aaa'->' aa a ':
    #     (aa,aa)=3 beats (x,y)=(y,z)=2 and (aa,a)=1
    # r3: (x,y)=2 ties (y,z)=2, lexicographic tiebreak elects (x,y)
    assert out == [
        (1, "a", "a", "aa", 11),
        (2, "aa", "aa", "aaaa", 3),
        (3, "x", "y", "xy", 2),
    ]


def test_bpe_segmentation_round_trip_compression(spark, tmp_path_factory):
    """Induce on the overlap corpus, segment with the learned vocab:
    'aaaa'x3 -> 1 token each, 'aaa' -> [aa, a], 'xyz'x2 -> [xy, z];
    compression is exact integer ppm."""
    path = str(tmp_path_factory.mktemp("bpe_seg") / "lake")
    rows = [(1, "aaaa aaaa aaaa aaa xyz xyz", "en", "src0", 26)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    r = curation.bpe_learned_segmentation(spark, path).collect()[0]
    # chars: 3*4 + 1*3 + 2*3 = 21; tokens: 3*1 + 1*2 + 2*2 = 9
    assert (r.n_words, r.char_tokens, r.bpe_tokens) == (6, 21, 9)
    assert r.compression_ppm == 9 * 1000000 // 21


def test_bpe_merge_fold_exhaustive_against_reference(spark):
    """The greedy left-to-right non-overlapping merge fold, exhaustively:
    every symbol string over {a, b} of length 1..6 (126 words) under all
    four single-char merge pairs, against a literal Python scanner.
    Overlap chains ('a a a a' under (a, a)), interleavings and no-match
    words are all in the enumeration — if the accumulator's skip logic
    mishandles ANY case, this finds it."""
    from itertools import product

    from pyspark.sql import functions as F

    from bridgedownstream_spark.queries.curation import _BPE_MERGE_SPARK

    def ref_merge(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " " + " ".join(out) + " "

    words = [
        list(w) for n in range(1, 7) for w in product("ab", repeat=n)
    ]
    rows = [(" " + " ".join(w) + " ",) for w in words]
    df = spark.createDataFrame(rows, "repr string")
    for l, r in product("ab", repeat=2):
        got = (
            df.withColumn("syms", F.expr("split(trim(repr), ' ')"))
            .withColumn("ls", F.lit(l))
            .withColumn("rs", F.lit(r))
            .select("repr", F.expr(_BPE_MERGE_SPARK).alias("merged"))
            .collect()
        )
        for row in got:
            syms = row.repr.strip().split(" ")
            assert row.merged == ref_merge(syms, l, r), (row.repr, l, r)


def test_bpe_relational_merge_exhaustive_against_reference():
    """The ORACLE's gaps-and-islands merge (even-offset-within-run rule),
    exhaustively against the same Python scanner — pure DuckDB, no Spark.
    A 100000-count pin word forces each round-1 winner, then every
    enumerated word's merged repr must equal the greedy scan. This is the
    other half of the two-algorithms-one-answer claim: the fold test
    covers Spark, this covers the relational formulation."""
    from itertools import product

    import duckdb

    from bridgedownstream_spark.queries.curation import _bpe_round_duck

    def ref_merge(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " " + " ".join(out) + " "

    words = [list(w) for n in range(1, 7) for w in product("ab", repeat=n)]
    for l, r in product("ab", repeat=2):
        con = duckdb.connect()
        vals = [("".join(w), 1, " " + " ".join(w) + " ") for w in words]
        pin = (f"pin{l}{r}", 100000, f" {l} {r} ")
        rows = ", ".join(
            f"('{w}', {c}, '{rep}')" for w, c, rep in vals + [pin]
        )
        sql = (
            f"WITH w0 (word, cnt, repr) AS (VALUES {rows}), "
            + _bpe_round_duck(1)
            + " SELECT word, repr FROM w1"
        )
        got = dict(con.execute(sql).fetchall())
        win = con.execute(
            f"WITH w0 (word, cnt, repr) AS (VALUES {rows}), "
            + _bpe_round_duck(1)
            + " SELECT ls, rs FROM win1"
        ).fetchone()
        assert win == (l, r), win  # the pin actually forced the winner
        for w in words:
            assert got["".join(w)] == ref_merge(w, l, r), ("".join(w), l, r)


def _duck_on(parquet_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{parquet_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchall()


def test_bpe_degenerate_corpus_keeps_vocabulary(spark, tmp_path_factory):
    """A corpus whose words collapse to single symbols before _BPE_ROUNDS
    merges must NOT empty the vocabulary (the pre-guard behavior: an
    empty winner cross-joined the vocab away and every downstream
    aggregate went NULL). 'ab ab ab' merges once, then no pairs remain:
    induction reports only round 1 and segmentation stays real — and the
    DuckDB oracle (LEFT JOIN win ON TRUE) agrees on BOTH engines."""
    path = str(tmp_path_factory.mktemp("bpe_degen") / "lake")
    rows = [(1, "ab ab ab", "en", "src0", 8)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")

    induct = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_cnt)
        for r in curation.bpe_vocab_induction(spark, path).collect()
    ]
    assert induct == [(1, "a", "b", "ab", 3)]
    seg = curation.bpe_learned_segmentation(spark, path).collect()[0]
    # 3 words, 6 chars, 3 one-token words after the single merge
    assert (seg.n_words, seg.char_tokens, seg.bpe_tokens) == (3, 6, 3)
    assert seg.compression_ppm == 3 * 1000000 // 6

    # oracle parity on the degenerate corpus (the driver only runs the
    # oracle on the synthetic corpus, which always achieves _BPE_ROUNDS)
    oracle_induct = _duck_on(path, curation.QUERIES["bpe_vocab_induction"][1])
    assert [tuple(r) for r in oracle_induct] == induct
    oracle_seg = _duck_on(path, curation.QUERIES["bpe_learned_segmentation"][1])
    assert oracle_seg[0][:3] == (3, 6, 3)


def test_bpe_no_pairs_at_all_is_identity(spark, tmp_path_factory):
    """All-single-char corpus: zero merge rounds fire; induction is empty
    and segmentation is the identity tokenization on both engines."""
    path = str(tmp_path_factory.mktemp("bpe_single") / "lake")
    rows = [(1, "a b c a b", "en", "src0", 9)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    assert curation.bpe_vocab_induction(spark, path).count() == 0
    seg = curation.bpe_learned_segmentation(spark, path).collect()[0]
    assert (seg.n_words, seg.char_tokens, seg.bpe_tokens) == (5, 5, 5)
    assert seg.compression_ppm == 1000000
    assert _duck_on(path, curation.QUERIES["bpe_vocab_induction"][1]) == []
    oracle_seg = _duck_on(path, curation.QUERIES["bpe_learned_segmentation"][1])
    assert oracle_seg[0][:3] == (5, 5, 5)


def test_dsir_selects_target_like_content_not_labels(spark, tmp_path_factory):
    """DSIR's point: importance weights rank RAW docs by how target-like
    their CONTENT is, regardless of label. Target slice = lang 'en'
    (vocabulary A). A lang-'xx' doc written in vocabulary A must outscore
    (in logw) every lang-'xx' doc written in vocabulary B; the en docs
    themselves score high. Weights are deterministic decimals, so the
    ordering is stable across runs."""
    path = str(tmp_path_factory.mktemp("dsir") / "lake")
    va = " ".join(f"alpha{i}" for i in range(30))
    vb = " ".join(f"beta{i}" for i in range(30))
    rows = (
        [(i, va, "en", "s", 0) for i in range(8)]          # target: vocab A
        + [(100, va, "xx", "s", 0)]                        # raw doc, vocab A
        + [(200 + i, vb, "xx", "s", 0) for i in range(8)]  # raw docs, vocab B
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in curation.dsir_select(spark, path).collect()}
    assert len(out) == 17  # K > corpus: everything returned, ranked
    # the vocab-A impostor outweighs every vocab-B doc
    assert all(out[100].logw > out[d].logw for d in out if d >= 200)
    # and matches the en docs' weight (same content => same logw)
    assert out[100].logw == out[0].logw
    # determinism: a second invocation produces the identical ranking
    again = {r.doc_id: r.rnk for r in curation.dsir_select(spark, path).collect()}
    assert again == {d: r.rnk for d, r in out.items()}


def test_vocab_growth_duplication_depresses_beta(spark, tmp_path_factory):
    """Heaps' beta separates a type-minting corpus from a duplicated one:
    40 docs of all-fresh tokens fit beta near 1, 40 docs repeating one
    10-token template sit near 0; cumulative counts are monotone and the
    final vocab equals the exact distinct-token count."""
    def corpus(rows, name):
        path = str(tmp_path_factory.mktemp(name) / "lake")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        return path

    fresh = corpus(
        [(i, " ".join(f"w{i}_{j}" for j in range(10)), "en", "s", 0)
         for i in range(40)],
        "heaps_fresh",
    )
    dup = corpus(
        [(i, " ".join(f"t{j}" for j in range(10)), "en", "s", 0)
         for i in range(40)],
        "heaps_dup",
    )
    f_rows = curation.vocab_growth_curve(spark, fresh).collect()
    d_rows = curation.vocab_growth_curve(spark, dup).collect()
    assert [r.slice for r in f_rows] == list(range(10))
    assert f_rows[-1].vocab_cum == 400 and d_rows[-1].vocab_cum == 10
    assert all(a.vocab_cum <= b.vocab_cum for a, b in zip(f_rows, f_rows[1:]))
    assert f_rows[0].heaps_beta > 0.95          # every token new
    assert d_rows[0].heaps_beta < 0.05          # vocab flat after slice 0


def _write_min_docs(spark, tmp_path_factory, name, rows):
    path = str(tmp_path_factory.mktemp(name) / "lake")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_char_entropy_known_answers(spark, tmp_path_factory):
    """Single-character spam scores exactly 0; a 4-character uniform doc
    scores exactly ln(4) (at the 4-decimal rounding); byte-identical docs
    score identically; diversity orders above repetition."""
    import math

    path = _write_min_docs(
        spark,
        tmp_path_factory,
        "entropy",
        [
            (1, "aaaaaaaa", "en", "s0", 8),
            (2, "abcd", "en", "s0", 4),
            (3, "aaaaaaaa", "en", "s0", 8),
            (4, "aabb", "en", "s0", 4),
        ],
    )
    out = {r.doc_id: r for r in curation.char_entropy_quality(spark, path).collect()}
    assert out[1].entropy_nats == 0.0
    assert out[1].n_distinct_chars == 1 and out[1].n_chars == 8
    assert out[2].entropy_nats == round(math.log(4), 4)
    assert out[3].entropy_nats == out[1].entropy_nats
    assert out[4].entropy_nats == round(math.log(2), 4)
    assert out[2].entropy_nats > out[4].entropy_nats > out[1].entropy_nats


def test_collocation_pmi_finds_planted_phrase(spark, tmp_path_factory):
    """A pair that ALWAYS co-occurs ("san francisco") must out-PMI filler
    pairs whose words also appear in other contexts; pairs under the
    min-support floor must not appear at all."""
    filler = "red blue red green blue red"
    rows = [
        (i, f"san francisco {filler} san francisco {filler}", "en", "s0", 0)
        for i in range(6)
    ]
    # one rare pair, below the min-count floor of 5
    rows.append((99, "rare pairx", "en", "s0", 0))
    path = _write_min_docs(spark, tmp_path_factory, "pmi", rows)
    out = curation.collocation_pmi(spark, path).collect()
    grams = [r.gram for r in out]
    assert "san francisco" in grams
    assert "rare pairx" not in grams
    by = {r.gram: r for r in out}
    sf = by["san francisco"]
    assert sf.pair_count == 12
    # "san" only ever precedes "francisco": PMI must top every filler pair
    fillers = [r.pmi for r in out if r.gram != "san francisco"]
    assert all(sf.pmi > p for p in fillers)


def test_readability_exact_formula_and_floors(spark, tmp_path_factory):
    """Known-answer Flesch in milli-units, including the min-1-syllable
    rule for vowel-free words and floor (not truncate-toward-zero)
    semantics for the negative scores word-soup produces."""
    import math

    path = _write_min_docs(
        spark,
        tmp_path_factory,
        "readability",
        [
            (1, "The cat sat. The dog ran.", "en", "s0", 0),
            (2, "zz zz zz", "en", "s0", 0),  # vowel-free: 1 syllable each
            (3, " ".join(["soup"] * 300), "en", "s0", 0),  # run-on word soup
        ],
    )
    out = {r.doc_id: r for r in curation.readability_score(spark, path).collect()}
    r1 = out[1]
    # 6 words; two ".": s = 2 + 1 = 3; each word one vowel group = 6 syllables
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 3, 6)
    w, s, syl = 6, 3, 6
    assert r1.flesch_milli == math.floor(
        (206835 * s * w - 1015 * w * w - 84600 * syl * s) / (s * w)
    )
    r2 = out[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (3, 1, 3)
    w, s, syl = 3, 1, 3
    assert r2.flesch_milli == math.floor(
        (206835 * s * w - 1015 * w * w - 84600 * syl * s) / (s * w)
    )
    # 300 unpunctuated words: 206.835 - 1.015*300 - 84.6*1 is deeply
    # negative — pins floor (not truncate-toward-zero) semantics
    r3 = out[3]
    assert (r3.n_words, r3.n_sentences, r3.n_syllables) == (300, 1, 300)
    w, s, syl = 300, 1, 300
    expected = (206835 * s * w - 1015 * w * w - 84600 * syl * s) / (s * w)
    assert expected < 0
    assert r3.flesch_milli == math.floor(expected)


def test_rendezvous_resize_moves_only_into_new_shard(spark, tmp_path_factory):
    """The HRW property: growing 16 -> 17 shards may only move a document
    INTO the new shard (its scores for shards 0..15 are unchanged, so a
    different winner must be the new candidate); assignments cover the
    shard range and are deterministic."""
    from pyspark.sql import functions as F

    path = _write_min_docs(
        spark,
        tmp_path_factory,
        "hrw",
        [(i, f"doc {i}", "en", "s0", 5) for i in range(400)],
    )
    d = spark.read.parquet(f"{path}/documents.parquet")
    a = d.select(
        "doc_id",
        F.expr(curation._hrw_list_expr(curation._HRW_K)).alias("h16"),
        F.expr(curation._hrw_list_expr(curation._HRW_K + 1)).alias("h17"),
    ).select(
        "doc_id",
        (F.expr("array_position(h16, array_max(h16))") - 1).alias("s16"),
        (F.expr("array_position(h17, array_max(h17))") - 1).alias("s17"),
    )
    rows = a.collect()
    assert all(0 <= r.s16 < curation._HRW_K for r in rows)
    moved = [r for r in rows if r.s16 != r.s17]
    assert moved, "a 400-doc corpus should move ~1/17 of docs"
    assert all(r.s17 == curation._HRW_K for r in moved)
    # ~1/17 expected; generous envelope that still catches mod-style reshuffles
    assert len(moved) / len(rows) < 0.15
    out = {r.shard: r for r in curation.rendezvous_shards(spark, path).collect()}
    assert sum(r.n_docs for r in out.values()) == 400
    assert sum(r.n_moved for r in out.values()) == len(moved)


def test_lsh_band_sweep_nesting_and_recall_ceiling(spark, tmp_path_factory):
    """Candidate/true counts are NESTED across the 2x4 -> 4x2 -> 8x1
    configs (agreeing on an r-row band implies agreeing on its
    sub-bands); the 8x1 row is the recall ceiling (exactly 1e6 ppm); a
    planted exact duplicate is found by every config."""
    from bridgedownstream_spark.queries import similarity

    body = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"alt{i}" for i in range(30))
    rows = [
        (1, body, "en", "s0", 0),
        (2, body, "en", "s0", 0),           # exact dup of 1
        (3, other, "en", "s0", 0),
        (4, other + " tail0 tail1 tail2", "en", "s0", 0),  # near dup of 3
    ]
    path = _write_min_docs(spark, tmp_path_factory, "sweep", rows)
    out = {r.bands: r for r in similarity.lsh_band_sweep(spark, path).collect()}
    assert set(out) == {2, 4, 8}
    assert out[2].n_candidates <= out[4].n_candidates <= out[8].n_candidates
    assert out[2].n_true <= out[4].n_true <= out[8].n_true
    assert out[8].recall_vs_max_ppm == 1000000
    # the exact dup agrees on every minhash -> a candidate at EVERY config
    assert out[2].n_true >= 1
    assert all(r.precision_ppm <= 1000000 for r in out.values())
    assert all(r.n_true <= r.n_candidates for r in out.values())


def test_ipf_raking_fixed_point_and_convergence(spark, tmp_path_factory):
    """A uniform contingency table is an EXACT fixed point (every factor
    is 1e9, weights unchanged); a skewed-but-symmetric table rakes to
    near-uniform marginals with symmetric weights."""
    # uniform 2x2: one doc per cell
    rows = [
        (i, f"doc {i}", lang, src, 5)
        for i, (lang, src) in enumerate(
            (l, s) for l in ("en", "de") for s in ("s0", "s1")
        )
    ]
    path = _write_min_docs(spark, tmp_path_factory, "ipf_u", rows)
    out = curation.ipf_raking(spark, path).collect()
    assert all(r.weight_micro == r.n_docs * 1000000 for r in out)
    assert all(r.factor_ppm == 1000000 for r in out)

    # skewed symmetric 2x2: [[1,3],[3,1]] -> IPF converges to equal
    # marginals; symmetry of the input forces symmetric weights
    rows2, i = [], 0
    for lang, src, k in (("en", "s0", 1), ("en", "s1", 3),
                         ("de", "s0", 3), ("de", "s1", 1)):
        for _ in range(k):
            rows2.append((i, f"doc {i}", lang, src, 5))
            i += 1
    path2 = _write_min_docs(spark, tmp_path_factory, "ipf_s", rows2)
    out2 = {(r.lang, r.source): r for r in curation.ipf_raking(spark, path2).collect()}
    total = sum(r.weight_micro for r in out2.values())
    for lang in ("en", "de"):
        s = sum(r.weight_micro for (l, _), r in out2.items() if l == lang)
        assert abs(s - total / 2) <= total * 0.01
    for src in ("s0", "s1"):
        s = sum(r.weight_micro for (_, sr), r in out2.items() if sr == src)
        assert abs(s - total / 2) <= total * 0.01
    assert out2[("en", "s0")].weight_micro == out2[("de", "s1")].weight_micro
    assert out2[("en", "s1")].weight_micro == out2[("de", "s0")].weight_micro


def test_loo_source_influence_known_answer(spark, tmp_path_factory):
    """sA: two 10-token docs; sB: one 40-token doc. Removing sB drops the
    mean from 20 to 10 tokens; removing sA raises it to 40."""
    rows = [
        (1, " ".join(["w"] * 10), "en", "sA", 0),
        (2, " ".join(["w"] * 10), "en", "sA", 0),
        (3, " ".join(["w"] * 40), "en", "sB", 0),
    ]
    path = _write_min_docs(spark, tmp_path_factory, "loo", rows)
    out = {r.source: r for r in curation.loo_source_influence(spark, path).collect()}
    assert out["sA"].mean_with_milli == 20000
    assert out["sA"].mean_without_milli == 40000
    assert out["sA"].influence_milli == 20000
    assert out["sB"].mean_without_milli == 10000
    assert out["sB"].influence_milli == -10000


def test_quantile_normalize_equi_percentile(spark, tmp_path_factory):
    """Two sources with disjoint scales: values at the SAME within-source
    percentile map to the SAME global value (that is the calibration
    property), and normalization is monotone within each source."""
    rows, i = [], 0
    for v in (10, 20, 30):
        rows.append((i, "x", "en", "sA", v)); i += 1
    for v in (100, 200, 300):
        rows.append((i, "x", "en", "sB", v)); i += 1
    path = _write_min_docs(spark, tmp_path_factory, "qnorm", rows)
    out = {(r.source, r.raw_value): r
           for r in curation.quantile_normalize_sources(spark, path).collect()}
    assert len(out) == 6
    for va, vb in ((10, 100), (20, 200), (30, 300)):
        a, b = out[("sA", va)], out[("sB", vb)]
        assert a.source_pct_bp == b.source_pct_bp
        assert a.normalized_value == b.normalized_value
    for src, vals in (("sA", (10, 20, 30)), ("sB", (100, 200, 300))):
        ns = [out[(src, v)].normalized_value for v in vals]
        assert ns == sorted(ns)
