"""Hand-computed goldens for the round-9 additions: exact substring
dedup (sliding-window span union), the curation pipeline composition,
Cohen's kappa, NDCG/MRR retrieval eval, and the sampled band sweep's
gate arithmetic. The oracle gate certifies these against DuckDB at
sf0.01; these pin corners + hand-derivable values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridgedownstream_spark.queries import advanced, curation, llm, similarity


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


W16 = " ".join(f"w{i}" for i in range(16))  # one exact 16-token window


def test_exact_substring_dedup_span_union(spark, tmp_path_factory):
    """Two docs share one 16-token run embedded at different offsets
    (alignment-free detection); a third doc is unique. The shared run
    yields exactly ONE duplicated window per doc (tokens all distinct),
    covering exactly 16 tokens."""
    path = str(tmp_path_factory.mktemp("xsub") / "lake")
    d1 = "alpha beta " + W16 + " gamma"            # 19 tokens, run at pos 3
    d2 = W16 + " delta epsilon"                    # 18 tokens, run at pos 1
    d3 = " ".join(f"u{i}" for i in range(20))      # unique
    _write_docs(spark, path, [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
    ])
    out = {r.doc_id: r for r in curation.exact_substring_dedup(spark, path).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].n_tokens, out[1].n_windows) == (19, 4)
    assert (out[1].n_dup_windows, out[1].dup_tokens) == (1, 16)
    assert out[1].dup_ppm == 16 * 1_000_000 // 19
    assert (out[2].n_dup_windows, out[2].dup_tokens) == (1, 16)
    assert (out[3].n_dup_windows, out[3].dup_tokens, out[3].dup_ppm) == (0, 0, 0)


def test_exact_substring_dedup_overlapping_spans_merge(spark, tmp_path_factory):
    """A 17-token shared run produces TWO overlapping duplicated windows
    (starts 1 and 2): the span union must count 17 covered tokens, not 32
    — the min(W, next-start) interval-merge closed form."""
    path = str(tmp_path_factory.mktemp("xsub2") / "lake")
    run17 = W16 + " w16"
    _write_docs(spark, path, [
        (1, run17, "en", "s", len(run17)),
        (2, run17 + " tail", "en", "s", 0),
    ])
    out = {r.doc_id: r for r in curation.exact_substring_dedup(spark, path).collect()}
    assert out[1].n_dup_windows == 2
    assert out[1].dup_tokens == 17
    assert out[1].dup_ppm == 1_000_000  # whole doc covered


def test_exact_substring_short_docs_emit_no_windows(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xsub3") / "lake")
    _write_docs(spark, path, [
        (1, "a b c", "en", "s", 5),
        (2, "a b c", "en", "s", 5),
    ])
    out = {r.doc_id: r for r in curation.exact_substring_dedup(spark, path).collect()}
    # identical docs but < 16 tokens: zero windows, zero coverage, rows kept
    assert out[1].n_windows == 0 and out[1].dup_tokens == 0
    assert out[2].n_windows == 0


def test_curation_pipeline_e2e_stages_compose(spark, tmp_path_factory):
    """Dedup keeps the lowest doc_id; the quality gate drops short docs;
    rebalance at uniform-minority keeps everything when sources are
    balanced post-gate; id_sum certifies the surviving set."""
    path = str(tmp_path_factory.mktemp("ce2e") / "lake")
    good = " ".join(f"tok{i}" for i in range(20))  # 20 toks, len in [50,5000]
    _write_docs(spark, path, [
        (1, good, "en", "sa", len(good)),
        (2, good, "en", "sa", len(good)),        # exact dup of 1 -> dropped
        (3, "tiny", "en", "sa", 4),              # fails length gate
        (4, good + " extra", "en", "sb", 0),     # unique, passes
    ])
    rows = curation.curation_pipeline_e2e(spark, path).collect()
    ids = sum(r.id_sum for r in rows)
    n = sum(r.n_docs for r in rows)
    # survivors of dedup+quality are docs 1 and 4, one per source — so
    # uniform-at-minority rebalance computes rate_ppb = 10^9 for both
    # sources and the gate (hash % 10^9 < 10^9) keeps everything
    assert n == 2 and ids == 5
    for r in rows:
        assert r.split in ("train", "val", "test")


def test_cohens_kappa_identity_and_bounds(spark, tmp_path_factory):
    """Hand-computed 2x2: kappa follows (po-pe)/(1-pe) exactly in ppm."""
    path = str(tmp_path_factory.mktemp("kappa") / "lake")
    # 'the' makes rater A (language known) fire; length>=50 chars AND
    # >=10 tokens makes rater B fire; lowercase keeps punct ratio 0
    both = "the " + " ".join(f"abcde{i}" for i in range(12))
    neither = "zz xx yy"
    _write_docs(spark, path, [
        (1, both, "en", "s", len(both)),
        (2, both, "en", "s", len(both)),
        (3, neither, "en", "s", len(neither)),
        (4, "the zz", "en", "s", 6),  # A yes (stopword), B no (too short)
    ])
    r = llm.cohens_kappa(spark, path).collect()[0]
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (4, 2, 1, 0, 1)
    po_num, pe_num = (2 + 1) * 4, (2 + 1) * (2 + 0) + (0 + 1) * (1 + 1)
    # kappa = (po*n - pe_num) / (n*n - pe_num) in ppm
    assert r.kappa_ppm == (po_num - pe_num) * 1_000_000 // (16 - pe_num)
    assert r.po_ppm == 3 * 1_000_000 // 4


def test_ndcg_perfect_ranking_is_one(spark, tmp_path_factory):
    """If BM25's ranking equals the ideal ranking for a term, its
    ndcg_ppm is exactly 1,000,000; MRR hits rank 1."""
    path = str(tmp_path_factory.mktemp("ndcg") / "lake")
    # same dl everywhere -> single-term BM25 is monotone in tf ->
    # system ranking == ideal ranking
    def doc(n_hits, i):
        toks = ["spark"] * n_hits + [f"pad{i}_{j}" for j in range(12 - n_hits)]
        return (i, " ".join(toks), "en", "s", 60)
    _write_docs(spark, path, [doc(4, 1), doc(3, 2), doc(2, 3), doc(1, 4)])
    out = {r.term: r for r in llm.retrieval_eval_ndcg(spark, path).collect()}
    r = out["spark"]
    # rel = min(tf-1, 3): doc1 rel 3, doc2 rel 2, doc3 rel 1, doc4 rel 0
    assert r.n_relevant == 3
    assert r.ndcg_ppm == 1_000_000
    assert r.mrr_ppm == 1_000_000
    # absent terms still emit a row with zeroed metrics
    assert out["window"].n_relevant == 0 and out["window"].ndcg_ppm == 0


def test_band_sweep_sampled_equals_full_when_corpus_fits(spark):
    """At oracle scale (500 docs <= sample target) the ppb gate passes
    every doc: sampled sweep == full sweep row-for-row."""
    sf = "/root/testdata/sf0.001"
    full = {(r.bands, r.rows_per_band): r
            for r in similarity.lsh_band_sweep(spark, sf).collect()}
    samp = {(r.bands, r.rows_per_band): r
            for r in similarity.lsh_band_sweep_sampled(spark, sf).collect()}
    assert full.keys() == samp.keys()
    for k in full:
        assert full[k].asDict() == samp[k].asDict(), k


def test_band_sweep_sampled_gates_fixed_size(spark):
    """At sf0.1 (5000 docs) the gate keeps ~2000 docs: the sampled
    sweep's 8x1 candidate volume must be well below the full sweep's."""
    sf = "/root/testdata/sf0.1"
    full = {(r.bands, r.rows_per_band): r.n_candidates
            for r in similarity.lsh_band_sweep(spark, sf).collect()}
    samp = {(r.bands, r.rows_per_band): r.n_candidates
            for r in similarity.lsh_band_sweep_sampled(spark, sf).collect()}
    assert samp[(8, 1)] < full[(8, 1)]
    assert samp[(8, 1)] > 0


def test_chao1_hand_computed(spark, tmp_path_factory):
    """tokens {a:2, b:1}: V=2, N=3, f1=1, f2=1 -> chao1 = V + f1(f1-1)/
    (2(f2+1)) = 2; Good-Turing unseen mass = f1/N; hapax share = f1/V."""
    path = str(tmp_path_factory.mktemp("chao1") / "lake")
    _write_docs(spark, path, [(1, "a a b", "en", "s", 5)])
    r = curation.chao1_vocab_richness(spark, path).collect()[0]
    assert (r.vocab_size, r.total_tokens, r.n_hapax, r.n_dis) == (2, 3, 1, 1)
    assert r.chao1_est == 2
    assert r.unseen_mass_ppm == 1_000_000 // 3
    assert r.hapax_ppm == 500_000


def test_conformal_bound_invariants(spark):
    """On real events: the split partitions the corpus; the rank follows
    ceil((1-a)(n_cal+1)) clamped; the empirical flag rate respects the
    distribution-free <= alpha guarantee (with sampling slack)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    r = advanced.conformal_anomaly_bound(spark, sf).collect()[0]
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert r.n_cal + r.n_test == n_events
    assert r.cal_rank == min((9 * (r.n_cal + 1) + 9) // 10, r.n_cal)
    # exchangeable halves: flag rate concentrates at <= 10%; allow slack
    assert 0 <= r.flag_ppm <= 170_000
    assert r.n_flagged <= r.n_test


def test_split_contamination_counts_shared_grams(spark, tmp_path_factory):
    """All-identical docs: every test doc's grams exist in train (as long
    as both splits are populated), so gram contamination is 1e6."""
    path = str(tmp_path_factory.mktemp("contam") / "lake")
    body = " ".join(f"t{i}" for i in range(12))
    _write_docs(spark, path, [(i, body, "en", "s", 60) for i in range(60)])
    r = curation.split_contamination(spark, path).collect()[0]
    assert r.n_test_docs > 0          # md5 split lands some of 60 in test
    assert r.n_test_grams == r.n_test_docs * 5  # 12 toks -> 5 distinct 8-grams
    assert r.gram_contamination_ppm == 1_000_000
    assert r.doc_contamination_ppm == 1_000_000


def test_embedding_anisotropy_extremes(spark, tmp_path_factory):
    """Identical vectors -> anisotropy 1e6 and the dominant dim carries
    its exact share; antipodal pairs -> mean 0 -> anisotropy 0."""
    path = str(tmp_path_factory.mktemp("aniso") / "lake")

    def write(vecs):
        spark.createDataFrame(
            [(i, v, 0) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>, label int",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
        return path

    same = [[1.0, 2.0, 0.0]] * 4
    r = similarity.embedding_anisotropy(spark, write(same)).collect()[0]
    assert (r.n_vectors, r.dim) == (4, 3)
    assert r.anisotropy_ppm == 1_000_000
    assert r.dominant_dim == 2          # component 2.0 dominates (1-based)
    assert r.dominant_share_ppm == 4 * 1_000_000 // 5  # 2^2 / (1+4)

    anti = [[1.0, -1.0, 0.5], [-1.0, 1.0, -0.5]]
    r2 = similarity.embedding_anisotropy(spark, write(anti)).collect()[0]
    assert r2.anisotropy_ppm == 0
