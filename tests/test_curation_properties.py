"""Property tests for the chunking/packing operators: chunk reconstruction
and pack-offset arithmetic hold for arbitrary corpora, not just the
testdata."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# a "document" is a list of tokens over a tiny alphabet (collisions likely,
# empty docs allowed)
_token = st.text(alphabet="abX9", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=1, max_size=8)

_W, _S = 32, 24  # must match queries/curation.py
_BUDGET = 2048


def _chunk_rows(spark, docs):
    from bridgedownstream_spark.queries.curation import doc_chunking

    df = spark.createDataFrame(
        [(i, " ".join(d), "src") for i, d in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    import bridgedownstream_spark.queries.curation as cur
    import bridgedownstream_spark.queries.util as util

    orig = util.tbl
    util.tbl = cur.tbl = lambda spark, sf_dir, name: df
    try:
        return doc_chunking(spark, "ignored").collect()
    finally:
        util.tbl = cur.tbl = orig


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_chunks_cover_and_reconstruct(spark, docs):
    rows = _chunk_rows(spark, docs)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    for i, d in enumerate(docs):
        # Spark split() of "" yields [""], matching the SQL twin: an empty
        # doc is one empty-token chunk
        toks = " ".join(d).split(" ") if d else [""]
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # chunk grid: idx dense from 0, starts at 1 + idx*stride
        for k, c in enumerate(chunks):
            assert c["chunk_idx"] == k
            assert c["start_tok"] == 1 + k * _S
            want = toks[k * _S : k * _S + _W]
            assert c["n_tokens"] == len(want)
        # coverage: last chunk reaches the end of the doc
        last = chunks[-1]
        assert last["start_tok"] - 1 + last["n_tokens"] >= len(toks)
        # adjacent chunks overlap by exactly W - S tokens (when full)
        for a, b in zip(chunks, chunks[1:]):
            if a["n_tokens"] == _W:
                assert (a["start_tok"] + a["n_tokens"]) - b["start_tok"] == _W - _S


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_pack_offsets_are_cumsum(spark, docs):
    from bridgedownstream_spark.queries.curation import pack_sequences
    import bridgedownstream_spark.queries.curation as cur
    import bridgedownstream_spark.queries.util as util

    df = spark.createDataFrame(
        [(i, " ".join(d), f"s{i % 2}") for i, d in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    orig = util.tbl
    util.tbl = cur.tbl = lambda spark, sf_dir, name: df
    try:
        rows = pack_sequences(spark, "ignored").collect()
    finally:
        util.tbl = cur.tbl = orig

    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_pack = 0
        for r in rs:
            assert r["pack_id"] == cum // _BUDGET
            assert r["pack_offset"] == cum % _BUDGET
            assert r["pack_id"] >= prev_pack  # packs fill monotonically
            prev_pack = r["pack_id"]
            cum += r["n_tokens"]
