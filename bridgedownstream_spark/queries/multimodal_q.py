"""Multimodal-column queries: binary payloads synthesized deterministically
from the documents table (utf-8 text bytes as the media stand-in), pushed
through the real Pandas-UDF plumbing, and oracle-checked by recomputing the
md5-derived stub outputs in DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridgedownstream_spark.operators.multimodal import decode_images, extract_features
from bridgedownstream_spark.queries.util import tbl

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _payloads(spark, sf_dir):
    """documents.text encoded to binary — the deterministic media corpus."""
    return tbl(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )


@q(
    "multimodal_decode",
    """
    SELECT doc_id,
           'fake/deterministic' AS format,
           CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 640 + 1 AS INT)  AS width,
           CAST(('0x' || substr(md5(text), 16, 15))::BIGINT % 480 + 1 AS INT) AS height,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    # Binary column + mapInPandas decode (stubbed codec): the oracle
    # recomputes the md5-derived stub metadata, proving the payload bytes,
    # batch plumbing, and struct schema all round-trip correctly.
    decoded = decode_images(_payloads(spark, sf_dir), codec="stub")
    return decoded.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@q(
    "multimodal_features",
    """
    SELECT doc_id,
           round(('0x' || substr(md5(text), 1, 2))::BIGINT / 255.0, 6) AS f0,
           round(('0x' || substr(md5(text), 3, 2))::BIGINT / 255.0, 6) AS f1,
           round(('0x' || substr(md5(text), 5, 2))::BIGINT / 255.0, 6) AS f2,
           round(('0x' || substr(md5(text), 7, 2))::BIGINT / 255.0, 6) AS f3
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    # Feature extraction over binary payloads (stub encoder): first md5
    # bytes scaled to [0,1]; divisions by 255 are exact in doubles, so
    # round(6) matches bit-for-bit.
    feats = extract_features(_payloads(spark, sf_dir), dim=4, codec="stub")
    return feats.select(
        "doc_id",
        *[
            F.round(F.col("features").getItem(i), 6).alias(f"f{i}")
            for i in range(4)
        ],
    )


@q(
    "multimodal_frame_sample",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_frames,
           CAST(len(list_filter(range(len(string_split(text, ' '))),
                                i -> i % 3 = 0)) AS INT) AS n_sampled
    FROM documents
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    # Video-like array<binary> frame sampling: every 3rd frame via the
    # native filter HOF (no Python in the loop); frames synthesized as the
    # per-word byte payloads of the text.
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("transform(split(text, ' '), w -> encode(w, 'utf-8'))").alias("frames"),
    )
    from bridgedownstream_spark.operators.multimodal import sample_frames

    sampled = sample_frames(d.withColumn("n_frames", F.size("frames")), every_n=3)
    return sampled.select(
        "doc_id", "n_frames", F.size("frames").alias("n_sampled")
    )


@q(
    "multimodal_resize",
    """
    SELECT doc_id,
           'fake/resized' AS format,
           320 AS width, 240 AS height,
           CAST(768 AS BIGINT) AS n_bytes,
           md5(text) AS head_hex
    FROM documents
    """,
)
def multimodal_resize(spark, sf_dir):
    # Resize preprocessing (stub resample): payload replaced by a
    # target-proportional rendition (320*240/100 = 768 bytes = the md5
    # digest cycled 48x). The oracle pins the post-resize metadata and the
    # first 16 payload bytes (= the digest), proving the binary-out
    # contract survives the Arrow round-trip byte-exactly.
    from bridgedownstream_spark.operators.multimodal import resize_images

    resized = resize_images(
        _payloads(spark, sf_dir), width=320, height=240, codec="stub"
    )
    return resized.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(content, 1, 16)"))).alias("head_hex"),
    )


_PHASH_DUCK = """
    WITH b AS (
      SELECT doc_id,
             list_transform(generate_series(0, 15),
                            i -> ('0x' || substr(md5(text), 2*i+1, 2))::BIGINT)
                 AS bl
      FROM documents
    ),
    m AS (SELECT doc_id, bl, list_sum(bl) / 16.0 AS mean FROM b),
    p AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 15),
                  i -> CASE WHEN bl[i+1] > mean THEN 1 << i ELSE 0 END))
                  AS BIGINT) AS phash
      FROM m
    )
"""


@q(
    "media_phash_pairs",
    _PHASH_DUCK + """
    , bands AS (
        SELECT doc_id, phash, 0 AS band, phash >> 10 AS bv FROM p
        UNION ALL SELECT doc_id, phash, 1, (phash >> 5) & 31 FROM p
        UNION ALL SELECT doc_id, phash, 2, phash & 31 FROM p
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa,
                        c.doc_id AS doc_b, c.phash AS pb
        FROM bands a JOIN bands c
          ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(pa, pb)) <= 2
    """,
)
def media_phash_pairs(spark, sf_dir):
    # Perceptual-hash media dedup: binary payloads → 16-bit aHash
    # (operators/multimodal.py::perceptual_hash, Pandas-UDF over the
    # stubbed decode) → candidates via 3-BAND PIGEONHOLE → hamming verify
    # with native bit_count(a ^ b). Banding, not a single top-byte bucket:
    # for a hamming-≤2 match, at most 2 bits differ, so the pair agrees
    # EXACTLY on at least one of 3 disjoint bands (pigeonhole) — the
    # equi-join on (band, band_value) therefore has full recall, where a
    # top-byte bucket silently missed every pair whose differing bits fell
    # in the top byte AND made the join key just 256-valued (N²/256 hidden
    # quadratic growth). A production pHash is 64-bit with the same plan
    # shape (3 bands of ~21 bits — join keys rich enough that candidates
    # track true near-dups); the 16-bit stub keeps the oracle recomputable.
    # Exact-dup documents share payloads, so planted dups pair at
    # hamming 0; band collisions exercise the 1-2-bit verify band.
    from bridgedownstream_spark.operators.multimodal import perceptual_hash

    hashed = perceptual_hash(_payloads(spark, sf_dir), codec="stub").select(
        "doc_id", "phash"
    )
    bands = hashed.selectExpr(
        "doc_id",
        "phash",
        "stack(3, 0, phash >> 10, 1, (phash >> 5) & 31, 2, phash & 31)"
        " AS (band, bv)",
    )
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bv") == F.col("c.bv"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.phash").alias("pa"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("c.phash").alias("pb"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(pa ^ pb)")
    return cand.where(ham <= 2).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


@q(
    "multimodal_real_codec",
    """
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             doc_id % 7 = 0 AS broken
      FROM documents
      WHERE octet_length(encode(text)) >= 60
    ), dims AS (
      SELECT doc_id, n, broken,
             CAST(n % 4 + 2 AS BIGINT) AS w, CAST(n % 3 + 2 AS BIGINT) AS h,
             hex(encode(text)) AS hx
      FROM d
    ), px AS (
      SELECT doc_id, n, broken, w, h,
             list_transform(generate_series(0, w*h - 1),
                p -> (('0x' || substr(hx, 6*p + 1, 2))::BIGINT * 299
                    + ('0x' || substr(hx, 6*p + 3, 2))::BIGINT * 587
                    + ('0x' || substr(hx, 6*p + 5, 2))::BIGINT * 114) // 1000
             ) AS luma
      FROM dims
    ), grid AS (
      SELECT doc_id, n, broken, w, h, luma,
             list_transform(generate_series(0, 15),
                i -> luma[ least(h - 1, (i // 4) * h // 4) * w
                         + least(w - 1, (i % 4) * w // 4) + 1 ]) AS g
      FROM px
    )
    SELECT doc_id,
           CASE WHEN broken THEN 'undecodable' ELSE 'ppm' END AS format,
           CAST(CASE WHEN broken THEN 0 ELSE w END AS INT) AS width,
           CAST(CASE WHEN broken THEN 0 ELSE h END AS INT) AS height,
           CAST(CASE WHEN broken THEN n + 11 ELSE 11 + w*h*3 END AS BIGINT)
               AS n_bytes,
           CAST(CASE WHEN broken THEN 0 ELSE
             list_sum(list_transform(generate_series(0, 15),
               i -> CASE WHEN g[i+1] > list_sum(g) / 16.0
                    THEN 1 << i ELSE 0 END))
           END AS BIGINT) AS phash,
           round(CASE WHEN broken THEN 0 ELSE luma[1] END / 255.0, 6) AS f0,
           round(CASE WHEN broken THEN 0
                 ELSE luma[least(w - 1, w // 2) + 1] END / 255.0, 6) AS f1,
           round(CASE WHEN broken THEN 0
                 ELSE luma[least(h - 1, h // 2) * w + 1] END / 255.0, 6) AS f2,
           round(CASE WHEN broken THEN 0
                 ELSE luma[least(h - 1, h // 2) * w + least(w - 1, w // 2) + 1]
                 END / 255.0, 6) AS f3
    FROM grid
    """,
)
def multimodal_real_codec(spark, sf_dir):
    """REAL-codec certification row (no digest stand-ins anywhere): PPM
    bitmaps are synthesized NATIVELY (header + the doc's first w*h*3
    utf-8 bytes as RGB triples, w/h derived from the byte length; every
    7th doc gets a deliberately headerless payload), then pushed through
    the vendored real decode path — ``decode_images(codec="mini")``
    header parse + body validation, ``perceptual_hash(codec="mini")``
    (decode → ITU-R 601 grayscale → 4×4 nearest-neighbor grid →
    above-mean aHash bits), ``extract_features(codec="mini")`` (decode →
    2×2 resample → luma/255). The oracle recomputes pixels, lumas, grid
    positions, the /16.0 mean threshold, and the bit packing from the
    same bytes in SQL — so the REAL decode branch (the one a PIL/libvips
    deployment swaps its codec into) gets a driver-certifiable
    rows+schema+hash row, including the undecodable contract (format
    'undecodable', zero dims, phash 0, zero features). All-integer until
    the final exact /255.0 and /16.0 steps; Arrow-batched mapInPandas,
    scan-shaped (zero exchanges)."""
    from bridgedownstream_spark.operators.multimodal import (
        decode_images,
        extract_features,
        perceptual_hash,
    )

    d = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.expr("octet_length(encode(text, 'utf-8')) >= 60"))
    )
    payloads = d.select(
        "doc_id",
        F.expr(
            """CASE WHEN doc_id % 7 = 0
               THEN encode(concat('notanimage:', text), 'utf-8')
               ELSE concat(
                 encode(format_string('P6\n%d %d\n255\n',
                        octet_length(encode(text, 'utf-8')) % 4 + 2,
                        octet_length(encode(text, 'utf-8')) % 3 + 2),
                        'utf-8'),
                 substring(encode(text, 'utf-8'), 1,
                   (octet_length(encode(text, 'utf-8')) % 4 + 2)
                   * (octet_length(encode(text, 'utf-8')) % 3 + 2) * 3))
               END"""
        ).alias("content"),
    )
    out = extract_features(
        perceptual_hash(decode_images(payloads, codec="mini"), codec="mini"),
        dim=4,
        codec="mini",
    )
    return out.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        "phash",
        *[
            F.round(F.col("features").getItem(i), 6).alias(f"f{i}")
            for i in range(4)
        ],
    )


@q(
    "multimodal_audio_features",
    """
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    sv AS (
      SELECT doc_id, n,
             list_transform(generate_series(1, n),
                 i -> (('0x' || substr(hx, 2*i - 1, 2))::BIGINT + 128)
                      % 256 - 128) AS v
      FROM b
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(coalesce(list_sum(list_transform(v, x -> x * x)), 0)
               AS BIGINT) AS energy,
           CAST(coalesce(list_sum(list_transform(
                    generate_series(1, n - 1),
                    i -> CASE WHEN (v[i] < 0) <> (v[i+1] < 0)
                         THEN 1 ELSE 0 END)), 0) AS BIGINT)
               AS zero_crossings,
           CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms
    FROM sv
    ORDER BY doc_id
    """,
)
def multimodal_audio_features(spark, sf_dir):
    """Audio-column features — the payload interpreted as signed 8-bit
    PCM (raw PCM IS its decoded form, so unlike the stubbed image codec
    these are REAL computed signal features): per-clip sample count,
    energy (Σ sample²), zero-crossing count, and duration at 8 kHz. The
    oracle recomputes every value from the hex pairs of the same bytes —
    integer-exact, engine-independent, no digest stand-ins. Certifies
    the binary round-trip (utf-8 bytes survive Arrow transfer
    bit-for-bit), the int8 signed reinterpretation ((b+128)%256−128),
    and the Arrow-batched mapInPandas plumbing end to end."""
    from bridgedownstream_spark.operators.multimodal import pcm_features

    feats = pcm_features(_payloads(spark, sf_dir))
    return feats.select(
        "doc_id",
        F.col("audio.n_samples").alias("n_samples"),
        F.col("audio.energy").alias("energy"),
        F.col("audio.zero_crossings").alias("zero_crossings"),
        F.col("audio.duration_ms").alias("duration_ms"),
    ).orderBy("doc_id")
