"""Multimodal operator tests: binary-column plumbing, stub contracts,
native frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bridgedownstream_spark.operators.multimodal import (
    decode_images,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")], "id int, content binary"
    )


def test_decode_meta_schema_and_determinism(media):
    out = decode_images(media)
    assert dict(out.dtypes)["meta"] == (
        "struct<format:string,width:int,height:int,n_bytes:bigint>"
    )
    rows = {r["id"]: r["meta"] for r in out.collect()}
    assert rows[1]["n_bytes"] == len(b"payload-one")
    h = hashlib.md5(b"payload-one").hexdigest()
    assert rows[1]["width"] == int(h[:15], 16) % 640 + 1
    # deterministic across invocations
    again = {r["id"]: r["meta"] for r in decode_images(media).collect()}
    assert again == rows


def test_strict_mode_raises_without_codec(media):
    # strict=True upgrades auto → pil; without PIL on the workers that must
    # surface as an error, never silently fall back to the stub
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — strict mode succeeds here")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        decode_images(media, strict=True).collect()
    with pytest.raises(Exception, match="NotImplementedError|imaging library"):
        decode_images(media, codec="pil").collect()


def test_codec_autodetect_matches_environment(media):
    from bridgedownstream_spark.operators.multimodal import detect_codec

    try:
        import PIL  # noqa: F401

        assert detect_codec() == "pil"
    except ImportError:
        assert detect_codec() == "stub"
    # codec="auto" (the default) must run everywhere
    assert decode_images(media).count() == 2


def test_pil_path_decodes_real_image(spark):
    """Runs only where PIL exists: the SAME operator call decodes a real
    PNG, proving auto-detection turns the stub plumbing production-real
    with zero code change."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io as _io

    buf = _io.BytesIO()
    PIL_Image.new("RGB", (12, 7), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue())], "id int, content binary")
    meta = decode_images(df, codec="pil").collect()[0]["meta"]
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 12, 7)


def test_feature_extraction_shape(media):
    out = extract_features(media, dim=8)
    rows = {r["id"]: r["features"] for r in out.collect()}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0.0 <= x <= 1.0 for v in rows.values() for x in v)
    digest = hashlib.md5(b"payload-one").digest()
    assert rows[1] == [digest[i] / 255.0 for i in range(8)]


def test_sample_frames_native(spark):
    df = spark.createDataFrame(
        [(1, [bytes([i]) for i in range(10)])], "id int, frames array<binary>"
    )
    out = sample_frames(df, every_n=3).collect()[0]["frames"]
    assert [bytes(b)[0] for b in out] == [0, 3, 6, 9]


def test_resize_images_contract(spark):
    from bridgedownstream_spark.operators.multimodal import resize_images
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")], "id long, content binary"
    )
    out = resize_images(df, width=100, height=100).collect()
    assert {r["id"] for r in out} == {1, 2}
    for r in out:
        assert r["meta"]["width"] == 100 and r["meta"]["height"] == 100
        assert len(r["content"]) == 100 * 100 // 100  # byte budget
        assert r["meta"]["n_bytes"] == len(r["content"])
    # deterministic: same payload → same rendition
    again = resize_images(df, width=100, height=100).collect()
    assert sorted(bytes(r["content"]) for r in out) == sorted(
        bytes(r["content"]) for r in again
    )


def test_resize_strict_raises(spark):
    import pytest
    from bridgedownstream_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, b"x")], "id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        resize_images(df, strict=True).collect()


def test_perceptual_hash_pairs_identical_payloads(spark):
    from bridgedownstream_spark.operators.multimodal import perceptual_hash
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, b"same bytes"), (2, b"same bytes"), (3, b"other bytes")],
        "doc_id long, content binary",
    )
    hashed = perceptual_hash(df)
    rows = {r["doc_id"]: r["phash"] for r in hashed.collect()}
    # identical payloads → identical signature (hamming 0)
    assert rows[1] == rows[2]
    assert 0 <= rows[1] < (1 << 16)
    # determinism across invocations
    again = {r["doc_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert rows == again
    # hamming verify is a native expression, usable straight on the output
    ham = (
        hashed.alias("a")
        .join(hashed.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "a.doc_id",
            "b.doc_id",
            F.expr("bit_count(a.phash ^ b.phash)").alias("h"),
        )
        .where(F.col("h") == 0)
    )
    assert ham.count() == 1  # exactly the (1, 2) pair
