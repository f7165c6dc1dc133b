"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched Pandas UDFs.

This extends the engine past the reference (which only moves JSON) toward
the 100 TB training-data brief: media travels as ``binary`` payloads inside
ordinary DataFrames — partitioned, shuffled, and pruned like any column —
and the CPU-bound decode/feature steps run in ``mapInPandas`` so each task
processes an Arrow batch of payloads at once.

The actual codec work (PIL/librosa/av) is NOT available in this
environment, so the decode core is **stubbed**: ``strict=True`` raises
``NotImplementedError`` where a real deployment would call the codec, and
the default path derives deterministic pseudo-metadata/features from the
payload bytes (md5-based) so the surrounding Spark plumbing — schemas,
batch shapes, partitioning, UDF signatures — is real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["decode_images", "extract_features", "perceptual_hash", "resize_images", "sample_frames", "MEDIA_META_SCHEMA"]

#: Typed metadata carried alongside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real image decode: metadata derived
    from the payload digest. A real deployment replaces only this function
    (and keeps every Spark-side contract identical)."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:15], 16) % 640 + 1
    height = int(h[15:30], 16) % 480 + 1
    return "fake/deterministic", width, height


def decode_images(
    df: DataFrame, content_col: str = "content", strict: bool = False
) -> DataFrame:
    """Attach a ``meta`` struct (format/width/height/n_bytes) decoded from
    the binary payload. ``strict=True`` demands a real codec."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("meta", MEDIA_META_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real image decode requires an imaging library (PIL et al.) "
                "not present in this environment; use strict=False for the "
                "deterministic stub"
            )
        for pdf in batches:
            metas = []
            for payload in pdf[content_col]:
                b = bytes(payload)
                fmt, w, h = _fake_decode(b)
                metas.append(
                    {"format": fmt, "width": w, "height": h, "n_bytes": len(b)}
                )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(
    df: DataFrame, content_col: str = "content", dim: int = 8, strict: bool = False
) -> DataFrame:
    """Attach a ``features: array<double>`` embedding per payload.

    Stub features are the first ``dim`` md5 bytes scaled to [0, 1] —
    deterministic, so downstream ANN/dedup operators can be tested on them;
    a real deployment swaps in a vision/audio encoder batch call here."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real feature extraction requires a model runtime not "
                "present in this environment; use strict=False for the stub"
            )
        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                digest = hashlib.md5(bytes(payload)).digest()
                feats.append([digest[i] / 255.0 for i in range(dim)])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(featurize, schema=out_schema)


def sample_frames(
    df: DataFrame, frames_col: str = "frames", every_n: int = 3
) -> DataFrame:
    """Keep every ``every_n``-th frame of a video-like
    ``array<binary>`` column — pure native array work (``filter`` HOF), no
    Python: frame sampling is an index predicate, not a decode."""
    return df.withColumn(
        frames_col,
        F.filter(F.col(frames_col), lambda x, i: i % every_n == 0),
    )


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    width: int = 224,
    height: int = 224,
    strict: bool = False,
) -> DataFrame:
    """Replace each payload with a ``width``×``height`` resized rendition
    and attach the post-resize ``meta`` struct — the preprocessing step a
    vision training pipeline runs before feature extraction.

    The stub rendition is deterministic: payload digest material cycled to
    a byte budget proportional to the target pixel count (so relative
    sizes behave like a real resample and downstream size accounting is
    testable). A real deployment replaces only the inner loop with the
    codec's decode→resample→encode; the Spark contract — binary in,
    binary out, same partitioning, Arrow batches — is unchanged."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [
            T.StructField(content_col, T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real resize requires an imaging library (PIL et al.) not "
                "present in this environment; use strict=False for the stub"
            )
        n_bytes = max(1, (width * height) // 100)  # stub byte budget
        for pdf in batches:
            bodies, metas = [], []
            for payload in pdf[content_col]:
                digest = hashlib.md5(bytes(payload)).digest()
                body = (digest * (n_bytes // len(digest) + 1))[:n_bytes]
                bodies.append(body)
                metas.append(
                    {
                        "format": "fake/resized",
                        "width": width,
                        "height": height,
                        "n_bytes": len(body),
                    }
                )
            pdf = pdf.copy()
            pdf[content_col] = bodies
            pdf["meta"] = metas
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(resize, schema=out_schema)


def perceptual_hash(
    df: DataFrame, content_col: str = "content", strict: bool = False
) -> DataFrame:
    """Attach a 16-bit average-hash (aHash) ``phash`` per payload.

    Real aHash: decode → grayscale → downsample to a tiny grid → one bit
    per cell (above/below the mean). The stub keeps every step except the
    codec: the "grid" is the 16-byte md5 digest of the payload (the same
    stand-in pixel source the other stubs use), so the hash is
    deterministic and recomputable by the DuckDB oracle. A real
    deployment swaps the digest for actual downsampled luma values —
    the Spark contract (binary in, bigint signature out) is unchanged.

    Unlike the text-side MinHash, near-dup detection over phash is
    HAMMING-distance based: candidates bucket on the signature's top
    byte, verification is ``bit_count(phash_a ^ phash_b)`` — both native
    integer ops, no UDF in the pair path.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("phash", T.LongType())]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real perceptual hashing requires an imaging library not "
                "present in this environment; use strict=False for the stub"
            )
        for pdf in batches:
            hashes = []
            for payload in pdf[content_col]:
                grid = hashlib.md5(bytes(payload)).digest()  # 16 "pixels"
                mean = sum(grid) / len(grid)
                h = 0
                for i, px in enumerate(grid):
                    if px > mean:
                        h |= 1 << i
                hashes.append(h)
            pdf = pdf.copy()
            pdf["phash"] = hashes
            yield pdf

    return df.mapInPandas(hash_batch, schema=out_schema)
