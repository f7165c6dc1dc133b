from bridgedownstream_spark.operators.asof import asof_join
from bridgedownstream_spark.operators.components import connected_components
from bridgedownstream_spark.operators.skew import salted_join
from bridgedownstream_spark.operators.relationalize import (
    has_nested_fields,
    relationalize,
)
from bridgedownstream_spark.operators.reconcile import (
    assign_batches,
    count_reconciliation,
    dedup_latest,
    missing_records,
    replay_quarantine,
)
from bridgedownstream_spark.operators.multimodal import (
    decode_images,
    extract_features,
    perceptual_hash,
    resize_images,
    sample_frames,
)
from bridgedownstream_spark.operators.pq import encode_pq, pq_shortlist, train_pq

__all__ = [
    "asof_join",
    "connected_components",
    "has_nested_fields",
    "relationalize",
    "salted_join",
    "encode_pq",
    "pq_shortlist",
    "train_pq",
    "perceptual_hash",
    "dedup_latest",
    "missing_records",
    "count_reconciliation",
    "assign_batches",
    "replay_quarantine",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
]
