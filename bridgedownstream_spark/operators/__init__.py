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
    resize_images,
    sample_frames,
)

__all__ = [
    "asof_join",
    "connected_components",
    "has_nested_fields",
    "relationalize",
    "salted_join",
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
