from bridgedownstream_spark.operators.relationalize import (
    has_nested_fields,
    relationalize,
)

__all__ = ["has_nested_fields", "relationalize"]
