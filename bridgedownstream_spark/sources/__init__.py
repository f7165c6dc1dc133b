"""Sources & sinks: archive ingest, NDJSON lake layout, listings.

- :mod:`.ndjson` — partitioned NDJSON dataset sink + path helpers (the
  stage-1 output / stage-2 input layout).
- :mod:`.archive` — zip-archive source: binaryFile scan + member fan-out.
- :mod:`.listing` — file-listing scans over a lake prefix.
- :mod:`.csv_export` — partitioned CSV export of lake tables (the
  consumer-facing half of "exporting to Parquet/CSV").
"""

from bridgedownstream_spark.sources.csv_export import (
    read_csv_dataset,
    write_csv_dataset,
)
from bridgedownstream_spark.sources.ndjson import write_ndjson_dataset

__all__ = ["read_csv_dataset", "write_csv_dataset", "write_ndjson_dataset"]
