"""Sources & sinks: archive ingest, NDJSON lake layout, listings.

- :mod:`.ndjson` — partitioned NDJSON dataset sink + path helpers (the
  stage-1 output / stage-2 input layout).
- :mod:`.archive` — zip-archive source: binaryFile scan + member fan-out.
- :mod:`.listing` — file-listing scans over a lake prefix.
"""

from bridgedownstream_spark.sources.ndjson import write_ndjson_dataset

__all__ = ["write_ndjson_dataset"]
