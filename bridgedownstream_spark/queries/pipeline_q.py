"""ETL-pipeline-shaped queries (stage-1/stage-2 semantics over testdata).

Grows as the ingest/relationalize pipeline modules land; non-SQL-expressible
entries register a None oracle (driver falls back to a rows-only check).
"""

from __future__ import annotations

QUERIES: dict = {}
