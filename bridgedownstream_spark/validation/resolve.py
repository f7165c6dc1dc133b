"""JSON-Schema resolution: which schema governs a given archive member.

The reference resolves per record, driver-side, walking archive-map.json in
three scopes with a per-record self-reference override
(s3_to_json_s3.py:179-282):

1. **self-ref**: the archive's own metadata.json names a jsonSchema for the
   file (:222-228) — always wins;
2. **assessment scope**: among assessments with the member's
   assessmentIdentifier and assessmentRevision ≤ the record's revision,
   the one with the *smallest revision distance* wins (:230-248) — an
   as-of/closest-match lookup (operator P3);
3. **app scope**: the app's ``default`` org files, then ``anyOf`` (:258-268);
4. **inter-app scope**: the top-level ``anyOf`` (:274-281).

Spark-first: resolution inputs have *config cardinality* — distinct
(assessment, revision, filename) combos, bounded by the archive map itself,
not by row count — so we resolve each distinct combo once driver-side and
broadcast-join the resulting lookup table onto the member stream. 100 TB of
archives with the same few hundred assessment/file combos still resolve in
milliseconds of driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_schema_url", "attach_schema_urls"]


def resolve_schema_url(
    archive_map: dict,
    app_id: str,
    assessment_id: str,
    assessment_revision: int,
    file_name: str,
) -> str | None:
    """Pure-Python 3-scope resolution (no self-ref — that arrives as a
    column from the archive source). Returns the schema URL or None."""
    # 1. assessment scope: closest revision <= record's revision
    valid = [
        a
        for a in archive_map.get("assessments", [])
        if a.get("assessmentIdentifier") == assessment_id
        and a.get("assessmentRevision") <= int(assessment_revision)
    ]
    if valid:
        closest = min(valid, key=lambda a: int(assessment_revision) - a["assessmentRevision"])
        for file in closest.get("files", []):
            if file.get("filename") == file_name:
                return file.get("jsonSchema")
        # NB: reference returns early only when the filename matches;
        # otherwise falls through to app scope (s3_to_json_s3.py:249-257).
    # 2. app scope: default orgs FIRST (first match wins), anyOf only as
    # the fallback — a later scope must never overwrite an earlier match
    for app in archive_map.get("apps", []):
        if app.get("appId") != app_id:
            continue
        for default_org in app.get("default", []):
            for f in default_org.get("files", []):
                if f.get("filename") == file_name and f.get("jsonSchema"):
                    return f["jsonSchema"]
        for f in app.get("anyOf", []):
            if f.get("filename") == file_name and f.get("jsonSchema"):
                return f["jsonSchema"]
    # 3. inter-app scope
    for f in archive_map.get("anyOf", []):
        if f.get("filename") == file_name and "jsonSchema" in f:
            return f["jsonSchema"]
    return None


def attach_schema_urls(
    members: DataFrame,
    archive_map: dict,
    app_id: str = "mobile-toolbox",
) -> DataFrame:
    """Add a ``schema_url`` column: self-ref override first, else archive-map
    resolution via a broadcast-joined lookup of the distinct
    (assessmentid, assessmentrevision, file_name) combos."""
    spark = members.sparkSession
    combos = [
        (r["assessmentid"], r["assessmentrevision"], r["file_name"])
        for r in members.select(
            "assessmentid", "assessmentrevision", "file_name"
        )
        .distinct()
        .collect()  # config-cardinality, bounded by the archive map
    ]
    rows = [
        (aid, rev, fname, resolve_schema_url(archive_map, app_id, aid, int(rev), fname))
        for aid, rev, fname in combos
    ]
    lookup = spark.createDataFrame(
        rows,
        "assessmentid string, assessmentrevision string, file_name string, "
        "resolved_url string",
    )
    joined = members.join(
        F.broadcast(lookup),
        ["assessmentid", "assessmentrevision", "file_name"],
        "left",
    )
    return joined.withColumn(
        "schema_url", F.coalesce("self_ref_schema_url", "resolved_url")
    ).drop("resolved_url")
