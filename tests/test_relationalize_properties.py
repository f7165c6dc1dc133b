"""Property-based tests: relationalize must losslessly decompose any
nested shape — the root⋈child join reconstructs the original arrays
exactly. Complements the golden tests with generated structures."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bridgedownstream_spark.operators import relationalize

# small alphabets keep Spark round-trips fast while still exercising
# nulls, empties, duplicates-in-array, and multi-row shapes
_vals = st.one_of(st.none(), st.text(alphabet="abXY ", max_size=4))
_elem = st.tuples(_vals, st.integers(min_value=-5, max_value=5))
_arr = st.one_of(st.none(), st.lists(_elem, max_size=4))
_rows = st.lists(_arr, min_size=1, max_size=5)


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@given(arrays=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_roundtrip_reconstruction(sparkmod, arrays):
    spark = sparkmod
    rows = [(f"r{i}", arr) for i, arr in enumerate(arrays)]
    df = spark.createDataFrame(
        rows, "recordid string, files array<struct<name:string,n:int>>"
    )
    tables = relationalize(df, "t", key_cols=("recordid",))
    root = tables["t"]

    # root preserves row count and key set
    got_root = {r["recordid"]: r["files"] for r in root.collect()}
    assert set(got_root) == {f"r{i}" for i in range(len(arrays))}
    # null arrays stay null surrogate ids
    for i, arr in enumerate(arrays):
        assert (got_root[f"r{i}"] is None) == (arr is None)

    if "t_files" not in tables:
        assert all(a is None for a in arrays)
        return
    child = tables["t_files"]
    # child holds exactly the non-null arrays' elements, index-ordered
    recon: dict[str, dict[int, tuple]] = {}
    for r in child.collect():
        recon.setdefault(r["recordid"], {})[r["index"]] = (r["name"], r["n"])
    for i, arr in enumerate(arrays):
        rid = f"r{i}"
        if arr is None or len(arr) == 0:
            assert rid not in recon or recon[rid] == {}
        else:
            assert [recon[rid][j] for j in range(len(arr))] == [tuple(e) for e in arr]

    # the surrogate join fans out to exactly the element count
    joined = root.where(F.col("files").isNotNull()).select(
        F.col("files").alias("id")
    ).join(child, "id", "inner")
    expected = sum(len(a) for a in arrays if a)
    assert joined.count() == expected
