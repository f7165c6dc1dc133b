"""Fixed-width source edge cases: the oracle round trip covers the happy
path; these pin the overflow-raises contract and the value corners
(internal spaces, zero, negative magnitudes at full width) the supplier
table never hits."""

from __future__ import annotations

import pytest

from bridgedownstream_spark.sources.fixed_width import (
    read_fixed_width,
    write_fixed_width,
)

SPEC = [("k", 4, "int"), ("name", 8, "str"), ("bal", 6, "sint")]


def test_round_trip_preserves_corners(spark, tmp_path):
    rows = [
        (0, "a b  c", -99999),   # internal spaces survive; max negative
        (9999, "x", 99999),      # max-width int; max positive
        (7, "", 0),              # empty string; zero keeps '+' sign
    ]
    df = spark.createDataFrame(rows, "k long, name string, bal long")
    path = str(tmp_path / "fw")
    write_fixed_width(df, path, SPEC)
    got = sorted(
        (r.k, r.name, r.bal) for r in read_fixed_width(spark, path, SPEC).collect()
    )
    assert got == sorted(rows)
    # every line is exactly the summed width
    lines = [r.value for r in spark.read.text(path).collect()]
    assert all(len(ln) == 18 for ln in lines)


@pytest.mark.parametrize(
    "row",
    [
        (10000, "ok", 0),        # int wider than 4 digits
        (-1, "ok", 0),           # negative in an unsigned field
        (1, "nine-chars", 0),    # string wider than 8
        (1, "ok", 100000),       # magnitude needs 6 digits, field has 5
    ],
)
def test_overflow_raises_never_truncates(spark, tmp_path, row):
    df = spark.createDataFrame([row], "k long, name string, bal long")
    with pytest.raises(Exception, match="fixed-width overflow"):
        write_fixed_width(df, str(tmp_path / "fw_bad"), SPEC)


def test_null_raises_with_field_name(spark, tmp_path):
    """NULL has no fixed-width representation; it must raise a named
    error at write time, not propagate a NULL line into the text writer
    (whose own failure message names no field)."""
    df = spark.createDataFrame(
        [(1, None, 0)], "k long, name string, bal long"
    )
    with pytest.raises(Exception, match="fixed-width null.*'name'"):
        write_fixed_width(df, str(tmp_path / "fw_null"), SPEC)
