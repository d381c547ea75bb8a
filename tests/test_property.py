"""Property-based tests (Hypothesis) for the apply family — the
edge-case sweep the reference's example-based tests never run
(VERDICT r1 hardening item): empty partitions, all-null columns,
unicode payloads, arbitrary numeric values.

Ground truth is pandas itself: whatever ``Series.apply`` /
``DataFrame.apply`` produces on the same data is what the engine
must produce through the Arrow route.

Example counts are kept small: each example is a real Spark job
(~0.3 s), and the properties are about STRUCTURE (nulls, emptiness,
encoding), not about sampling a huge value space.
"""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkswift.operators.apply import apply_rows, apply_series

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
)
texts = st.one_of(st.none(), st.text(max_size=40))


def _mkdf(spark, values, dtype):
    pdf = pd.DataFrame({"i": range(len(values)), "x": pd.array(values, dtype=dtype)})
    # force multiple (mostly empty) partitions so empty-partition
    # handling is exercised on every example
    return spark.createDataFrame(pdf).repartition(8), pdf


@given(values=st.lists(floats, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_apply_series_udf_matches_pandas_on_floats(spark, values):
    df, pdf = _mkdf(spark, values, "float64")
    out = (
        apply_series(df, "x", lambda v: v * 2 + 1, output_col="y", force_udf=True)
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf["x"].apply(lambda v: v * 2 + 1)
    for got, exp in zip(out, expected):
        if exp is None or (isinstance(exp, float) and math.isnan(exp)):
            assert got is None or math.isnan(got)
        else:
            assert got == pytest.approx(exp, rel=1e-12)


@given(values=st.lists(texts, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_apply_series_udf_matches_pandas_on_unicode(spark, values):
    df, pdf = _mkdf(spark, values, "object")
    out = (
        apply_series(
            df,
            "x",
            lambda v: None if v is None else v.upper(),
            output_col="y",
            force_udf=True,
            returns="string",
        )
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf["x"].apply(lambda v: None if v is None else v.upper())
    assert list(out) == list(expected)


@given(values=st.lists(floats, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_apply_rows_matches_pandas(spark, values):
    df, pdf = _mkdf(spark, values, "float64")
    out = (
        apply_rows(
            df,
            lambda row: 0.0 if pd.isna(row["x"]) else abs(row["x"]),
            output_col="y",
        )
        .toPandas()
        .sort_values("i")["y"]
        .reset_index(drop=True)
    )
    expected = pdf.apply(
        lambda row: 0.0 if pd.isna(row["x"]) else abs(row["x"]), axis=1
    )
    for got, exp in zip(out, expected):
        assert got == pytest.approx(exp, rel=1e-12)


def test_apply_series_all_null_column(spark):
    pdf = pd.DataFrame({"i": [0, 1, 2], "x": pd.array([None] * 3, dtype="float64")})
    df = spark.createDataFrame(pdf).repartition(4)
    out = apply_series(
        df, "x", lambda v: v * 2, output_col="y", force_udf=True, returns="double"
    ).toPandas()
    assert out["y"].isna().all()


def test_apply_rows_empty_input(spark):
    df = spark.createDataFrame([], "i long, x double")
    out = apply_rows(
        df, lambda row: row["x"], output_col="y", schema="y double"
    )
    assert out.count() == 0
