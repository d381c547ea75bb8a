"""Driver-side output-schema inference for opaque pandas UDFs.

Spark's ``pandas_udf`` / ``mapInPandas`` / ``applyInPandas`` need a
static result schema; pandas ``apply`` discovers it at runtime. The
reference solves the same problem for dask by executing the UDF on a
~1000-row random sample and using the result as dask ``meta``
(`/root/reference/swifter/swifter.py:260, 370`; sample machinery
`/root/reference/swifter/base.py:21, 46-47`). We replicate that trick
on the driver: pull a bounded sample, run the UDF once, map the result
dtypes onto Spark types, and pin the schema into the plan.

Same documented caveat as the reference (`README.md:90` there):
side-effecting UDFs run extra times during inference.

Scale note: the sample is bounded (default 1000 rows) and fetched with
``limit(n)`` — a driver-side O(1) operation regardless of table size;
nothing here scales with input rows.
"""

from __future__ import annotations

import logging
import os
from contextlib import contextmanager, redirect_stderr, redirect_stdout
from typing import Any, Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SAMPLE_SIZE = 1000  # mirrors swifter/base.py:21


@contextmanager
def suppress_sample_output():
    """Silence stdout/stderr/logging while a user UDF runs driver-side
    for schema inference or route validation — the reference's
    ``suppress_stdout_stderr_logging`` (swifter/base.py:25-39, test
    swifter_tests.py:370-383): a printing UDF must emit output only
    from its REAL run, never from the hidden sample applies."""
    prev = logging.root.manager.disable
    logging.disable(logging.CRITICAL)
    try:
        with open(os.devnull, "w") as fnull:
            with redirect_stderr(fnull), redirect_stdout(fnull):
                yield
    finally:
        logging.disable(prev)


def spark_type_for_dtype(dtype: Any, sample_value: Any = None) -> T.DataType:
    """Map a numpy/pandas dtype (plus an optional example value for
    ``object`` disambiguation) onto a Spark SQL type."""
    dtype = np.dtype(dtype) if not isinstance(dtype, pd.api.types.CategoricalDtype) else np.dtype("O")
    if np.issubdtype(dtype, np.bool_):
        return T.BooleanType()
    if np.issubdtype(dtype, np.int8) or np.issubdtype(dtype, np.int16):
        return T.IntegerType()
    if np.issubdtype(dtype, np.int32):
        return T.IntegerType()
    if np.issubdtype(dtype, np.integer):
        return T.LongType()
    if np.issubdtype(dtype, np.float32):
        return T.FloatType()
    if np.issubdtype(dtype, np.floating):
        return T.DoubleType()
    if np.issubdtype(dtype, np.datetime64):
        return T.TimestampType()
    # object dtype: look at a concrete value
    v = sample_value
    if isinstance(v, str) or v is None:
        return T.StringType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, (int, np.integer)):
        return T.LongType()
    if isinstance(v, (float, np.floating)):
        return T.DoubleType()
    if isinstance(v, bytes):
        return T.BinaryType()
    if isinstance(v, (list, tuple, np.ndarray)):
        inner = v[0] if len(v) else None
        return T.ArrayType(spark_type_for_dtype(np.dtype("O"), inner))
    if isinstance(v, dict):
        if v:
            kv = next(iter(v.items()))
            return T.MapType(
                spark_type_for_dtype(np.dtype("O"), kv[0]),
                spark_type_for_dtype(np.dtype("O"), kv[1]),
            )
        return T.MapType(T.StringType(), T.StringType())
    return T.StringType()


def _first_non_null(s: pd.Series) -> Any:
    nn = s.dropna()
    return nn.iloc[0] if len(nn) else None


def sample_pandas(df: DataFrame, n: int = SAMPLE_SIZE) -> pd.DataFrame:
    """Bounded driver-side sample (``limit`` — no full scan)."""
    return df.limit(n).toPandas()


def infer_series_return_type(
    df: DataFrame, col: str, func: Callable, args: tuple = (), kwds: dict | None = None
) -> T.DataType:
    """Run ``func`` elementwise on a sampled column, return the Spark type
    of the result (swifter's dask-``meta`` analog for O1)."""
    sample = sample_pandas(df.select(col))[col]
    with suppress_sample_output():
        out = sample.apply(func, args=args, **(kwds or {}))
    return spark_type_for_dtype(out.dtype, _first_non_null(out))


def schema_from_pandas(pdf: pd.DataFrame) -> T.StructType:
    fields = [
        T.StructField(str(c), spark_type_for_dtype(pdf[c].dtype, _first_non_null(pdf[c])), True)
        for c in pdf.columns
    ]
    return T.StructType(fields)


def infer_rows_schema(
    df: DataFrame,
    func: Callable,
    result_type: str | None = None,
    args: tuple = (),
    kwds: dict | None = None,
    raw: bool = False,
) -> tuple[T.StructType, bool]:
    """Infer the output schema of a row-wise (axis=1) apply.

    Returns ``(schema, scalar_result)`` where ``scalar_result`` is True
    when the UDF returns one value per row (result column named
    ``result``) and False when it returns a Series per row (expanding
    into multiple columns — pandas ``result_type='expand'`` semantics,
    reference passthrough at swifter/swifter.py:352-365).
    """
    sample = sample_pandas(df)
    with suppress_sample_output():
        out = sample.apply(
            func, axis=1, raw=raw, result_type=result_type, args=args, **(kwds or {})
        )
    if isinstance(out, pd.DataFrame):
        return schema_from_pandas(out), False
    return (
        T.StructType(
            [T.StructField("result", spark_type_for_dtype(out.dtype, _first_non_null(out)), True)]
        ),
        True,
    )
