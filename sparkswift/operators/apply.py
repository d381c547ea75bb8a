"""The apply family — O1/O2/O3 of the reference surface.

Reference semantics (SURVEY.md §2.1):

* O1 ``Series.swifter.apply``   (/root/reference/swifter/swifter.py:287-329)
* O2 ``DataFrame.swifter.apply`` (axis=0/1, result_type)   (…:400-437)
* O3 ``DataFrame.swifter.applymap``                        (…:483-521)

The reference's *adaptive chooser* (try vectorized on a sample, else
time the sample, else dask) becomes a **compile-time route choice**:

1. **Native route** — try calling the UDF with a ``pyspark.sql.Column``.
   Plain-arithmetic lambdas (``lambda x: x**2 + 1``) build a Column
   expression directly, which Catalyst folds into whole-stage codegen —
   the Spark analog of swifter's numpy vectorized fast path
   (swifter.py:309-317). Optionally validated against the pandas
   result on a bounded sample, mirroring swifter's equivalence gate
   (swifter.py:313-316).
2. **Arrow route** — otherwise wrap as a scalar ``pandas_udf`` (Arrow
   batches, JVM<->Python columnar transfer) with the output type
   inferred by sample execution (plans/inference.py).

Scale notes: the native route is pure Catalyst (100 TB-safe by
construction: pushdown, pruning, codegen all apply). The Arrow route is
embarrassingly parallel — no shuffle, no skew sensitivity; batch size
bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkswift.plans.inference import (
    infer_rows_schema,
    infer_series_return_type,
    sample_pandas,
    spark_type_for_dtype,
)


def _try_native_column(func: Callable, col: Column) -> Column | None:
    """Attempt to build a native Column expression by calling ``func``
    on a Column. Returns None when the UDF is not expressible that way
    (raises, or returns a non-Column)."""
    try:
        out = func(col)
    except Exception:
        return None
    return out if isinstance(out, Column) else None


def _validate_native_on_sample(
    df: DataFrame, col: str, expr: Column, func: Callable
) -> bool:
    """Spark analog of swifter's vectorized-vs-apply equivalence check
    (swifter/swifter.py:313-316): evaluate the native expression and the
    pandas elementwise apply on the same bounded sample and compare.

    ONE bounded sample job (VERDICT r4 #3 — the old gate ran two): the
    native expression and the raw input column collect in the same
    100-row scan (Catalyst prunes to the columns used); the pandas
    side then runs on the collected input driver-side, no second job.
    """
    try:
        pdf = (
            df.limit(100)
            .select(F.col(col).alias("__sw_in"), expr.alias("__sw_nat"))
            .toPandas()
        )
    except Exception:
        return False
    native = pdf["__sw_nat"]
    try:
        from sparkswift.plans.inference import suppress_sample_output

        # probe ONE element first: a Column-native-only func (captures
        # F.col etc.) builds a JVM Column per call via py4j — applying
        # it across the whole 100-row sample costs seconds of driver
        # round-trips (the r4 bench anomaly). One probe classifies it.
        if len(pdf):
            with suppress_sample_output():
                probe = func(pdf["__sw_in"].iloc[0])
            if isinstance(probe, Column):
                return True
        with suppress_sample_output():
            via_pandas = pdf["__sw_in"].apply(func)
    except Exception:
        # func is Column-native-only (references F.col etc. — not
        # callable on scalars): there is no pandas result to diverge
        # from, the expression IS the definition. Trust it.
        return True
    if via_pandas.map(lambda v: isinstance(v, Column)).any():
        # scalar op Column silently builds Columns via __rmul__ etc. —
        # same Column-native-only situation as the except branch above
        return True
    try:
        pd.testing.assert_series_equal(
            native.reset_index(drop=True).rename("v"),
            via_pandas.reset_index(drop=True).rename("v").astype(native.dtype),
            check_dtype=False,
            rtol=1e-10,
        )
        return True
    except AssertionError:
        return False


def apply_series(
    df: DataFrame,
    col: str,
    func: Callable,
    output_col: str | None = None,
    returns: T.DataType | str | None = None,
    force_udf: bool = False,
    validate: bool = True,
    fallback: bool = False,
    convert_dtype: bool = True,
    args: tuple = (),
    **kwds,
) -> DataFrame:
    """O1 — elementwise apply over one column.

    ``convert_dtype`` (reference swifter.py:287 forwards it to pandas
    ``Series.apply``): columnar engines have no 'object' dtype — every
    result column carries its inferred Spark type — so ``False`` here
    disables the tight return-type inference and emits ``string``
    (the closest analog of pandas keeping raw objects). pandas itself
    deprecated the kwarg in 2.x for the same reason.

    ``force_udf`` mirrors ``force_parallel``
    (swifter/swifter.py:131-138): skip the native-expression attempt.
    ``validate`` (default True — the reference ALWAYS gates its
    vectorized fast path on a sample check, swifter.py:313-316) runs
    the sample equivalence gate before trusting the native route:
    Python and SQL disagree on e.g. ``%`` of negatives (-7%3 is 2 in
    Python, -1 in SQL), and the gate routes such funcs to the Arrow
    path where pandas semantics hold. One bounded 100-row job — the
    same cost profile as the reference's gate. ``validate=False`` skips
    it for funcs known to be expression-safe. ``fallback`` enables the R6 chain (SURVEY §4): run
    the Arrow route eagerly on a bounded sample and drop to a pickled
    row-wise udf when the payload is Arrow-incompatible (nested mixed
    dicts, sets, …) — lazy-plan cost: one tiny sample job.
    """
    out_name = output_col or col
    if args or kwds:
        base = func
        func = lambda x, _b=base: _b(x, *args, **kwds)  # noqa: E731

    if not force_udf and convert_dtype:
        expr = _try_native_column(func, F.col(col))
        if expr is not None and (not validate or _validate_native_on_sample(df, col, expr, func)):
            return df.withColumn(out_name, expr)

    rtype = None
    if not convert_dtype and returns is None:
        rtype = T.StringType()

        def func(x, _b=func):  # noqa: F811
            v = _b(x)
            try:
                if v is None or pd.isna(v):  # Arrow nulls arrive as NaN
                    return None
            except (TypeError, ValueError):
                pass  # pd.isna on array-likes — not a null
            return str(v)
    try:
        rtype = rtype or returns or infer_series_return_type(df, col, func)
    except Exception:
        pass  # un-inferable payload → pickled fallback below

    if rtype is not None:
        @F.pandas_udf(rtype)
        def _elementwise(s: pd.Series) -> pd.Series:
            return s.apply(func)

        arrow_out = df.withColumn(out_name, _elementwise(F.col(col)))
        if not fallback:
            return arrow_out
        try:
            # execute the REAL Arrow path on a bounded sample — the
            # analog of the reference's validated fallback chain
            # (map_partitions → dask apply → pandas, swifter.py:257-285)
            arrow_out.select(out_name).limit(20).collect()
            return arrow_out
        except Exception:
            pass  # Arrow-incompatible at runtime → pickled route

    return _pickled_apply(df, col, func, out_name)


def _pickled_apply(df: DataFrame, col: str, func: Callable, out_name: str) -> DataFrame:
    """R6 last resort: row-at-a-time pickled udf. The return type comes
    from Spark's own inference over one sample output (createDataFrame
    — public API); payloads even that can't type are stringified, the
    terminal link of the chain."""
    sample = sample_pandas(df.select(col), n=20)[col]
    v = None
    for x in sample:
        if x is not None:
            v = func(x)
            if v is not None:
                break
    try:
        rt = df.sparkSession.createDataFrame([(v,)], ["v"]).schema[0].dataType
        return df.withColumn(out_name, F.udf(func, rt)(F.col(col)))
    except Exception:
        # keep SQL NULLs null — str(None) would smuggle the literal
        # string 'None' into the column
        wrapped = (  # noqa: E731
            lambda x, _f=func: None if (v := _f(x)) is None else str(v)
        )
        return df.withColumn(out_name, F.udf(wrapped, T.StringType())(F.col(col)))


def apply_rows(
    df: DataFrame,
    func: Callable,
    schema: T.StructType | str | None = None,
    result_type: str | None = None,
    raw: bool = False,
    keep_cols: bool = True,
    output_col: str = "result",
    force_udf: bool = False,
    args: tuple = (),
    **kwds,
) -> DataFrame:
    """O2 — row-wise apply (pandas ``axis=1``) via ``mapInPandas``.

    Each Arrow batch is a pandas DataFrame; we run the same
    ``pdf.apply(func, axis=1, result_type=...)`` a pandas user would,
    preserving ``result_type=None|'expand'|'reduce'|'broadcast'``
    passthrough semantics (reference: swifter/swifter.py:352-365,
    docs/documentation.md:103-108 there). ``raw=True`` (reference
    signature swifter/swifter.py:400) hands each row to ``func`` as a
    bare ndarray instead of a Series — pandas' C-loop dispatch for
    numpy-reducer UDFs, forwarded verbatim to ``pdf.apply``.

    Scalar-result UDFs append ``output_col``; Series-result UDFs expand
    into one column per output key. ``keep_cols`` keeps the input
    columns alongside (pandas returns only the result; keeping inputs
    is the useful engine behavior and costs nothing — Arrow is
    columnar).

    Scale: pure map-side (no shuffle); batches stream through Python
    workers, memory bounded per batch.

    Adaptive vectorization (the reference's vectorize-try,
    swifter/swifter.py:417-425): when calling ``func`` on a whole
    pandas DataFrame gives the SAME result as the per-row apply on a
    bounded sample, each Arrow batch runs ``func(pdf)`` once —
    columnar pandas arithmetic instead of a Python loop per row
    (~100×). ``force_udf=True`` (force_parallel analog) disables the
    attempt.
    """
    inferred, scalar_result = infer_rows_schema(df, func, result_type, args, kwds, raw=raw)
    vectorize = False
    if not force_udf and result_type is None and not args and not kwds:
        try:
            import numpy as np

            sample = sample_pandas(df, n=50)
            slow = sample.apply(func, axis=1, raw=raw)
            fast = func(sample)
            vectorize = (
                isinstance(slow, pd.Series)
                and isinstance(fast, pd.Series)
                and len(fast) == len(slow)
                and bool(
                    np.array_equal(
                        slow.to_numpy(), fast.to_numpy(), equal_nan=True
                    )
                )
            )
        except Exception:
            vectorize = False
    if schema is not None:
        out_schema = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
        scalar_result = len(out_schema.fields) == 1 and out_schema.fields[0].name == output_col
    else:
        out_schema = inferred
        if scalar_result and output_col != "result":
            out_schema = T.StructType([T.StructField(output_col, out_schema["result"].dataType, True)])

    if keep_cols:
        existing = [f for f in df.schema.fields if f.name not in {x.name for x in out_schema.fields}]
        full_schema = T.StructType(existing + list(out_schema.fields))
    else:
        full_schema = out_schema
    result_names = [f.name for f in out_schema.fields]
    full_names = [f.name for f in full_schema.fields]

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if vectorize:
                out = func(pdf)
            else:
                out = pdf.apply(func, axis=1, raw=raw, result_type=result_type, args=args, **kwds)
            if isinstance(out, pd.DataFrame):
                res = out
                res.columns = [str(c) for c in res.columns]
            else:
                res = out.to_frame(result_names[0])
            if keep_cols:
                for c in full_names:
                    if c not in res.columns:
                        res[c] = pdf[c]
            yield res[full_names]

    return df.mapInPandas(_batch, full_schema)


def applymap(
    df: DataFrame,
    func: Callable,
    cols: list[str] | None = None,
    force_udf: bool = False,
) -> DataFrame:
    """O3 — the same scalar UDF applied to every cell of every column
    (reference: swifter/swifter.py:483-521).

    Native route when the UDF builds a Column expression; otherwise one
    scalar pandas_udf instantiated per column dtype. All map-side, no
    shuffle.
    """
    targets = cols or df.columns
    exprs: list[Column] = []
    udf_cache: dict[str, Callable] = {}
    for c in df.columns:
        if c not in targets:
            exprs.append(F.col(c))
            continue
        native = None if force_udf else _try_native_column(func, F.col(c))
        if native is not None:
            exprs.append(native.alias(c))
            continue
        rtype = infer_series_return_type(df, c, func)
        key = rtype.simpleString()
        if key not in udf_cache:

            @F.pandas_udf(rtype)
            def _cellwise(s: pd.Series) -> pd.Series:
                return s.apply(func)

            udf_cache[key] = _cellwise
        exprs.append(udf_cache[key](F.col(c)).alias(c))
    return df.select(*exprs)


def apply_columns(
    df: DataFrame,
    func: Callable,
    cols: list[str] | None = None,
    returns: T.DataType | str = "double",
    raw: bool = False,
) -> DataFrame:
    """O2 ``axis=0`` — column-wise apply: the UDF reduces each column
    (a Series) to one value; result is a single row with one field per
    input column (pandas ``df.apply(func, axis=0)`` shape).

    The reference could never parallelize this (dask path requires
    axis==1, swifter.py:434, SURVEY §2.4 R5); here each column reduces
    through a GROUPED_AGG pandas_udf over the whole frame — partial
    aggregation per partition, one tiny final merge. Note Spark's
    grouped-agg UDF ships each column's values to Python per
    partition; for built-in reductions prefer df.agg(...) directly.
    """
    targets = cols or df.columns

    # type-hint form (Series -> scalar marks GROUPED_AGG); the actual
    # Spark return type is `returns` — the hint only classifies the UDF
    def _reduce(s: pd.Series) -> float:
        # raw= parity with pandas df.apply(axis=0, raw=True): the
        # reducer sees a bare ndarray instead of a Series
        return func(s.to_numpy()) if raw else func(s)

    u = F.pandas_udf(_reduce, returns)
    return df.agg(*[u(F.col(c)).alias(c) for c in targets])


def apply_partitions(
    df: DataFrame,
    func: Callable,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """O1's per-partition route — the exact analog of the reference's
    ``dd.map_partitions`` path (swifter.py:239-244): ``func`` receives
    a whole partition as a pandas DataFrame and returns a DataFrame.

    Schema comes from running ``func`` on a driver-side sample when
    not given (the reference's dask ``meta`` trick, swifter.py:260).
    Embarrassingly parallel: no shuffle, Arrow batches in and out.
    """
    if schema is None:
        sample = sample_pandas(df)
        out = func(sample)
        schema = T.StructType(
            [
                T.StructField(str(c), spark_type_for_dtype(out[c].dtype))
                for c in out.columns
            ]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # concatenate the partition's Arrow batches so ``func`` sees
        # the WHOLE partition (dask map_partitions semantics — matters
        # for funcs with intra-partition state, e.g. cumulative ops);
        # memory cost = one partition, same envelope as dask
        parts = list(batches)
        if parts:
            yield func(pd.concat(parts, ignore_index=True))

    return df.mapInPandas(run, schema)
