"""O4 — grouped applies (reference ``df.swifter.groupby(...).apply``).

The reference implements this with driver-side value partitioning +
Ray workers (`/root/reference/swifter/swifter.py:553-639`): unique key
values are split into chunks with ``np.array_split`` (:591-596), each
chunk shipped to a Ray task that runs ``chunk.groupby(by).apply(func)``
(:600-603), results concat'd and ``sort_index()``-ed on the driver
(:628).

Spark subsumes the whole mechanism: ``df.groupBy(keys).applyInPandas``
hash-shuffles rows by **all** keys (strictly better than the
reference's first-key-only chunking, which is skew-prone — SURVEY.md
§2.4), runs the UDF per group on executors, and leaves the result
distributed (no driver concat — the scalability win).

Scalar-per-group reducers (the reference's tests mostly return one
float per group, swifter_tests.py:48-49) get a cheaper path:
``GROUPED_AGG`` pandas_udf inside ``groupBy().agg`` — partial
aggregation machinery applies and results stay tiny.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkswift.plans.inference import schema_from_pandas, spark_type_for_dtype


def _sample_groups_pandas(df: DataFrame, keys: list[str], n_groups: int = 20) -> pd.DataFrame:
    """Driver-side sample of *whole groups* (schema inference needs
    complete groups, not row samples). Bounded: n_groups distinct keys."""
    key_sample = df.select(*keys).distinct().limit(n_groups)
    sampled = df.join(F.broadcast(key_sample), on=keys, how="left_semi")
    return sampled.toPandas()


def groupby_apply(
    df: DataFrame,
    keys: list[str] | str,
    func: Callable,
    schema: T.StructType | str | None = None,
    subset: list[str] | None = None,
    sort_output: bool = True,
    dropna: bool = True,
    args: tuple = (),
    **kwds,
) -> DataFrame:
    """Group → pandas-frame UDF → frame, via ``applyInPandas``.

    ``subset`` mirrors the reference's ``groupby(...)[cols]`` column
    selection (swifter/swifter.py:584-586): the UDF sees only
    ``keys + subset``. ``sort_output`` mirrors the ``sort_index()``
    output ordering (swifter/swifter.py:628).

    The UDF receives the group's pandas DataFrame and may return a
    DataFrame (group→rows), a Series, or a scalar (group→one row);
    non-frame results are normalized to a one-row frame keyed by the
    group, matching pandas ``groupby().apply`` shape rules.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    work = df.select(*keys, *subset) if subset else df
    if dropna:
        # pandas groupby(dropna=True) default: null keys form no group;
        # Spark's groupBy keeps them, so filter to match
        for k in keys:
            work = work.filter(F.col(k).isNotNull())

    if args or kwds:
        base = func
        func = lambda g, _b=base: _b(g, *args, **kwds)  # noqa: E731

    def _run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        keyvals = {k: pdf[k].iloc[0] for k in keys}
        body = pdf.drop(columns=keys) if len(pdf.columns) > len(keys) else pdf
        out = func(body)
        if isinstance(out, pd.DataFrame):
            res = out.reset_index(drop=True)
        elif isinstance(out, pd.Series):
            res = out.to_frame().T.reset_index(drop=True)
        else:
            res = pd.DataFrame({"result": [out]})
        for k in reversed(keys):
            if k not in res.columns:
                res.insert(0, k, keyvals[k])
        return res

    if schema is None:
        sample = _sample_groups_pandas(df if not subset else work, keys)
        pieces = [_run_one(g) for _, g in sample.groupby(keys, sort=False)]
        schema = schema_from_pandas(pd.concat(pieces, ignore_index=True))
    elif isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    out = work.groupBy(*keys).applyInPandas(_run_one, schema)
    return out.orderBy(*keys) if sort_output else out


def groupby_agg_udf(
    df: DataFrame,
    keys: list[str] | str,
    agg_funcs: dict[str, tuple[str, Callable]],
    returns: T.DataType | str = "double",
    sort_output: bool = True,
) -> DataFrame:
    """Scalar-per-group reducers via GROUPED_AGG pandas_udf.

    ``agg_funcs`` maps output column name → (input column, Series→scalar
    callable). Cheaper than ``applyInPandas`` for group→scalar shapes:
    Spark's agg operator handles spill and the result set is one row per
    group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    aggs = []
    for out_name, (in_col, fn) in agg_funcs.items():
        u = F.pandas_udf(fn, returns, functionType=F.PandasUDFType.GROUPED_AGG)
        aggs.append(u(F.col(in_col)).alias(out_name))
    out = df.groupBy(*keys).agg(*aggs)
    return out.orderBy(*keys) if sort_output else out
