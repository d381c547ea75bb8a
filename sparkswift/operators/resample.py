"""O6 — resample (time-bucket regroup + per-bucket agg).

Reference: factory `/root/reference/swifter/swifter.py:174-220`, class
:766-824 — pandas ``resample(rule).apply(func)``: tumbling time
buckets, per-bucket aggregation, ``label``/``closed`` edge rules.

Spark mapping (SURVEY.md §2.1 O6): ``groupBy(F.window(ts, rule))`` —
a hash shuffle on the bucket key with map-side partial aggregation for
native reducers; ``applyInPandas`` per bucket for arbitrary UDFs.
``label='left'|'right'`` selects ``window.start`` vs ``window.end`` as
the emitted bucket timestamp (pandas default 'left' for most rules).

The streaming variant (same op + ``withWatermark``) lives in
sparkswift/streaming/ — identical bucket semantics on an unbounded
source.

Scale note: bucket count = time-range/rule, independent of row count;
partial agg means shuffle volume is O(buckets × groups), not O(rows).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkswift.operators.rolling import _BUILTIN


def resample_agg(
    df: DataFrame,
    ts_col: str,
    rule: str,
    aggs: dict[str, tuple[str, str] | Column],
    label: str = "left",
    bucket_col: str = "bucket_ts",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation with native reducers.

    ``aggs`` maps output name → ``(column, builtin_agg)`` or a ready
    Column. ``rule`` is a Spark duration string ('1 hour', '3 minutes').
    ``extra_keys`` adds grouping keys alongside the time bucket
    (per-entity resample).
    """
    win = F.window(F.col(ts_col), rule)
    keys = [win] + [F.col(k) for k in (extra_keys or [])]
    agg_cols = []
    for out_name, spec in aggs.items():
        if isinstance(spec, Column):
            agg_cols.append(spec.alias(out_name))
        else:
            col, name = spec
            agg_cols.append(_BUILTIN[name](F.col(col)).alias(out_name))
    out = df.groupBy(*keys).agg(*agg_cols)
    edge = "start" if label == "left" else "end"
    return out.select(
        F.col(f"window.{edge}").alias(bucket_col),
        *(extra_keys or []),
        *[F.col(n) for n in aggs],
    )


def resample_apply_udf(
    df: DataFrame,
    ts_col: str,
    rule: str,
    func: Callable,
    schema: T.StructType | str,
    label: str = "left",
    bucket_col: str = "bucket_ts",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Arbitrary per-bucket pandas UDF: the bucket's rows arrive as a
    pandas DataFrame; the UDF returns a DataFrame. Spark shuffles by
    (bucket, extra_keys) — each bucket fits one task at any total scale
    as long as rule × entity granularity keeps buckets bounded."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    edge = "start" if label == "left" else "end"
    keys = (extra_keys or [])
    bucketed = (
        df.withColumn("__w", F.window(F.col(ts_col), rule))
        .withColumn(bucket_col, F.col(f"__w.{edge}"))
        .drop("__w")
    )

    def _per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out = func(pdf)
        if not isinstance(out, pd.DataFrame):
            out = pd.DataFrame({"result": [out]})
        for k in reversed([bucket_col, *keys]):
            if k not in out.columns:
                out.insert(0, k, pdf[k].iloc[0])
        return out

    return bucketed.groupBy(bucket_col, *keys).applyInPandas(_per_bucket, schema)
