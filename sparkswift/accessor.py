"""Fluent accessor — the user-facing analog of ``df.swifter``.

``swift(df)`` wraps a pyspark DataFrame in a :class:`SwiftFrame`
exposing the reference's surface (SURVEY.md §2.1 signatures):
``apply`` / ``applymap`` / ``groupby().apply`` / ``rolling().apply`` /
``resample().apply`` plus the chainable config knobs
(`/root/reference/swifter/swifter.py:99-138`). Knobs that only made
sense for the dask/ray backends (``set_dask_threshold``,
``set_dask_scheduler``, ``allow_dask_on_strings``) are retained as
documented no-ops for API compatibility; ``force_parallel`` maps to
"skip the native-expression route"; ``set_npartitions`` maps to
``repartition``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from sparkswift.operators import apply as _apply
from sparkswift.operators import groupby as _groupby
from sparkswift.operators import resample as _resample
from sparkswift.operators import rolling as _rolling


# module-level defaults — the analog of ``swifter.set_defaults``
# (reference swifter.py:34-70, which monkey-patches accessor __init__
# kwargs globally); new SwiftFrames start from these
_DEFAULTS: dict = {"npartitions": None, "force_parallel": False}


def set_defaults(npartitions: int | None = None, force_parallel: bool = False) -> None:
    """Global defaults for every subsequently-built SwiftFrame.
    Reference knobs without a Spark meaning (progress_bar desc,
    dask threshold/scheduler, allow_dask_on_strings) are accepted by
    the per-frame setters as no-ops instead."""
    _DEFAULTS["npartitions"] = npartitions
    _DEFAULTS["force_parallel"] = force_parallel


class SwiftFrame:
    def __init__(self, df: DataFrame):
        self._df = df
        self._force_udf = bool(_DEFAULTS["force_parallel"])
        if _DEFAULTS["npartitions"]:
            self._df = self._df.repartition(_DEFAULTS["npartitions"])

    @property
    def df(self) -> DataFrame:
        return self._df

    # ---- config surface (reference swifter.py:99-138, base.py:55-64) ----
    def set_npartitions(self, n: int | None = None) -> "SwiftFrame":
        if n:
            self._df = self._df.repartition(n)
        return self

    def force_parallel(self, enable: bool = True) -> "SwiftFrame":
        """Skip the native-expression attempt (reference :131-138)."""
        self._force_udf = enable
        return self

    def set_dask_threshold(self, seconds: float = 1) -> "SwiftFrame":
        return self  # obsolete: Catalyst+AQE plan adaptively (SURVEY §4 R3)

    def set_dask_scheduler(self, scheduler: str = "processes") -> "SwiftFrame":
        return self  # obsolete: deploy-mode concern, not per-query (R5)

    def allow_dask_on_strings(self, enable: bool = True) -> "SwiftFrame":
        return self  # obsolete: Arrow handles strings (R4)

    def progress_bar(self, enable: bool = True, desc: str | None = None) -> "SwiftFrame":
        """Reference knob (swifter.py:115-121). Spark is lazy — there
        is no progress until an action runs; wrap the action in
        ``sparkswift.progress.progress(spark, desc)`` (statusTracker
        poller) for the live bar. Chainable no-op here for API compat."""
        return self

    # ---- operators ----
    def apply(
        self,
        func: Callable,
        axis: int = 0,
        col: str | None = None,
        **kw,
    ) -> DataFrame:
        """O1 (``col`` given or single-column frame) / O2 (``axis=1``)."""
        if axis == 1:
            kw.setdefault("force_udf", self._force_udf)
            return _apply.apply_rows(self._df, func, **kw)
        target = col or (self._df.columns[0] if len(self._df.columns) == 1 else None)
        if target is None:
            raise ValueError("column-wise apply needs col= or a 1-column frame")
        return _apply.apply_series(self._df, target, func, force_udf=self._force_udf, **kw)

    def applymap(self, func: Callable, **kw) -> DataFrame:
        return _apply.applymap(self._df, func, force_udf=self._force_udf, **kw)

    def groupby(
        self,
        *keys: str,
        subset: list[str] | None = None,
        level: list[str] | str | None = None,
    ) -> "SwiftGroupBy":
        """``level=`` takes index-level NAMES (the engine models a pandas
        index as named columns — see operators/groupby.py); they are
        appended to the positional keys. Validated here with the same
        rules as groupby_apply so a pandas-style ``level=0`` fails with
        a helpful TypeError, not a downstream analysis error."""
        if level is not None:
            keys = (*keys, *_groupby.validate_level(self._df, level))
        return SwiftGroupBy(self._df, list(keys), subset)

    def rolling(
        self,
        window: int | str,
        on: str,
        partition_by: list[str] | None = None,
        center: bool = False,
        min_periods: int | None = None,
        closed: str = "right",
    ) -> "SwiftRolling":
        return SwiftRolling(
            self._df, window, on, partition_by, center, min_periods, closed
        )

    def resample(self, rule: str, on: str, extra_keys: list[str] | None = None) -> "SwiftResampler":
        return SwiftResampler(self._df, rule, on, extra_keys)

    def cogroup(
        self, other: DataFrame | "SwiftFrame", *keys: str
    ) -> "SwiftCoGroup":
        """Two-frame grouped apply — the fluent face of
        :func:`sparkswift.operators.groupby.cogroup_apply` (the
        cogrouped-map Arrow entry point): ``swift(a).cogroup(b,
        "k").apply(fn, schema=...)`` aligns the per-key slices of both
        frames through one pandas UDF (merge_asof-class shapes)."""
        rdf = other._df if isinstance(other, SwiftFrame) else other
        return SwiftCoGroup(self._df, rdf, list(keys))


class SwiftCoGroup:
    def __init__(self, left: DataFrame, right: DataFrame, keys: list[str]):
        self._l, self._r, self._keys = left, right, keys

    def apply(self, func: Callable, schema=None, **kw) -> DataFrame:
        return _groupby.cogroup_apply(
            self._l, self._r, self._keys, func, schema=schema, **kw
        )


class SwiftGroupBy:
    def __init__(self, df: DataFrame, keys: list[str], subset: list[str] | None):
        self._df, self._keys, self._subset = df, keys, subset

    def __getitem__(self, cols) -> "SwiftGroupBy":
        cols = [cols] if isinstance(cols, str) else list(cols)
        return SwiftGroupBy(self._df, self._keys, cols)

    def apply(self, func: Callable, schema=None, **kw) -> DataFrame:
        return _groupby.groupby_apply(
            self._df, self._keys, func, schema=schema, subset=self._subset, **kw
        )

    def agg_udf(self, agg_funcs, **kw) -> DataFrame:
        return _groupby.groupby_agg_udf(self._df, self._keys, agg_funcs, **kw)

    def rolling(
        self,
        window: int | str,
        on: str,
        center: bool = False,
        min_periods: int | None = None,
        closed: str = "right",
    ) -> "SwiftRolling":
        """pandas ``groupby(keys).rolling(...)`` sugar: the group keys
        become the window's ``partition_by`` — per-entity rolling, the
        scale-correct shape (each entity's series sorts in one task)."""
        return SwiftRolling(
            self._df, window, on, list(self._keys), center, min_periods, closed
        )


class SwiftRolling:
    def __init__(self, df, window, on, partition_by, center, min_periods, closed="right"):
        self._df, self._window, self._on = df, window, on
        self._partition_by, self._center, self._min_periods = partition_by, center, min_periods
        self._closed = closed

    def apply(self, func, order_by: str, **kw) -> DataFrame:
        """Built-in name (str) → native window agg; callable → UDF path."""
        if isinstance(func, str):
            return _rolling.rolling_agg(
                self._df, order_by, self._window, func, self._on,
                partition_by=self._partition_by, center=self._center,
                min_periods=self._min_periods, closed=self._closed, **kw,
            )
        return _rolling.rolling_apply_udf(
            self._df, order_by, self._window, func, self._on,
            partition_by=self._partition_by, min_periods=self._min_periods, **kw,
        )


class SwiftResampler:
    def __init__(self, df, rule, on, extra_keys):
        self._df, self._rule, self._on, self._extra_keys = df, rule, on, extra_keys

    def agg(self, aggs, **kw) -> DataFrame:
        return _resample.resample_agg(
            self._df, self._on, self._rule, aggs, extra_keys=self._extra_keys, **kw
        )

    def apply(self, func, schema, **kw) -> DataFrame:
        return _resample.resample_apply_udf(
            self._df, self._on, self._rule, func, schema, extra_keys=self._extra_keys, **kw
        )


def swift(df: DataFrame) -> SwiftFrame:
    return SwiftFrame(df)
