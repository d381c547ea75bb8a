"""O7 accessor registration — the reference's parallel/modin accessor
(`/root/reference/swifter/parallel_accessor.py:81-168`,
``register_modin`` :161-168) re-expressed for pandas API on Spark.

The reference injects a ``.swifter`` attribute onto modin Series /
DataFrame so modin users get the vectorize-try-then-delegate behavior
with zero code changes. The Spark-native analog of modin IS
``pyspark.pandas`` (SURVEY §1.1), and Spark ships a PUBLIC extension
API for exactly this kind of registration
(``pyspark.pandas.extensions.register_*_accessor``) — no ``__init__``
monkey-patching needed:

    import sparkswift
    sparkswift.register_parallel()

    psdf["x"].swifter.apply(lambda s: s * 2)      # vectorized
    psdf.swifter.apply(my_row_func, axis=1)        # delegated

For OTHER distributed-pandas clones (anything constructing objects via
``__init__``), the reference-style injection functions are provided
verbatim (:func:`register_parallel_series_accessor` /
:func:`register_parallel_dataframe_accessor`).
"""

from __future__ import annotations

import warnings

from sparkswift.operators.pandas_api import ps_apply


class _ParallelSwifterBase:
    """Chainable config surface — the dask/ray knobs warn exactly like
    the reference's parallel accessor (parallel_accessor.py:7-45)."""

    def __init__(self, obj):
        self._obj = obj

    def set_npartitions(self, npartitions: int | None = None):
        if npartitions and hasattr(self._obj, "spark") and hasattr(
            self._obj.spark, "repartition"
        ):
            self._obj = self._obj.spark.repartition(npartitions)
        elif npartitions:
            warnings.warn("repartition unavailable on this object; no-op.")
        return self

    def set_dask_threshold(self, dask_threshold: float = 1):
        warnings.warn("Parallel Accessor does not use Dask.")
        return self

    def set_dask_scheduler(self, scheduler: str = "processes"):
        warnings.warn("Parallel Accessor does not use Dask.")
        return self

    def progress_bar(self, enable: bool = True, desc: str | None = None):
        warnings.warn(
            "Spark is lazy — wrap the ACTION in "
            "sparkswift.progress.progress(spark, desc) for a live bar."
        )
        return self

    def allow_dask_on_strings(self, enable: bool = True):
        warnings.warn("Parallel Accessor does not use Dask.")
        return self

    def force_parallel(self, enable: bool = True):
        warnings.warn(
            "pandas-on-Spark objects are always distributed; no-op."
        )
        return self

    def rolling(self, *args, **kwds):
        # reference parity: parallel accessors cannot create Rolling
        # objects (parallel_accessor.py:47-60) — use swift(df).rolling
        raise NotImplementedError(
            "Parallel Accessor cannot create Rolling objects; use "
            "sparkswift.swift(df).rolling(...) on the Spark frame."
        )

    def resample(self, *args, **kwds):
        raise NotImplementedError(
            "Parallel Accessor cannot create Resampler objects; use "
            "sparkswift.swift(df).resample(...) on the Spark frame."
        )


class ParallelSeriesAccessor(_ParallelSwifterBase):
    def apply(self, func, convert_dtype: bool = True, args: tuple = (), **kwds):
        """Vectorize-try then delegate (parallel_accessor.py:82-106)."""
        if "axis" in kwds:
            kwds.pop("axis")
            warnings.warn("Axis keyword not necessary because applying on a Series.")
        return ps_apply(self._obj, func, *args, **kwds)


class ParallelDataFrameAccessor(_ParallelSwifterBase):
    def apply(
        self,
        func,
        axis: int = 0,
        raw: bool = False,
        result_type: str | None = None,
        args: tuple = (),
        **kwds,
    ):
        """Vectorize-try then delegate (parallel_accessor.py:110-132).

        ``raw=`` / ``result_type=`` are pandas-on-Spark ``apply`` gaps
        — route those through the engine operator instead
        (``swift(psdf.to_spark()).apply(func, axis=1, raw=..., ...)``).
        """
        if raw or result_type is not None:
            raise NotImplementedError(
                "pandas-on-Spark apply has no raw=/result_type=; use "
                "sparkswift.swift(psdf.to_spark()).apply(func, axis=1, "
                "raw=..., result_type=...) for those."
            )
        try:
            out = func(self._obj, *args, **kwds)
            if type(out).__module__.startswith("pyspark.pandas"):
                return out
        except Exception:
            pass
        return self._obj.apply(func, axis=axis, args=args, **kwds)


def register_parallel() -> None:
    """Register ``.swifter`` on pandas-on-Spark Series and DataFrame —
    the :func:`register_modin` analog, via Spark's public accessor
    extension API (idempotent; re-registration warns and proceeds)."""
    from pyspark.pandas.extensions import (
        register_dataframe_accessor,
        register_series_accessor,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)  # override warning
        register_series_accessor("swifter")(ParallelSeriesAccessor)
        register_dataframe_accessor("swifter")(ParallelDataFrameAccessor)


def register_parallel_series_accessor(series_to_register) -> None:
    """Reference-style injection (parallel_accessor.py:135-146) for
    pandas-likes without an extensions API."""
    current_init = series_to_register.__init__

    def new_init(self, *args, **kwds):
        current_init(self, *args, **kwds)
        self.swifter = ParallelSeriesAccessor(self)

    series_to_register.__init__ = new_init


def register_parallel_dataframe_accessor(dataframe_to_register) -> None:
    """Reference-style injection (parallel_accessor.py:148-159)."""
    current_init = dataframe_to_register.__init__

    def new_init(self, *args, **kwds):
        current_init(self, *args, **kwds)
        self.swifter = ParallelDataFrameAccessor(self)

    dataframe_to_register.__init__ = new_init
