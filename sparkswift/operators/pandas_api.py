"""O7 — distributed-pandas passthrough (reference: the modin
ParallelSeriesAccessor / ParallelDataFrameAccessor,
`/root/reference/swifter/parallel_accessor.py:81-168`).

The reference registers ``.swifter`` on modin objects and, after a
vectorize-try, simply delegates to the engine's own ``apply``. The
Spark-native analog is the pandas API on Spark (``pyspark.pandas``):
already distributed, so the passthrough does exactly what the
reference does — try the UDF vectorized over the whole object, fall
back to the engine's elementwise apply.
"""

from __future__ import annotations

from typing import Callable


def ps_apply(obj, func: Callable, *args, **kwds):
    """Vectorize-try then delegate (mirrors
    parallel_accessor.py:96-104/120-128): call ``func`` on the whole
    pandas-on-Spark object; if that fails, use its ``apply``."""
    try:
        out = func(obj, *args, **kwds)
        # a vectorized call must return a like-shaped ps object
        if type(out).__module__.startswith("pyspark.pandas"):
            return out
    except Exception:
        pass
    return obj.apply(func, args=args, **kwds)
