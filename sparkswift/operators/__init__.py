from sparkswift.operators.apply import apply_series, apply_rows, applymap
from sparkswift.operators.groupby import cogroup_apply, groupby_apply, groupby_agg_udf
from sparkswift.operators.rolling import rolling_agg, rolling_apply_udf
from sparkswift.operators.resample import resample_agg

__all__ = [
    "apply_series",
    "apply_rows",
    "applymap",
    "cogroup_apply",
    "groupby_apply",
    "groupby_agg_udf",
    "rolling_agg",
    "rolling_apply_udf",
    "resample_agg",
]
