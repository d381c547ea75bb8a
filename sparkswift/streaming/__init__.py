from sparkswift.streaming.ops import (
    events_stream,
    stream_resample,
    run_stream_to_batch,
    sessionize,
    stateful_running_totals,
)

__all__ = [
    "events_stream",
    "stream_resample",
    "run_stream_to_batch",
    "sessionize",
    "stateful_running_totals",
]
