"""Progress reporting — the Spark analog of the reference's
tqdm bridge (`/root/reference/swifter/tqdm_dask_progressbar.py:5-37`
and the ``progress_bar`` knob, `swifter/swifter.py:115-121`).

Spark is lazy, so progress only exists while an *action* runs; the
bridge is therefore a context manager wrapped around the action:

    with progress(spark, desc="dedup pass"):
        df.write.parquet(out)

A daemon thread polls ``sparkContext.statusTracker()`` (public API)
and reports completed/total tasks across active stages. Uses tqdm
when importable, else plain stderr lines — no hard dependency, same
policy as the reference (tqdm is its direct dependency, ours is
optional because the Spark UI already exists).
"""

from __future__ import annotations

import sys
import threading
import time
from contextlib import contextmanager

try:  # optional — fall back to stderr lines
    from tqdm.auto import tqdm
except Exception:  # pragma: no cover
    tqdm = None


class _Poller(threading.Thread):
    def __init__(self, sc, desc: str, interval: float):
        super().__init__(daemon=True)
        self._tracker = sc.statusTracker()
        self._desc = desc
        self._interval = interval
        self._halt = threading.Event()
        self.updates: list[tuple[int, int]] = []  # (done, total) samples

    def _snapshot(self) -> tuple[int, int]:
        done = total = 0
        for sid in self._tracker.getActiveStageIds():
            info = self._tracker.getStageInfo(sid)
            if info:
                done += info.numCompletedTasks
                total += info.numTasks
        return done, total

    def run(self) -> None:
        bar = None
        while not self._halt.wait(self._interval):
            done, total = self._snapshot()
            if total == 0:
                continue
            self.updates.append((done, total))
            if tqdm is not None:
                if bar is None:
                    bar = tqdm(total=total, desc=self._desc)
                bar.total = total
                bar.n = done
                bar.refresh()
            else:
                sys.stderr.write(f"\r{self._desc}: {done}/{total} tasks")
                sys.stderr.flush()
        if bar is not None:
            bar.close()
        elif self.updates:
            sys.stderr.write("\n")

    def stop(self) -> None:
        self._halt.set()


@contextmanager
def progress(spark, desc: str = "sparkswift", interval: float = 0.2):
    """Report task progress for every action run inside the block.
    Yields the poller (its ``updates`` list is inspectable — used by
    tests to assert the bridge saw real stage activity)."""
    p = _Poller(spark.sparkContext, desc, interval)
    p.start()
    try:
        yield p
    finally:
        p.stop()
        p.join(timeout=2)
