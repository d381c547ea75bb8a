"""The statusTracker progress bridge must observe real stage
activity while an action runs."""

import time

from pyspark.sql import functions as F

from sparkswift.progress import progress


def test_progress_sees_stage_activity(spark):
    import pandas as pd

    def slow(batches):
        for pdf in batches:
            time.sleep(0.3)
            yield pd.DataFrame({"n": [len(pdf)]})

    df = spark.range(0, 6400, numPartitions=64).mapInPandas(slow, "n long")
    with progress(spark, desc="test", interval=0.05) as p:
        total = df.agg(F.sum("n")).collect()[0][0]
    assert total == 6400
    assert p.updates, "poller saw no active stages during a ~0.6s job"
    # the 64-task map stage must have been observed at some poll
    assert max(t for _, t in p.updates) >= 64
