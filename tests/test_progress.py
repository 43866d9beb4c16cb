"""ProgressReporter must observe live stage/task counts while a job runs."""

from pyspark.sql import functions as F

from magiceye_spark.progress import ProgressReporter


def test_progress_reporter_sees_running_job(spark):
    seen = []
    with ProgressReporter(spark, seen.append, interval_s=0.05):
        # a job slow enough to be observed mid-flight
        (
            spark.range(0, 2_000_000, 1, 8)
            .select(F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256))))
            .collect()
        )
    assert seen, "no progress events captured"
    assert all(ev.total_tasks >= ev.completed_tasks >= 0 for ev in seen)
    assert any(ev.active_stages >= 1 for ev in seen)
