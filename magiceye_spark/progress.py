"""P1 parity: run progress reporting.

The reference streams ``ProgressEvent``s from its worker to a TUI over an
mpsc channel (``src/action/run/tui.rs:37-47``, ``src/action/run.rs:44-57``)
— per-table fetch/compare counters. In Spark the equivalent signal is stage/
task progress from the scheduler; this module surfaces it without any TUI:
a background thread polls ``SparkContext.statusTracker`` while a job runs
and reports (active stages, completed/total tasks) to a callback.

This is observability, not an operator (SURVEY.md §2 P1) — the CLI uses it
to print progress lines; tests assert the poller actually observes a
running job.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ProgressEvent:
    """One progress observation: tasks completed/total over active stages."""

    active_stages: int
    completed_tasks: int
    total_tasks: int


class ProgressReporter:
    """Poll Spark's status tracker on a background thread while work runs.

    Usage::

        with ProgressReporter(spark, callback) as p:
            df.write.parquet(...)

    The callback receives :class:`ProgressEvent`s at ``interval_s`` cadence
    (only while at least one stage is active). Replaces the reference's
    channel+TUI (run.rs:44-64) with the scheduler's own truth.
    """

    def __init__(
        self,
        spark: SparkSession,
        callback: Callable[[ProgressEvent], None],
        interval_s: float = 0.2,
    ) -> None:
        self._tracker = spark.sparkContext.statusTracker()
        self._callback = callback
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self.events: list[ProgressEvent] = []

    def _poll(self) -> None:
        while not self._stop.is_set():
            stage_ids = self._tracker.getActiveStageIds()
            if stage_ids:
                done = total = 0
                for sid in stage_ids:
                    info = self._tracker.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        total += info.numTasks
                ev = ProgressEvent(len(stage_ids), done, total)
                self.events.append(ev)
                self._callback(ev)
            time.sleep(self._interval)

    def __enter__(self) -> "ProgressReporter":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
