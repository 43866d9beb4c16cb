"""Single-task stage audit: run registry queries at a given SF and report
how much executor time each spends in stages with numTasks == 1 — work
that ran serialized no matter what the progress bar showed. The method
behind BASELINE.md's "Registry-wide single-task stage audit".

Usage: python tools/stage_audit.py [sf_dir] [query ...]   (default: all)
Prints one line per query: total stage time, single-task stage time, and
the single-task fraction; flags queries over 30% serialized.

Single-task time is NOT automatically a scale bug — bounded driver-side
fits, one-row offset tables, and final LIMIT merges are single-task by
design — but anything large here must have a documented reason.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_UI"] = "1"
    from magiceye_spark.session import get_spark
    from magiceye_spark import registry

    spark = get_spark("stage-audit")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = registry.queries()
    names = sys.argv[2:] or list(qs)
    spark.range(1).count()  # warm

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.load(r)

    flagged = 0
    for name in names:
        before = {s["stageId"] for s in stages()}
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {type(e).__name__}: {str(e)[:80]}")
            continue
        finally:
            spark.catalog.clearCache()
        new = [s for s in stages() if s["stageId"] not in before]
        tot = sum(s["executorRunTime"] for s in new)
        single = sum(s["executorRunTime"] for s in new if s["numTasks"] == 1)
        frac = single / tot if tot else 0.0
        mark = "  <-- AUDIT" if frac > 0.3 and single > 2000 else ""
        print(f"{name:36s} total={tot/1000:7.2f}s single_task={single/1000:7.2f}s frac={frac:5.1%}{mark}")
        flagged += bool(mark)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
