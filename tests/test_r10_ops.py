"""Round-10 operator tests: the fs_swap_dirs _MANIFEST completeness proof
(upgrade over the _SUCCESS heuristic), the drain() loud-timeout helper,
and the cmd_ingest scheme-aware store-existence check."""

import os

import pytest

from magiceye_spark import fsops


def _strip_success(d):
    p = os.path.join(d, "_SUCCESS")
    if os.path.exists(p):
        os.remove(p)


def test_swap_writes_manifest_and_next_swap_trusts_it(spark, tmp_path):
    """A directory promoted by fs_swap_dirs carries a _MANIFEST; a later
    swap that finds a crash-leftover *_old clears it on the strength of
    the manifest alone — even on a cluster with success markers disabled
    (no _SUCCESS under live)."""
    live = str(tmp_path / "t")
    spark.range(5).write.parquet(live)
    tmp1 = str(tmp_path / "t_c1")
    spark.range(7).write.parquet(tmp1)
    fsops.fs_swap_dirs(spark, tmp1, live)
    assert os.path.exists(os.path.join(live, "_MANIFEST"))
    assert fsops._manifest_proves_complete(spark, live) is True

    # markers-disabled shape: live has a valid manifest but no _SUCCESS
    _strip_success(live)
    os.makedirs(str(tmp_path / "t_old"))  # crash leftover
    tmp2 = str(tmp_path / "t_c2")
    spark.range(9).write.parquet(tmp2)
    fsops.fs_swap_dirs(spark, tmp2, live)
    assert spark.read.parquet(live).count() == 9
    assert not os.path.exists(str(tmp_path / "t_old"))


def test_failing_manifest_is_authoritative_over_success_marker(spark, tmp_path):
    """The S3A false-positive shape the _SUCCESS heuristic cannot catch:
    an interrupted tmp→live rename copies objects in listing order, so a
    PARTIAL live already holds _MANIFEST and _SUCCESS but not all part
    files. The manifest check must fail, must NOT fall back to the
    marker, and the swap must refuse to delete *_old."""
    live = str(tmp_path / "t")
    spark.range(5).repartition(4).write.parquet(live)
    tmp1 = str(tmp_path / "t_c1")
    spark.range(7).write.parquet(tmp1)
    fsops.fs_swap_dirs(spark, tmp1, live)  # live now has a manifest

    # simulate the partial copy: drop one manifested part file, keep _SUCCESS
    parts = [f for f in os.listdir(live) if f.endswith(".parquet")]
    os.remove(os.path.join(live, parts[0]))
    assert os.path.exists(os.path.join(live, "_SUCCESS"))
    assert fsops._manifest_proves_complete(spark, live) is False

    old = str(tmp_path / "t_old")
    spark.range(9).write.parquet(old)  # the only complete copy
    tmp2 = str(tmp_path / "t_c2")
    spark.range(3).write.parquet(tmp2)
    with pytest.raises(IOError, match="_MANIFEST"):
        fsops.fs_swap_dirs(spark, tmp2, live)
    assert spark.read.parquet(old).count() == 9  # untouched for recovery


def test_manifest_absent_falls_back_to_success(spark, tmp_path):
    """Pre-manifest stores (written directly, never swapped) keep the old
    best-effort behavior: _SUCCESS present → old cleared, swap proceeds."""
    live = str(tmp_path / "t")
    tmp = str(tmp_path / "t_compact")
    old = str(tmp_path / "t_old")
    spark.range(5).write.parquet(live)
    spark.range(7).write.parquet(tmp)
    spark.range(1).write.parquet(old)
    assert fsops._manifest_proves_complete(spark, live) is None
    fsops.fs_swap_dirs(spark, tmp, live)
    assert spark.read.parquet(live).count() == 7
    assert not os.path.exists(old)


def test_drain_raises_on_timeout(spark, tmp_path):
    """drain() must convert awaitTermination's silent False into a loud
    TimeoutError and stop the query so it cannot pollute later seats."""
    from magiceye_spark.streaming import drain

    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    q = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()  # continuous trigger: never terminates on its own
    )
    with pytest.raises(TimeoutError, match="did not terminate"):
        drain(q, 0.1)
    assert not q.isActive


# ------------------- small-graph union-find fast path: label parity

def test_unionfind_fast_path_label_parity(spark):
    """The r10 driver-side union-find fast path must produce labels
    BYTE-IDENTICAL to the distributed fixpoint (min node id per
    component) on a randomized graph mixing chains, cliques, islands and
    hubs — the admission-graph shapes it exists for."""
    import random

    from magiceye_spark.llmops.graph import connected_components

    rng = random.Random(20260815)
    edges = []
    base = 0
    for _ in range(40):  # chains
        n = rng.randint(2, 30)
        edges += [(base + i, base + i + 1) for i in range(n - 1)]
        base += n + rng.randint(0, 3)  # gaps → singleton-free id space
    for _ in range(10):  # cliques
        ids = [base + i for i in range(rng.randint(3, 8))]
        edges += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        base += len(ids)
    for _ in range(5):  # hubs
        hub = base
        edges += [(hub, base + 1 + i) for i in range(rng.randint(5, 40))]
        base += 50
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        r.node: r.comp_id for r in connected_components(df).collect()
    }
    dist = {
        r.node: r.comp_id
        for r in connected_components(df, small_graph_cap=0).collect()
    }
    assert fast == dist
    assert len(fast) == len({n for e in edges for n in e})


def test_unionfind_fast_path_used_and_capped(spark):
    """Below the cap the result is a local relation (no shuffle in the
    plan); forcing cap 0 on the same graph runs the distributed loop."""
    from magiceye_spark.llmops.graph import (
        SMALL_GRAPH_EDGE_CAP,
        connected_components,
    )

    assert SMALL_GRAPH_EDGE_CAP == 200_000  # the documented bound
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "src long, dst long"
    )
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The result is a driver-local relation (LocalTableScan or a
    # parallelized ExistingRDD depending on createDataFrame's path) —
    # what matters is there is NO shuffle and NO join in the plan.
    assert "Exchange" not in plan and "Join" not in plan
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
