"""End-to-end tests of the datadiff / dq CLI subcommands.

The CLI's `get_spark` reuses the session-scoped test session (getOrCreate),
so these exercise the real argument plumbing, read paths, and exit-code
contract without a second JVM.
"""

import json

from magiceye_spark import cli


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))


def test_cli_datadiff_full_and_out(spark, tmp_path, capsys):
    base = tmp_path / "base"
    target = tmp_path / "target"
    _write(spark, base, [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
           "id int, name string, v int")
    _write(spark, target, [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
           "id int, name string, v int")
    out = tmp_path / "diff_out"
    rc = cli.main(["datadiff", str(base), str(target), "--keys", "id",
                   "--out", str(out)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "added    1" in printed
    assert "changed  1" in printed
    assert "removed  1" in printed
    got = {(r["id"], r["diff_status"], r["changed_columns"])
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {(2, "changed", "name"), (3, "removed", ""), (4, "added", "")}


def test_cli_datadiff_fingerprint_exit_codes(spark, tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    _write(spark, a, [(1, "x")], "id int, s string")
    _write(spark, b, [(1, "x")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(b), "--mode", "fingerprint"]) == 0
    c = tmp_path / "c"
    _write(spark, c, [(1, "y")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(c), "--mode", "fingerprint"]) == 1


def test_cli_datadiff_keyed_mode_requires_keys(spark, tmp_path):
    a = tmp_path / "a2"
    _write(spark, a, [(1, "x")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(a)]) == 2


def test_cli_incremental_with_stored_fingerprints(spark, tmp_path, capsys):
    """Publish-time fingerprints → incremental diff: write both sides'
    fingerprint tables via the CLI, then diff with them — counts must match
    the plain full diff."""
    base = tmp_path / "ibase"
    target = tmp_path / "itarget"
    rows_b = [(i, i % 3, i * 10) for i in range(30)]
    rows_t = [(i, i % 3, i * 10 + (5 if i % 3 == 1 else 0)) for i in range(30)]
    _write(spark, base, rows_b, "id int, p int, v int")
    _write(spark, target, rows_t, "id int, p int, v int")
    bfp, tfp = tmp_path / "bfp", tmp_path / "tfp"
    assert cli.main(["datadiff", str(base), str(base), "--mode", "write-fingerprints",
                     "--partition-col", "p", "--keys", "id", "--columns", "v",
                     "--out", str(bfp)]) == 0
    assert cli.main(["datadiff", str(target), str(target), "--mode", "write-fingerprints",
                     "--partition-col", "p", "--keys", "id", "--columns", "v",
                     "--out", str(tfp)]) == 0
    capsys.readouterr()
    rc = cli.main(["datadiff", str(base), str(target), "--mode", "incremental",
                   "--keys", "id", "--columns", "v", "--partition-col", "p",
                   "--base-fingerprints", str(bfp),
                   "--target-fingerprints", str(tfp)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "changed  10" in printed  # the i%3==1 rows

    # missing required args → exit 2
    assert cli.main(["datadiff", str(base), str(target), "--mode", "incremental",
                     "--keys", "id"]) == 2
    assert cli.main(["datadiff", str(base), str(target),
                     "--mode", "write-fingerprints"]) == 2


def test_cli_datadiff_csv_format(spark, tmp_path, capsys):
    base = tmp_path / "base_csv"
    target = tmp_path / "target_csv"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(str(base))
    df.where("id = 1").coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(str(target))
    rc = cli.main(["datadiff", str(base), str(target), "--keys", "id",
                   "--format", "csv"])
    assert rc == 0
    assert "removed  1" in capsys.readouterr().out


def test_cli_compact_small_files(spark, tmp_path, capsys):
    """12 shard files in, 1 right-sized file out, identical contents."""
    src = tmp_path / "shards"
    dst = tmp_path / "compacted"
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    df.repartition(12).write.mode("overwrite").parquet(str(src))
    assert len(list(src.glob("part-*.parquet"))) == 12
    rc = cli.main(["compact", str(src), str(dst), "--target-mb", "512"])
    assert rc == 0
    assert "1 file" in capsys.readouterr().out
    assert len(list(dst.glob("part-*.parquet"))) == 1
    got = {r["k"] for r in spark.read.parquet(str(dst)).collect()}
    assert got == set(range(1000))


def test_cli_compact_sort_by_clusters_ranges(spark, tmp_path):
    """Range-clustered compaction: re-reading with a range filter must
    produce the same rows, and per-file k-ranges must not overlap."""
    from pyspark.sql import functions as F

    src = tmp_path / "shards2"
    dst = tmp_path / "clustered"
    # incompressible-ish payload so the input exceeds 1 MB → n > 1
    spark.range(0, 60000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    ).repartition(8).write.mode("overwrite").parquet(str(src))
    from magiceye_spark.io import compact_table

    n = compact_table(spark, str(src), str(dst), target_mb=1, sort_by=["k"])
    files = sorted(dst.glob("part-*.parquet"))
    assert len(files) == n
    assert n > 1, "fixture must be large enough to split"
    import duckdb

    spans = [
        duckdb.sql(f"SELECT MIN(k), MAX(k) FROM '{f}'").fetchone()
        for f in files
    ]
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo  # non-overlapping min/max → file-skipping filters
    assert spark.read.parquet(str(dst)).count() == 60000


def test_cli_dq_gate(spark, tmp_path, capsys):
    tbl = tmp_path / "tbl"
    ref = tmp_path / "ref"
    _write(spark, tbl, [(1, "ok", 5), (2, None, 50), (3, "ok", 7)],
           "id int, status string, score int")
    _write(spark, ref, [(1,), (2,), (3,)], "id int")
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps({
        "not_null": ["status"],
        "unique": [["id"]],
        "ranges": {"score": [0, 10]},
        "references": {"id": f"{ref}:id"},
    }))
    rc = cli.main(["dq", str(tbl), "--rules", str(rules)])
    assert rc == 1  # null status + out-of-range score fail
    printed = capsys.readouterr().out
    assert "FAIL not_null" in printed
    assert "FAIL range" in printed
    assert "PASS unique" in printed
    assert "PASS referential" in printed

    ok_rules = tmp_path / "ok_rules.json"
    ok_rules.write_text(json.dumps({"unique": [["id"]]}))
    assert cli.main(["dq", str(tbl), "--rules", str(ok_rules)]) == 0


def test_cli_run_generic_jdbc_pair(spark, tmp_path, capsys):
    """The reference's `run` flow (config pair -> connect -> snapshot ->
    diff -> report file) against two LIVE embedded Derby databases through
    the generic JDBC route (database_type not Postgres/Mysql)."""
    jvm = spark._jvm
    for url, ddl in [
        ("jdbc:derby:memory:cli_base;create=true",
         "CREATE TABLE t1 (id INT NOT NULL, name VARCHAR(40))"),
        ("jdbc:derby:memory:cli_target;create=true",
         "CREATE TABLE t1 (id INT NOT NULL, name VARCHAR(80))"),
    ]:
        conn = jvm.java.sql.DriverManager.getConnection(url)
        st = conn.createStatement()
        st.execute(ddl)
        st.close()
        conn.close()

    cfg = {
        "database_pairs": [
            {
                "name": "derbypair",
                "database_type": "Derby",
                "base_connection": "jdbc:derby:memory:cli_base#APP",
                "target_connection": "jdbc:derby:memory:cli_target#APP",
            }
        ],
        "default_database_pair": "derbypair",
        "current_language": "English",
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "report.json"

    rc = cli.main(["run", "--config", str(cfg_path), "--out", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    reports = {
        t["table_name"]: t["report_list"] for t in doc["report_table_list"]
    }
    assert "t1" in reports
    assert any("varchar(40)" in r and "varchar(80)" in r for r in reports["t1"])


def test_cli_zorder_rewrite(spark, tmp_path, capsys):
    """CLI z-order rewrite: files written, contents preserved, span
    summary printed for both curve columns."""
    from pyspark.sql import functions as F

    src = tmp_path / "zsrc"
    dst = tmp_path / "zdst"
    spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    ).repartition(4).write.mode("overwrite").parquet(str(src))
    rc = cli.main(
        ["zorder", str(src), str(dst), "--cols", "x,y", "--n-files", "4", "--bits", "6"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "x: mean per-file span" in out and "y: mean per-file span" in out
    back = spark.read.parquet(str(dst))
    assert back.count() == 4096
    assert back.select(F.countDistinct("x", "y")).collect()[0][0] == 4096


def test_cli_datadiff_triage_modes(spark, tmp_path, capsys):
    """Triage CLI: identical tables exit 0 at the fingerprint level; a
    partitioned change exits 1 at the partition level with counts."""
    from pyspark.sql import functions as F

    b = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("m"), (F.col("id") * 3).alias("v")
    )
    t = b.withColumn("v", F.when(F.col("m") == 2, F.col("v") + 1).otherwise(F.col("v")))
    pb, pt = str(tmp_path / "b"), str(tmp_path / "t")
    b.write.parquet(pb)
    t.write.parquet(pt)

    rc = cli.main(["datadiff", pb, pb, "--keys", "id", "--mode", "triage",
                   "--partition-col", "m"])
    out = capsys.readouterr().out
    assert rc == 0 and "identical" in out and "level    fingerprint" in out

    rc = cli.main(["datadiff", pb, pt, "--keys", "id", "--mode", "triage",
                   "--partition-col", "m", "--columns", "v"])
    out = capsys.readouterr().out
    assert rc == 1 and "level    partition" in out and "changed_partitions [2]" in out
    assert "changed  25" in out


def test_cli_corpus_report_clean_search(spark, tmp_path, capsys):
    docs = tmp_path / "docs"
    filler = " ".join(f"u{i}" for i in range(12))
    dup_run = "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"
    _write(
        spark, docs,
        [
            (0, f"spark query engine {filler}", "en", "s0", 60),
            (1, f"{dup_run} alpha beta", "en", "s0", 70),
            (2, f"{dup_run} gamma delta", "de", "s1", 70),
            (3, "totally different text here", "en", "s1", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # report card prints one line per source; --out writes parquet
    card_out = tmp_path / "card"
    assert cli.main(["corpus-report", str(docs), "--out", str(card_out)]) == 0
    out = capsys.readouterr().out
    assert "s0" in out and "s1" in out
    assert spark.read.parquet(str(card_out)).count() == 2

    # clean: the shared 10-token run (8-gram dup) is removed from both docs
    cleaned = tmp_path / "cleaned"
    assert cli.main(["corpus-clean", str(docs), "--out", str(cleaned),
                     "--ngram", "8"]) == 0
    got = {r.doc_id: r for r in spark.read.parquet(str(cleaned)).collect()}
    assert got[1].cleaned_text == "alpha beta" and got[1].n_removed == 10
    assert got[2].cleaned_text == "gamma delta"
    assert got[0].n_removed == 0
    assert "removed 20/" in capsys.readouterr().out

    # search: only doc 0 contains the term
    assert cli.main(["search", str(docs), "--terms", "spark,engine", "-k", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and out[0].split()[0] == "0"


def test_cli_anonymity_gate(spark, tmp_path, capsys):
    """Gate passes on large uniform groups, fails on singleton groups and
    on l-diversity leaks."""
    ok_tbl = tmp_path / "ok"
    _write(spark, ok_tbl,
           [(i, "segA" if i % 2 == 0 else "segB", i % 2) for i in range(20)],
           "id int, seg string, region int")
    assert cli.main(["anonymity", str(ok_tbl), "--quasi", "region", "-k", "5"]) == 0

    bad_tbl = tmp_path / "bad"
    _write(spark, bad_tbl,
           [(i, "segA", i) for i in range(6)],  # every quasi group is a singleton
           "id int, seg string, region int")
    assert cli.main(["anonymity", str(bad_tbl), "--quasi", "region", "-k", "5"]) == 1

    # l-diversity: region groups are big enough, but each has ONE segment
    leak_tbl = tmp_path / "leak"
    _write(spark, leak_tbl,
           [(i, "segA" if i < 10 else "segB", 0 if i < 10 else 1) for i in range(20)],
           "id int, seg string, region int")
    assert cli.main(["anonymity", str(leak_tbl), "--quasi", "region", "-k", "5"]) == 0
    assert cli.main(["anonymity", str(leak_tbl), "--quasi", "region", "-k", "5",
                     "--sensitive", "seg"]) == 1
    capsys.readouterr()


def test_cli_phash_dedup(spark, tmp_path, capsys):
    """Perceptual dedup CLI over a documents table: keeps the lower-id doc
    of each byte-identical pair, passes all original columns through."""
    from pyspark.sql import functions as F

    src = tmp_path / "pdocs"
    rows = [
        (0, "alpha " * 30, "web"),
        (1, "alpha " * 30, "web"),      # exact near-dup of 0 -> dropped
        (2, "totally different words here " * 8, "books"),
    ]
    _write(spark, src, rows, "doc_id long, text string, source string")
    dst = tmp_path / "pkept"
    rc = cli.main(["phash-dedup", str(src), "--out", str(dst)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "kept 2/3" in out
    back = spark.read.parquet(str(dst))
    assert sorted(r["doc_id"] for r in back.collect()) == [0, 2]
    assert set(back.columns) == {"doc_id", "text", "source"}


def test_cli_anonymity_t_closeness_gate(spark, tmp_path, capsys):
    """--t-max arms the t-closeness check: groups distributed like the
    global pass any t; a skewed group fails a tight t but passes a loose
    one."""
    # two regions with identical balance distributions -> EMD 0
    even = tmp_path / "even"
    rows = []
    for region in (0, 1):
        rows += [(len(rows) + i, region, "s", 500.0 if i < 5 else 1500.0) for i in range(10)]
    _write(spark, even, rows, "id int, region int, seg string, bal double")
    assert cli.main(["anonymity", str(even), "--quasi", "region", "-k", "5",
                     "--sensitive", "bal", "--t-max", "0.01"]) == 0

    # region 1 entirely in one bin while global is 50/50 -> EMD 0.5
    skew = tmp_path / "skew"
    # region 1 stays l-diverse (two distinct values) but both land in bin 0
    rows = [(i, 0, "s", 500.0 if i < 5 else 1500.0) for i in range(10)]
    rows += [(10 + i, 1, "s", 500.0 if i % 2 == 0 else 600.0) for i in range(10)]
    _write(spark, skew, rows, "id int, region int, seg string, bal double")
    assert cli.main(["anonymity", str(skew), "--quasi", "region", "-k", "5",
                     "--sensitive", "bal", "--t-max", "0.1"]) == 1
    assert cli.main(["anonymity", str(skew), "--quasi", "region", "-k", "5",
                     "--sensitive", "bal", "--t-max", "0.9"]) == 0
    out = capsys.readouterr().out
    assert "t=0.1" in out and "max_emd" in out


def test_cli_trend_triage(spark, tmp_path, capsys):
    """trend prints one line per group with OLS slope, MK z / Theil-Sen
    slope, and the CUSUM changepoint; a rising series shows positive
    slopes and a positive delta."""
    import datetime as dt

    tbl = tmp_path / "series"
    rows = []
    for day in range(20):
        v = 10.0 + day * 2.0 if day >= 10 else 10.0
        rows.append((len(rows), dt.datetime(2024, 1, 1 + day, 9), "m1", v))
    _write(spark, tbl, rows, "id long, ts timestamp, grp string, value double")
    rc = cli.main(["trend", str(tbl), "--group", "grp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "m1:" in out and "MK z=" in out and "changepoint=2024-01-" in out
    # rising second half: positive Sen slope and positive CUSUM delta
    line = [l for l in out.splitlines() if l.startswith("m1:")][0]
    assert "sen_slope=" in line and "delta=" in line
    sen = float(line.split("sen_slope=")[1].split()[0])
    delta = float(line.split("delta=")[1].split()[0])
    assert sen > 0 and delta > 0


def test_cli_ingest_minhash_drain_and_idempotent_redrain(spark, tmp_path, capsys):
    """`ingest` bootstraps an empty MinHash store, drains the source dir
    through the streaming loop (cross-batch dedup), prints the store
    size, and a re-drain with a FRESH checkpoint admits nothing new
    (every doc_id already stored → idempotent adds)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = tmp_path / "src"
    for lo in (0, 250):
        docs.where(
            (docs.doc_id >= lo) & (docs.doc_id < lo + 250)
        ).coalesce(1).write.mode("append").parquet(str(src))
    store = tmp_path / "store"
    out = tmp_path / "admitted"
    rc = cli.main([
        "ingest", str(src), str(store),
        "--checkpoint", str(tmp_path / "ck1"), "--out", str(out),
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "store now holds" in printed
    n_admitted = spark.read.parquet(str(out)).count()
    from magiceye_spark.llmops import sigstore

    idx = sigstore.read_minhash_index(spark, str(store))
    n_store = idx.signatures.count()
    assert 0 < n_admitted == n_store <= 500
    # re-drain, fresh checkpoint: same docs, all id-deduped away
    rc = cli.main([
        "ingest", str(src), str(store), "--checkpoint", str(tmp_path / "ck2"),
    ])
    assert rc == 0
    assert sigstore.read_minhash_index(
        spark, str(store)
    ).signatures.count() == n_store


def test_cli_ingest_ivf_bootstrap_from_seed(spark, tmp_path, capsys):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = tmp_path / "esrc"
    emb.where(emb.vec_id >= 300).coalesce(1).write.parquet(str(src))
    seed = tmp_path / "seed"
    emb.where(emb.vec_id < 300).write.parquet(str(seed))
    rc = cli.main([
        "ingest", str(src), str(tmp_path / "ivf"), "--store", "ivf",
        "--checkpoint", str(tmp_path / "ck"),
        "--bootstrap-from", str(seed),
    ])
    assert rc == 0
    from magiceye_spark.llmops import annindex

    idx = annindex.read_ivf_index(spark, str(tmp_path / "ivf"))
    assert idx.postings.count() >= 300


def test_cli_ingest_ivf_drains_from_empty(spark, tmp_path, capsys):
    """r10 cold-start: no store, no --bootstrap-from — the loop fits the
    quantizer on the first micro-batch and keeps draining; twins of
    batch-0 vectors arriving in batch 1 are deduped away."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    src = tmp_path / "esrc"
    b0 = emb.where(emb.vec_id < 300)
    b1 = emb.where(emb.vec_id >= 300).unionByName(
        b0.limit(10).select((b0.vec_id + 1_000_000).alias("vec_id"), "embedding")
    )
    b0.coalesce(1).write.mode("append").parquet(str(src))
    b1.coalesce(1).write.mode("append").parquet(str(src))
    out = tmp_path / "admitted"
    rc = cli.main([
        "ingest", str(src), str(tmp_path / "ivf"), "--store", "ivf",
        "--checkpoint", str(tmp_path / "ck"), "--out", str(out),
        "--max-files-per-trigger", "1",
    ])
    assert rc == 0
    assert "store now holds" in capsys.readouterr().out
    from magiceye_spark.llmops import annindex

    idx = annindex.read_ivf_index(spark, str(tmp_path / "ivf"))
    sink_ids = {
        r["vec_id"]
        for r in spark.read.parquet(str(out)).select("vec_id").collect()
    }
    assert set(range(300)) <= sink_ids
    assert all(1_000_000 + i not in sink_ids for i in range(10))
    assert idx.postings.count() == len(sink_ids)


def test_cli_ingest_ivf_pq_from_empty_and_flag_mismatch(spark, tmp_path, capsys):
    """r10 --pq: cold-start a product-quantized store from the stream,
    rerank from the --out sink; a follow-up run with the wrong flag
    refuses loudly instead of mixing code/vector postings."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    src = tmp_path / "esrc"
    b0 = emb.where(emb.vec_id < 300)
    b1 = emb.where(emb.vec_id >= 300).unionByName(
        b0.limit(5).select((b0.vec_id + 1_000_000).alias("vec_id"), "embedding")
    )
    b0.coalesce(1).write.mode("append").parquet(str(src))
    b1.coalesce(1).write.mode("append").parquet(str(src))
    store, out = tmp_path / "pq", tmp_path / "admitted"
    # --pq on a non-ivf store refuses up front (r11: previously silently
    # ignored — a user asking for a PQ store got a non-PQ ingest, exit 0)
    rc = cli.main([
        "ingest", str(src), str(store), "--store", "minhash", "--pq",
        "--checkpoint", str(tmp_path / "ck0"),
    ])
    assert rc == 2
    rc = cli.main([
        "ingest", str(src), str(store), "--store", "ivf", "--pq",
        "--checkpoint", str(tmp_path / "ck"), "--out", str(out),
        "--max-files-per-trigger", "1",
    ])
    assert rc == 0
    from magiceye_spark.llmops import annindex

    idx = annindex.read_ivf_index(spark, str(store))
    assert idx.pq and "embedding" not in idx.postings.columns
    sink_ids = {
        r["vec_id"]
        for r in spark.read.parquet(str(out)).select("vec_id").collect()
    }
    assert all(1_000_000 + i not in sink_ids for i in range(5))
    assert idx.postings.count() == len(sink_ids)
    # wrong flag on the existing store: refuse, store untouched
    rc = cli.main([
        "ingest", str(src), str(store), "--store", "ivf",
        "--checkpoint", str(tmp_path / "ck2"),
    ])
    assert rc == 2
    assert "refusing to mix" in capsys.readouterr().err
