"""Semantic pins for the round-3 operators (oracle parity is covered by the
registry sweep in test_oracle_parity; these check the semantics on planted
fixtures where parity alone proves too little)."""

from pyspark.sql import functions as F

from magiceye_spark.llmops.dedup import boilerplate_ngrams, cross_source_overlap
from magiceye_spark.llmops.simsearch import (
    embedding_cluster_sizes,
    embedding_kmeans,
)
from magiceye_spark.llmops.textstats import gopher_quality_flags, length_buckets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_gopher_flags_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again", "s"),
            (2, "too short", "s"),  # <5 words
            (3, "the " + "!!!! " * 30, "s"),  # symbol-heavy
            (4, "zz qq ww rr tt yy uu ii", "s"),  # no stopwords
        ],
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert got[1]["passes_gopher"] is True
    assert got[2]["flag_word_count"] is False and got[2]["passes_gopher"] is False
    assert got[3]["flag_symbol_ratio"] is False
    assert got[4]["flag_stopwords"] is False


def test_length_buckets_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c", "s"),  # 3 tokens -> bucket 2
            (2, "a b c d e", "s"),  # 5 -> bucket 4
            (3, "a b c d e f g", "s"),  # 7 -> bucket 4
            (4, " ".join(["w"] * 17), "s"),  # 17 -> bucket 16
        ],
    )
    rows = {r["bucket"]: r for r in length_buckets(docs, budget=8).collect()}
    assert set(rows) == {2, 4, 16}
    assert rows[4]["n_docs"] == 2 and rows[4]["total_tokens"] == 12
    # 12 tokens into ceil(12/8)=2 contexts of 8 -> 12/16
    assert rows[4]["packing_efficiency"] == 0.75


def test_cross_source_overlap_detects_mirror(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma", "srcA"),
            (2, "beta alpha gamma gamma", "srcB"),  # same bag -> mirror
            (3, "delta epsilon", "srcB"),
            (4, "zeta eta", "srcC"),  # unique content
        ],
    )
    got = [tuple(r) for r in cross_source_overlap(docs).collect()]
    assert got == [("srcA", "srcB", 1)]


def test_boilerplate_ngrams_planted(spark):
    boiler = "click here now"
    docs = _docs(
        spark,
        [(i, f"{boiler} unique{i} words{i} vary{i}", "s") for i in range(10)]
        + [(99, "nothing shared at all here", "s")],
    )
    got = {r["gram"]: r for r in boilerplate_ngrams(docs, n=3, min_doc_frac=0.5).collect()}
    assert "click here now" in got
    assert got["click here now"]["doc_freq"] == 10
    # the unique grams never cross the 50% df cut
    assert all(g.startswith("click") or g.startswith("here") for g in got)


def test_embedding_kmeans_assignment(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = embs.count()
    assign = embedding_kmeans(embs, k=8)
    rows = assign.collect()
    assert len(rows) == n  # every vector assigned exactly once
    assert {r["cluster"] for r in rows} <= set(range(8))
    # deterministic: same fit sample + same corpus -> identical assignment
    again = embedding_kmeans(embs, k=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    sizes = embedding_cluster_sizes(embs, k=8).collect()
    assert sum(r["n_vectors"] for r in sizes) == n
    # coherence: assignments should be positively aligned with their
    # centroid on average, and no single cluster may swallow the corpus
    weighted = sum(r["n_vectors"] * r["mean_cosine"] for r in sizes) / n
    assert weighted > 0.0
    assert max(r["n_vectors"] for r in sizes) < n


def test_referential_audit_planted_orphans(spark):
    from magiceye_spark.dq import referential_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "id long, parent_id long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    got = {
        r["relation"]: r
        for r in referential_audit(
            [("child.parent_id->parent", child, "parent_id", parent, "pid")]
        ).collect()
    }
    r = got["child.parent_id->parent"]
    assert r["n_child_rows"] == 3 and r["n_orphans"] == 1 and r["pass"] is False
