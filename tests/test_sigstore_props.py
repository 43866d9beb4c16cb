"""Property-based tests (hypothesis) for the persistent stores'
delta-ingest paths (MinHash sigstore + Hamming hamstore): for RANDOM tiny
corpora and RANDOM store/delta splits, the one-sided indexed pair
generators must return exactly the delta-touching subset of the fresh
full pair joins, and indexed admission must agree with the from-scratch
closure — the r8 one-sided-join rewrite under adversarial splits, not
just the fixed sf0.001 split the example tests use.

Kept to few, small examples — each example builds a real parquet store
and runs real Spark jobs.
"""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from magiceye_spark.llmops import dedup, graph, sigstore

# small vocabulary → dense shingle collisions → real near-dup structure
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
DOC = st.lists(st.sampled_from(VOCAB), min_size=4, max_size=9)
CORPUS = st.lists(
    st.tuples(DOC, st.booleans()),  # (words, is_incoming)
    min_size=4,
    max_size=14,
)

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _frames(spark, corpus):
    rows = [
        (i, " ".join(words), "en", "s", len(" ".join(words)), inc)
        for i, (words, inc) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars int, _inc boolean",
    )
    return (
        docs,
        docs.where(~F.col("_inc")).drop("_inc"),
        docs.where(F.col("_inc")).drop("_inc"),
    )


@given(corpus=CORPUS)
@_settings
def test_delta_pairs_are_exactly_the_touching_subset(spark, corpus):
    if not any(inc for _, inc in corpus) or all(inc for _, inc in corpus):
        return  # need both a store and a delta
    docs, existing, incoming = _frames(spark, corpus)
    tmp = tempfile.mkdtemp(prefix="sigprop_")
    try:
        idx = sigstore.write_minhash_index(existing, tmp)
        got = sorted(
            map(tuple, sigstore.delta_pairs_from_index(idx, incoming).collect())
        )
        delta_ids = {r["doc_id"] for r in incoming.select("doc_id").collect()}
        fresh = sorted(
            map(
                tuple,
                dedup.minhash_lsh_pairs(docs.drop("_inc"), threshold=0.7).collect(),
            )
        )
        expected = [
            p for p in fresh if p[0] in delta_ids or p[1] in delta_ids
        ]
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(corpus=CORPUS)
@_settings
def test_hamming_delta_pairs_are_exactly_the_touching_subset(spark, corpus):
    """Same one-sided-join property for the Hamming store: under random
    corpora and splits, delta pairs must equal the delta-touching subset
    of the fresh full band join (SimHash signatures)."""
    from magiceye_spark.llmops import hamstore

    if not any(inc for _, inc in corpus) or all(inc for _, inc in corpus):
        return
    docs, existing, incoming = _frames(spark, corpus)
    tmp = tempfile.mkdtemp(prefix="hamprop_")
    try:
        sigs = dedup.simhash_signatures(docs.drop("_inc"))
        inc_ids = {r["doc_id"] for r in incoming.select("doc_id").collect()}
        idx = hamstore.write_hamming_index(
            dedup.simhash_signatures(existing), tmp, kind="simhash"
        )
        got = sorted(
            map(
                tuple,
                hamstore.delta_pairs_from_hamming_index(
                    idx, dedup.simhash_signatures(incoming)
                ).collect(),
            )
        )
        fresh = sorted(
            map(tuple, dedup.hamming_band_near_dups(sigs, 3).collect())
        )
        assert got == [p for p in fresh if p[0] in inc_ids or p[1] in inc_ids]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(corpus=CORPUS)
@_settings
def test_indexed_admission_matches_from_scratch_closure(spark, corpus):
    if not any(inc for _, inc in corpus) or all(inc for _, inc in corpus):
        return
    docs, existing, incoming = _frames(spark, corpus)
    tmp = tempfile.mkdtemp(prefix="sigprop_")
    try:
        idx = sigstore.write_minhash_index(existing, tmp)
        got = sorted(
            r["doc_id"]
            for r in sigstore.delta_dedup_admit_indexed(idx, incoming)
            .select("doc_id")
            .collect()
        )
        pairs_full = dedup.minhash_lsh_pairs(docs.drop("_inc"), threshold=0.7)
        expected = sorted(
            r["doc_id"]
            for r in graph.delta_dedup_admit(
                docs, incoming_col="_inc", pairs=pairs_full
            )
            .select("doc_id")
            .collect()
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
