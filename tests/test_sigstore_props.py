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


# small integer vectors → exact-parallel duplicates and varied cosines;
# no zero vectors (cosine undefined)
VEC = st.lists(st.integers(min_value=0, max_value=3), min_size=4, max_size=4).filter(
    lambda v: any(v)
)
EMB_CORPUS = st.lists(
    st.tuples(VEC, st.booleans()),  # (vector, is_incoming)
    min_size=4,
    max_size=12,
)


@given(corpus=EMB_CORPUS)
@_settings
def test_ann_delta_pairs_exhaustive_are_touching_subset(spark, corpus):
    """The embedding store under EXHAUSTIVE probing (n_probe =
    n_centroids): delta pairs must equal the delta-touching subset of
    brute-force cosine pairs at the threshold, for random tiny corpora
    and random store/delta splits — the triad's one-sided-join property
    in the third modality."""
    from magiceye_spark.llmops import annindex

    if sum(1 for _, inc in corpus if not inc) < 2 or not any(
        inc for _, inc in corpus
    ):
        return  # need a fittable store and a non-empty delta
    import math

    rows = [(i, [float(x) for x in v], inc) for i, (v, inc) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _inc boolean"
    )
    store_df = emb.where(~F.col("_inc")).drop("_inc")
    delta_df = emb.where(F.col("_inc")).drop("_inc")
    tmp = tempfile.mkdtemp(prefix="annprop_")
    try:
        idx = annindex.write_ivf_index(store_df, tmp, n_centroids=2)
        got = sorted(
            (r["doc_a"], r["doc_b"], r["cosine_sim"])
            for r in annindex.delta_ann_pairs_from_index(
                idx, delta_df, threshold=0.95, n_probe=2
            ).collect()
        )

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(
                d
                / (
                    math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b))
                ),
                6,
            )

        vecs = {i: [float(x) for x in v] for i, (v, _) in enumerate(corpus)}
        inc_ids = {i for i, (_, inc) in enumerate(corpus) if inc}
        expected = sorted(
            (a, b, cos(vecs[a], vecs[b]))
            for a in vecs
            for b in vecs
            if a < b
            and (a in inc_ids or b in inc_ids)
            and cos(vecs[a], vecs[b]) >= 0.95
        )
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(corpus=EMB_CORPUS)
@_settings
def test_ann_indexed_admission_matches_python_reference(spark, corpus):
    """Exhaustive-mode ANN admission vs an independent python union-find
    over the full brute-force cosine pair set + the admission rules in
    plain dicts — no Spark closure code shared with the path under test
    (the hamstore r8 reference-test pattern, third modality)."""
    from magiceye_spark.llmops import annindex

    if sum(1 for _, inc in corpus if not inc) < 2 or not any(
        inc for _, inc in corpus
    ):
        return
    import math

    rows = [(i, [float(x) for x in v], inc) for i, (v, inc) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _inc boolean"
    )
    store_df = emb.where(~F.col("_inc")).drop("_inc")
    delta_df = emb.where(F.col("_inc")).drop("_inc")
    tmp = tempfile.mkdtemp(prefix="annprop_")
    try:
        idx = annindex.write_ivf_index(store_df, tmp, n_centroids=2)
        got = sorted(
            r["vec_id"]
            for r in annindex.delta_ann_admit_indexed(
                idx, delta_df, threshold=0.95, n_probe=2
            )
            .select("vec_id")
            .collect()
        )

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(
                d
                / (
                    math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b))
                ),
                6,
            )

        vecs = {i: [float(x) for x in v] for i, (v, _) in enumerate(corpus)}
        inc_ids = {i for i, (_, inc) in enumerate(corpus) if inc}
        stored_ids = set(vecs) - inc_ids
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in vecs:
            for b in vecs:
                if a < b and cos(vecs[a], vecs[b]) >= 0.95:
                    parent[find(a)] = find(b)
        comps: dict = {}
        for x in list(parent):
            comps.setdefault(find(x), set()).add(x)
        rejected = set()
        for members in comps.values():
            inc = members & inc_ids
            if members & stored_ids:
                rejected |= inc
            elif inc:
                rejected |= inc - {min(inc)}
        assert got == sorted(inc_ids - rejected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(corpus=EMB_CORPUS)
@_settings
def test_ann_delta_pairs_approximate_mode_is_sound(spark, corpus):
    """At PRODUCTION probing (n_probe < n_centroids) the candidate set is
    allowed to MISS pairs (recall is the tunable) but must never invent
    one: every returned edge must appear, with the identical rounded
    cosine, in the brute-force threshold edge set — and must touch the
    delta. Soundness is what makes the admission verdicts trustworthy
    even when probing is approximate."""
    from magiceye_spark.llmops import annindex

    if sum(1 for _, inc in corpus if not inc) < 3 or not any(
        inc for _, inc in corpus
    ):
        return
    import math

    rows = [(i, [float(x) for x in v], inc) for i, (v, inc) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _inc boolean"
    )
    tmp = tempfile.mkdtemp(prefix="annprop_")
    try:
        idx = annindex.write_ivf_index(
            emb.where(~F.col("_inc")).drop("_inc"), tmp, n_centroids=3
        )
        got = {
            (r["doc_a"], r["doc_b"], r["cosine_sim"])
            for r in annindex.delta_ann_pairs_from_index(
                idx, emb.where(F.col("_inc")).drop("_inc"),
                threshold=0.95, n_probe=1,
            ).collect()
        }

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return round(
                d
                / (
                    math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b))
                ),
                6,
            )

        vecs = {i: [float(x) for x in v] for i, (v, _) in enumerate(corpus)}
        inc_ids = {i for i, (_, inc) in enumerate(corpus) if inc}
        full = {
            (a, b, cos(vecs[a], vecs[b]))
            for a in vecs
            for b in vecs
            if a < b
            and (a in inc_ids or b in inc_ids)
            and cos(vecs[a], vecs[b]) >= 0.95
        }
        assert got <= full
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


@given(corpus=EMB_CORPUS)
@_settings
def test_pq_rerank_admission_equals_flat(spark, corpus):
    """r10: PQ-store admission with external-corpus rerank must equal
    flat-store admission for RANDOM tiny corpora and random store/delta
    splits — the coarse quantizer is the same _ivf_centroids fit, so the
    probed cells match, and the rerank join recovers exactly the vectors
    the flat postings hold. Checked at banded probing (n_probe=1 of 2
    cells), where candidate sets are approximate — the parity must hold
    there too, not only in exhaustive mode."""
    from magiceye_spark.llmops import annindex

    if sum(1 for _, inc in corpus if not inc) < 2 or not any(
        inc for _, inc in corpus
    ):
        return
    rows = [(i, [float(x) for x in v], inc) for i, (v, inc) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _inc boolean"
    )
    store_df = emb.where(~F.col("_inc")).drop("_inc")
    delta_df = emb.where(F.col("_inc")).drop("_inc")
    tmp = tempfile.mkdtemp(prefix="pqprop_")
    try:
        flat = annindex.write_ivf_index(
            store_df, tmp + "/flat", n_centroids=2
        )
        pq = annindex.write_ivf_index(
            store_df, tmp + "/pq", pq=True, n_centroids=2,
            m_subvectors=2, n_codes=4,
        )
        for n_probe in (1, 2):
            a = sorted(
                r["vec_id"]
                for r in annindex.delta_ann_admit_indexed(
                    flat, delta_df, threshold=0.95, n_probe=n_probe
                ).collect()
            )
            b = sorted(
                r["vec_id"]
                for r in annindex.delta_ann_admit_indexed(
                    pq, delta_df, threshold=0.95, n_probe=n_probe,
                    rerank=store_df,
                ).collect()
            )
            assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


EMB_CORPUS3 = st.lists(
    st.tuples(VEC, st.integers(min_value=0, max_value=2)),  # (vec, arrival)
    min_size=5,
    max_size=12,
)

_loop_settings = settings(
    max_examples=4,  # each example drains a real 2-batch stream
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@given(corpus=EMB_CORPUS3)
@_loop_settings
def test_ann_ingest_loop_matches_sequential_python_reference(spark, corpus, tmp_path_factory):
    """r10: the CONTINUOUS ingest loop vs an independent python
    union-find applied BATCH-SEQUENTIALLY (store ∪ b1 → admit → store
    grows → store' ∪ b2 → admit) under random corpora and random 3-way
    arrival splits, exhaustive probing. This pins the loop property the
    driver row checks on one fixed corpus — rejected batch-1 members
    must NOT block batch-2 admissions, admitted ones must — for
    adversarial splits."""
    import math
    import os

    from magiceye_spark.llmops import annindex
    from magiceye_spark.streaming import drain

    store_ids = [i for i, (_, g) in enumerate(corpus) if g == 0]
    b1_ids = [i for i, (_, g) in enumerate(corpus) if g == 1]
    b2_ids = [i for i, (_, g) in enumerate(corpus) if g == 2]
    if len(store_ids) < 2 or not b1_ids or not b2_ids:
        return
    rows = [(i, [float(x) for x in v], g) for i, (v, g) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _g int"
    )
    tmp = str(tmp_path_factory.mktemp("annloop"))
    store, out = (os.path.join(tmp, d) for d in ("store", "out"))
    annindex.write_ivf_index(
        emb.where(F.col("_g") == 0).drop("_g"), store, n_centroids=2
    )
    # the SHARED pinned-mtime batch writer (registry helper)
    from magiceye_spark.registry import _loop_batches_to_stream

    stream = _loop_batches_to_stream(
        spark, tmp, tuple(emb.where(F.col("_g") == g).drop("_g") for g in (1, 2))
    )
    q = annindex.streaming_ann_ingest(
        spark, store, stream, os.path.join(tmp, "ck"),
        threshold=0.95, n_probe=2, output_path=out,
    )
    drain(q, 300)
    got = sorted(
        r["vec_id"]
        for r in spark.read.parquet(out).select("vec_id").collect()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    vecs = {i: [float(x) for x in v] for i, (v, _) in enumerate(corpus)}

    def admit(stored, batch):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = stored | batch
        for a in nodes:
            for b in nodes:
                if a < b and cos(vecs[a], vecs[b]) >= 0.95:
                    parent[find(a)] = find(b)
        comps: dict = {}
        for x in list(parent):
            comps.setdefault(find(x), set()).add(x)
        rejected = set()
        for members in comps.values():
            inc = members & batch
            if members & stored:
                rejected |= inc
            elif inc:
                rejected |= inc - {min(inc)}
        return batch - rejected

    stored = set(store_ids)
    expected = []
    for batch in (set(b1_ids), set(b2_ids)):
        admitted = admit(stored, batch)
        expected += sorted(admitted)
        stored |= admitted
    assert got == sorted(expected)


@given(corpus=EMB_CORPUS3)
@_loop_settings
def test_ann_ingest_cold_start_matches_sequential_python_reference(
    spark, corpus, tmp_path_factory
):
    """r11: the COLD-START loop (no pre-built store) vs the same python
    union-find reference with an EMPTY initial store — batch 0 must run
    through the normal admission rule (intra-batch min-id survivor per
    near-dup component), not be admitted wholesale, matching the
    sigstore/hamstore bootstrap-from-empty semantics. All three arrival
    groups stream as micro-batches; exhaustive probing
    (n_probe = n_centroids = 2)."""
    import math
    import os

    from magiceye_spark.llmops import annindex
    from magiceye_spark.streaming import drain

    groups = [[i for i, (_, g) in enumerate(corpus) if g == k] for k in (0, 1, 2)]
    if len(groups[0]) < 2 or not groups[1] or not groups[2]:
        return
    rows = [(i, [float(x) for x in v], g) for i, (v, g) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _g int"
    )
    tmp = str(tmp_path_factory.mktemp("anncold"))
    store, out = (os.path.join(tmp, d) for d in ("store", "out"))
    # the SHARED pinned-mtime batch writer (registry helper) — the old
    # inline `mtime > 1e9` copy re-stamped batch 1 to batch 2's
    # timestamp at 3 batches, making arrival order a tie
    from magiceye_spark.registry import _loop_batches_to_stream

    stream = _loop_batches_to_stream(
        spark,
        tmp,
        tuple(emb.where(F.col("_g") == g).drop("_g") for g in (0, 1, 2)),
    )
    q = annindex.streaming_ann_ingest(
        spark, store, stream, os.path.join(tmp, "ck"),
        threshold=0.95, n_probe=2, output_path=out,
        bootstrap={"n_centroids": 2},
    )
    drain(q, 400)
    got = sorted(
        r["vec_id"]
        for r in spark.read.parquet(out).select("vec_id").collect()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    vecs = {i: [float(x) for x in v] for i, (v, _) in enumerate(corpus)}

    def admit(stored, batch):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        nodes = stored | batch
        for a in nodes:
            for b in nodes:
                if a < b and cos(vecs[a], vecs[b]) >= 0.95:
                    parent[find(a)] = find(b)
        comps: dict = {}
        for x in list(parent):
            comps.setdefault(find(x), set()).add(x)
        rejected = set()
        for members in comps.values():
            inc = members & batch
            if members & stored:
                rejected |= inc
            elif inc:
                rejected |= inc - {min(inc)}
        return batch - rejected

    stored: set = set()  # EMPTY store — batch 0 dedups against itself only
    expected = []
    for ids in groups:
        admitted = admit(stored, set(ids))
        expected += sorted(admitted)
        stored |= admitted
    assert got == sorted(expected)


@given(corpus=EMB_CORPUS3)
@_loop_settings
def test_ann_ingest_compaction_is_result_invisible(spark, corpus, tmp_path_factory):
    """r12: drain the SAME random corpus and arrival split through two
    loops — compact_every=1 (ivf_index_compact fires after every batch,
    including mid-stream between the two drained batches) vs no
    compaction — and require identical admitted sets AND identical final
    postings. Store maintenance must never change admission verdicts or
    lose/duplicate rows; the driver row
    (ann_ingest_loop_compacting_exact) checks this on one fixed corpus,
    this property checks it for adversarial splits."""
    import os

    from magiceye_spark.llmops import annindex
    from magiceye_spark.streaming import drain

    store_ids = [i for i, (_, g) in enumerate(corpus) if g == 0]
    b1_ids = [i for i, (_, g) in enumerate(corpus) if g == 1]
    b2_ids = [i for i, (_, g) in enumerate(corpus) if g == 2]
    if len(store_ids) < 2 or not b1_ids or not b2_ids:
        return
    rows = [(i, [float(x) for x in v], g) for i, (v, g) in enumerate(corpus)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, _g int"
    )
    tmp = str(tmp_path_factory.mktemp("anncompact"))

    def drain_loop(tag, compact_every):
        from magiceye_spark.registry import _loop_batches_to_stream

        base = os.path.join(tmp, tag)
        store = os.path.join(base, "store")
        out = os.path.join(base, "out")
        annindex.write_ivf_index(
            emb.where(F.col("_g") == 0).drop("_g"), store, n_centroids=2
        )
        # the SHARED pinned-mtime batch writer (registry helper) — not a
        # local copy of the idiom, so mtime-pinning fixes apply here too
        stream = _loop_batches_to_stream(
            spark,
            base,
            tuple(emb.where(F.col("_g") == g).drop("_g") for g in (1, 2)),
        )
        q = annindex.streaming_ann_ingest(
            spark, store, stream, os.path.join(base, "ck"),
            threshold=0.95, n_probe=2, output_path=out,
            compact_every=compact_every,
        )
        drain(q, 300)
        admitted = sorted(
            r["vec_id"]
            for r in spark.read.parquet(out).select("vec_id").collect()
        )
        postings = sorted(
            r["vec_id"]
            for r in annindex.read_ivf_index(spark, store)
            .postings.select("vec_id")
            .collect()
        )
        return admitted, postings

    a_adm, a_post = drain_loop("compact", 1)
    b_adm, b_post = drain_loop("plain", None)
    assert a_adm == b_adm
    assert a_post == b_post
