"""BM25 retrieval + duplicate-span (substring-level dedup) operators:
planted-fixture semantics for span merging (overlap, adjacency, same-doc
repeats, zero-coverage docs) and BM25 ranking sanity. Engine parity with
DuckDB is covered by the registry sweep in test_oracle_parity."""

import pytest

from magiceye_spark.llmops import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], ["doc_id", "text"]
    )


@pytest.fixture(scope="module")
def span_docs(spark):
    return _docs(
        spark,
        [
            "x1 x2 x3 x4 x5 u1 u2",        # 0: shares a 5-token run with doc 1
            "y0 x1 x2 x3 x4 x5 y1",        # 1: same run, offset by one
            "r1 r2 r3 z1 r1 r2 r3",        # 2: SAME-DOC repeat of a 3-gram
            "unique tokens only here now",  # 3: no duplicated grams
            "m1 m2 m3 m4 m5 m6",           # 4: two ADJACENT dup grams (pos 0, 3)
            "m1 m2 m3 t1 t2 t3 t4 t5",     # 5: makes doc4's first gram duplicated
            "m4 m5 m6 s1 s2 s3 s4 s5",     # 6: makes doc4's second gram duplicated
        ],
    )


def test_overlapping_grams_merge_to_maximal_span(spark, span_docs):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in retrieval.duplicate_spans(span_docs, n=3).collect()
    }
    # docs 0/1 share tokens x1..x5: 3 overlapping dup 3-grams merge into one
    # maximal 5-token span on each side, at each side's own offsets.
    assert (0, 0, 4, 5) in spans
    assert (1, 1, 5, 5) in spans


def test_same_doc_repeat_counts_as_duplicated(spark, span_docs):
    spans = sorted(
        (r.span_start, r.span_end)
        for r in retrieval.duplicate_spans(span_docs, n=3).collect()
        if r.doc_id == 2
    )
    # "r1 r2 r3" occurs twice WITHIN doc 2 (pos 0 and 4); the gap token z1
    # keeps them separate spans.
    assert spans == [(0, 2), (4, 6)]


def test_adjacent_grams_merge(spark, span_docs):
    spans = [
        (r.span_start, r.span_end)
        for r in retrieval.duplicate_spans(span_docs, n=3).collect()
        if r.doc_id == 4
    ]
    # dup grams at pos 0 and pos 3 are exactly adjacent (no overlap):
    # [0,2] + [3,5] merge into one span.
    assert spans == [(0, 5)]


def test_coverage_includes_zero_coverage_docs(spark, span_docs):
    cov = {r.doc_id: r for r in retrieval.duplicate_span_coverage(span_docs, n=3).collect()}
    assert len(cov) == span_docs.count()
    assert cov[3].dup_tokens == 0 and cov[3].dup_frac == 0.0
    assert cov[0].dup_tokens == 5 and cov[0].n_tokens == 7
    assert cov[0].dup_frac == pytest.approx(5 / 7, abs=1e-4)


def test_short_docs_produce_no_grams(spark):
    docs = _docs(spark, ["a b", "a b"])
    assert retrieval.duplicate_spans(docs, n=3).count() == 0
    cov = retrieval.duplicate_span_coverage(docs, n=3).collect()
    assert [r.dup_tokens for r in cov] == [0, 0]


def test_bm25_ranks_term_heavy_doc_first(spark):
    docs = _docs(
        spark,
        [
            "spark spark spark join filter",      # heavy on the query term
            "spark table scan",                    # one hit
            "nothing relevant here at all",        # no hits → absent
            "vector vector stream",                # other query terms
        ],
    )
    top = retrieval.bm25_topk(docs, terms=["spark", "vector", "stream"], k=10).collect()
    ids = [r.doc_id for r in top]
    assert 2 not in ids
    assert len(ids) == 3
    # doc 3 matches two distinct terms (idf sums); doc 0 saturates tf on one
    assert ids[0] == 3
    assert set(ids) == {0, 1, 3}
    # scores strictly positive and sorted descending
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_k_limits_and_tie_break(spark):
    # two identical docs tie exactly → doc_id ascending decides the cutoff
    docs = _docs(spark, ["spark a", "spark a", "spark a"])
    top = retrieval.bm25_topk(docs, terms=["spark"], k=2).collect()
    assert [r.doc_id for r in top] == [0, 1]


def test_span_cleaned_corpus_drops_exactly_the_spans(spark, span_docs):
    out = {r.doc_id: r for r in retrieval.span_cleaned_corpus(span_docs, n=3).collect()}
    # doc 0: tokens x1..x5 are one dup span -> only the unique tail remains
    assert out[0].cleaned_text == "u1 u2"
    assert out[0].n_removed == 5 and out[0].n_tokens == 7
    # doc 3 had no duplicated grams: untouched
    assert out[3].cleaned_text == "unique tokens only here now"
    assert out[3].n_removed == 0
    # doc 2: both same-doc repeats removed, gap token survives
    assert out[2].cleaned_text == "z1"
    # every doc present
    assert len(out) == span_docs.count()


def test_new_ops_handle_empty_and_degenerate_corpora(spark):
    """Empty corpus and no-hit queries return empty results with the
    declared schemas, not errors."""
    from magiceye_spark.llmops.dedup import (
        containment_near_dups_indexed,
        winnow_overlap_pairs,
    )
    from magiceye_spark.llmops.textstats import bigram_logprob

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert retrieval.duplicate_spans(empty).count() == 0
    assert retrieval.bm25_topk(empty).count() == 0
    assert retrieval.span_cleaned_corpus(empty).count() == 0
    assert winnow_overlap_pairs(empty).count() == 0
    assert containment_near_dups_indexed(empty).count() == 0
    assert bigram_logprob(empty).count() == 0

    # no query term present anywhere -> empty, not error
    docs = _docs(spark, ["alpha beta", "gamma delta"])
    assert retrieval.bm25_topk(docs, terms=["zz"]).count() == 0
