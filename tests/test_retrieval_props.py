"""Property-based test: duplicate_spans vs an independent brute-force
reference over random small corpora. The reference recomputes duplicated
gram positions with a Python dict and merges intervals imperatively —
none of the Spark formulation (window lag, island sums) is shared."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from magiceye_spark.llmops.retrieval import duplicate_spans

# tiny alphabet so collisions (duplicated grams) actually occur
TOKEN = st.sampled_from(["a", "b", "c", "d"])
DOC = st.lists(TOKEN, min_size=0, max_size=14).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=8)


def _ref_spans(texts: list[str], n: int, min_count: int):
    """Brute force: count every n-gram occurrence corpus-wide, then merge
    overlapping/adjacent duplicated-gram intervals per doc."""
    grams: Counter = Counter()
    per_doc = []
    for text in texts:
        toks = text.split()
        starts = range(len(toks) - n + 1)
        doc_grams = [tuple(toks[i : i + n]) for i in starts]
        per_doc.append(doc_grams)
        grams.update(doc_grams)
    out = set()
    for doc_id, doc_grams in enumerate(per_doc):
        hit = [i for i, g in enumerate(doc_grams) if grams[g] >= min_count]
        if not hit:
            continue
        start = prev = hit[0]
        for i in hit[1:]:
            if i > prev + n:  # gap: previous span [prev, prev+n-1] can't touch [i, ...]
                out.add((doc_id, start, prev + n - 1, prev + n - start))
                start = i
            prev = i
        out.add((doc_id, start, prev + n - 1, prev + n - start))
    return out


@given(corpus=CORPUS, n=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_duplicate_spans_matches_bruteforce(spark, corpus, n):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(docs, n=n).collect()
    }
    want = _ref_spans(corpus, n, 2)
    assert got == want
