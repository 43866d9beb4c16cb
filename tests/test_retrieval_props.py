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


import math

from magiceye_spark.llmops.retrieval import bm25_topk

QDOC = st.lists(st.sampled_from(["q1", "q2", "w", "x", "y"]), min_size=0, max_size=10).map(" ".join)
QCORPUS = st.lists(QDOC, min_size=1, max_size=8)


def _ref_bm25(texts, terms, k1=1.2, b=0.75):
    """Independent BM25: plain dicts and floats, no shared structure.
    Tokenization mirrors the engine pair's split-on-\\s+ semantics, where
    an empty/whitespace-only doc yields the single token '' (dl = 1)."""
    toks = [t.strip().lower().split() or [""] for t in texts]
    dls = [len(x) for x in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    out = {}
    for term in terms:
        df = sum(1 for x in toks if term in x)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, x in enumerate(toks):
            tf = x.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl)
                )
    return {i: round(s, 4) for i, s in out.items()}


@given(corpus=QCORPUS)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bm25_matches_reference(spark, corpus):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {r.doc_id: r.bm25 for r in bm25_topk(docs, terms=["q1", "q2"], k=100).collect()}
    want = _ref_bm25(corpus, ["q1", "q2"])
    assert got == want


from itertools import permutations

from magiceye_spark.llmops.dedup import containment_near_dups_indexed


def _ref_containment(texts, threshold, n):
    """Brute force: shingle sets via Python slicing, all ordered pairs."""
    def sh(t):
        toks = t.strip().lower().split() or [""]
        hi = max(len(toks) - n, 0)
        return {" ".join(toks[i : i + n]) for i in range(hi + 1)}

    sets = [sh(t) for t in texts]
    out = {}
    for a, b in permutations(range(len(texts)), 2):
        ratio = len(sets[a] & sets[b]) / len(sets[a])
        if ratio >= threshold:
            out[(a, b)] = round(ratio, 4)
    return out


@given(corpus=st.lists(DOC, min_size=2, max_size=7))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_containment_indexed_matches_bruteforce(spark, corpus):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {
        (r.contained_doc, r.container_doc): r.containment
        for r in containment_near_dups_indexed(
            docs, threshold=0.6, n=2, max_df=None
        ).collect()
    }
    want = _ref_containment(corpus, 0.6, 2)
    assert got == want


import hashlib

from magiceye_spark.llmops.dedup import winnow_fingerprints


def _ref_winnow(texts, n, window):
    """Brute force winnowing: md5-hex grams, min per window, per-doc set."""
    out = {}
    for i, t in enumerate(texts):
        toks = t.strip().lower().split() or [""]
        if len(toks) < n + window - 1:
            continue
        grams = [
            hashlib.md5(" ".join(toks[j : j + n]).encode()).hexdigest()
            for j in range(len(toks) - n + 1)
        ]
        fps = {
            min(grams[j : j + window]) for j in range(len(grams) - window + 1)
        }
        out[i] = fps
    return out


@given(corpus=st.lists(DOC, min_size=1, max_size=6), w=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_winnow_fingerprints_match_bruteforce(spark, corpus, w):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id: long, text: string"
    )
    got = {}
    for r in winnow_fingerprints(docs, n=2, window=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert got == _ref_winnow(corpus, 2, w)
