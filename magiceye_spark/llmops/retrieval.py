"""Keyword retrieval and span-level duplication operators.

Two training-data-pipeline capabilities the dedup/textstats families don't
cover:

- **BM25 top-k retrieval** (`bm25_topk`): score documents against a small
  set of query terms with the classic Okapi BM25 ranking function. The
  curation use-case is targeted corpus carving — "pull the k docs most
  about X" for eval-set construction or domain up-sampling.
- **Duplicate-span detection** (`duplicate_spans` /
  `duplicate_span_coverage`): find the *positions* of word n-grams that
  occur more than once in the corpus and merge them into maximal per-doc
  spans — substring-level dedup in the style of Lee et al., "Deduplicating
  Training Data Makes Language Models Better" (arXiv:2107.06499), where
  the unit of removal is the repeated span, not the whole document.

Scale design (100 TB posture):

- BM25: term frequencies are computed MAP-SIDE with array expressions
  (`F.filter` over the token array per query term) — no explode of the
  full token stream, so the only shuffled rows are (doc, term) hits for
  docs actually containing a query term. The per-term document-frequency
  table is |terms| rows (broadcast), corpus stats are a 1-row broadcast
  scalar, and the final top-k is a TakeOrdered — no global sort.
- Duplicate spans: gram occurrence counting aggregates md5(gram) keys
  (compact fixed-width shuffle keys with map-side partial aggregation —
  at larger scale swap md5 for xxhash64; md5 is used here because the
  DuckDB oracle has the identical function). The hit join shuffles on the
  same hash; the island merge is ONE doc_id-partitioned window over hit
  positions only (hits are a small fraction of tokens in a healthy
  corpus). Nothing is ever O(n²) in documents.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magiceye_spark.llmops.textstats import _tokens  # noqa: SLF001

#: default query — terms present in the synthetic corpus vocabulary
DEFAULT_TERMS = ["spark", "vector", "stream"]


# ------------------------------------------------------------------ BM25

def bm25_topk(
    docs: DataFrame,
    terms: list[str] | None = None,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a small query-term set.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    with idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5)).

    Plan: per-doc tf for each query term is a map-side array `filter` size
    (no token explode); only (doc, term) HITS are materialized. df(t) is a
    |terms|-row aggregate joined back broadcast; (N, avgdl) is a 1-row
    broadcast scalar; final ranking is a TakeOrdered limit, not a sort.
    Ties are broken on doc_id over the ROUNDED score so the cutoff is
    engine-deterministic.
    """
    terms = DEFAULT_TERMS if terms is None else terms
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    base = (
        docs.select("doc_id", _tokens(F.col(text_col)).alias("toks"))
        .withColumn("dl", F.size("toks"))
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    def _eq(t: str):
        # single-arg lambda factory: higher-order functions derive lambda
        # arity from the Python signature, so a default-arg closure would
        # be passed a second (index) variable.
        return lambda x: x == F.lit(t)

    tf_pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(F.filter(F.col("toks"), _eq(t))).alias("tf"),
            )
            for t in terms
        ]
    )
    hits = (
        base.select("doc_id", "dl", F.explode(tf_pairs).alias("e"))
        .select("doc_id", "dl", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"))
        .where(F.col("tf") > 0)
    )
    df_t = hits.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        hits.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * norm)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def sql_bm25_topk(
    terms: list[str] | None = None, k: int = 20, k1: float = 1.2, b: float = 0.75
) -> str:
    terms = DEFAULT_TERMS if terms is None else terms
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents),
ld AS (SELECT doc_id, toks, LENGTH(toks) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM ld),
hit AS (
  SELECT doc_id, dl, q.term,
         LENGTH(list_filter(toks, x -> x = q.term)) AS tf
  FROM ld CROSS JOIN (SELECT UNNEST([{term_list}]) AS term) q
  WHERE LENGTH(list_filter(toks, x -> x = q.term)) > 0),
df AS (SELECT term, COUNT(*) AS doc_freq FROM hit GROUP BY term)
SELECT doc_id,
       ROUND(SUM(LN(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
                 * tf * ({k1} + 1)
                 / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 4) AS bm25
FROM hit JOIN df USING (term) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


# ------------------------------------------------- duplicate span extents

def _gram_positions(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, pos, gram_md5) for every word n-gram start position.
    Docs shorter than n tokens produce no grams."""
    # explicit spread: one md5 per token position is CPU-dense on
    # byte-light input — the single-file scan would otherwise hash every
    # gram in one task, once per consuming subtree
    base = (
        docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
        .select("doc_id", _tokens(F.col(text_col)).alias("toks"))
        .where(F.size("toks") >= n)
    )
    idx = F.sequence(F.lit(0), F.size("toks") - n)
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n)))
    )
    # plain posexplode relies on the session-level
    # InferFiltersFromGenerate exclusion — the inferred `size(grams) > 0`
    # filter would otherwise be pushed below the repartition, re-running
    # the gram-hash transform in the scan stage
    return base.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram_md5")
    ).withColumn("pos", F.col("pos").cast("long"))


def duplicate_spans(
    docs: DataFrame, n: int = 8, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """Maximal duplicated token spans per document (substring-level dedup,
    Lee et al. arXiv:2107.06499): every start position whose word n-gram
    occurs >= ``min_count`` times corpus-wide (same-doc repeats included)
    is a duplicated gram; overlapping/adjacent duplicated grams merge into
    one maximal span via gaps-and-islands.

    Output: (doc_id, span_start, span_end, span_tokens) — token offsets,
    0-based inclusive. A cleaning pass would drop these token ranges.

    Plan: gram counting and the hit join both key on md5(gram) (compact
    fixed-width shuffle keys, map-side partial agg); the island merge is
    one doc_id window over HIT positions only. With fixed n, hit ends are
    monotone in start, so the merge condition is just
    ``pos > lag(pos) + n`` — no running-max needed.
    """
    pos = _gram_positions(docs, n, text_col)
    dup = (
        pos.groupBy("gram_md5")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_count)
        .select("gram_md5")
    )
    hits = pos.join(dup, "gram_md5").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") > F.lag("pos").over(w) + n),
        1,
    ).otherwise(0)
    island = F.sum("brk").over(
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hits.withColumn("brk", brk)
        .withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


def _sql_hits(n: int, min_count: int) -> str:
    toks = "regexp_split_to_array(TRIM(LOWER(text)), '\\s+')"
    return f"""
base AS (
  SELECT doc_id, {toks} AS toks FROM documents
  WHERE LENGTH({toks}) >= {n}),
pos AS (
  SELECT doc_id,
         UNNEST(range(1, LENGTH(toks) - {n} + 2)) - 1 AS pos,
         UNNEST(list_transform(range(1, LENGTH(toks) - {n} + 2),
                               i -> md5(array_to_string(toks[i:i+{n - 1}], ' ')))) AS gram_md5
  FROM base),
dup AS (
  SELECT gram_md5 FROM pos GROUP BY gram_md5 HAVING COUNT(*) >= {min_count}),
hits AS (SELECT doc_id, pos.pos AS pos FROM pos JOIN dup USING (gram_md5))"""


def sql_duplicate_spans(n: int = 8, min_count: int = 2) -> str:
    return f"""
WITH {_sql_hits(n, min_count)},
mark AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w IS NULL OR pos > LAG(pos) OVER w + {n}
              THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM mark)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {n} - 1 AS span_end,
       MAX(pos) + {n} - MIN(pos) AS span_tokens
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


def duplicate_span_coverage(
    docs: DataFrame, n: int = 8, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-token coverage: how much of each doc sits
    inside a duplicated span — the curation metric for span-level cleaning
    ("drop or trim docs that are mostly boilerplate/copies"). Docs with no
    duplicated span report 0.0; docs shorter than n tokens report n_tokens
    with zero coverage."""
    spans = duplicate_spans(docs, n=n, min_count=min_count, text_col=text_col)
    per_doc = spans.groupBy("doc_id").agg(F.sum("span_tokens").alias("dup_tokens"))
    lens = docs.select(
        "doc_id", F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        lens.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            "n_tokens",
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 4
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def span_cleaned_corpus(
    docs: DataFrame, n: int = 8, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """The REMOVE step of substring-level dedup (Lee et al.): rebuild each
    document with its duplicated spans dropped. Completes the pipeline
    `duplicate_spans` detects for — what actually ships to training.

    Plan: spans collapse to ONE small struct-array per doc (collect_list
    after the span groupBy), join back on doc_id, and the token drop is a
    map-side higher-order `filter` with an indexed lambda testing span
    membership — no token explode, no range join. Docs with no spans pass
    through untouched via the null guard (left join)."""
    spans = duplicate_spans(docs, n=n, min_count=min_count, text_col=text_col)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("spans")
    )
    base = docs.select("doc_id", _tokens(F.col(text_col)).alias("toks"))
    kept = F.when(F.col("spans").isNull(), F.col("toks")).otherwise(
        F.filter(
            F.col("toks"),
            lambda x, i: ~F.exists(
                F.col("spans"), lambda sp: (sp.s <= i) & (i <= sp.e)
            ),
        )
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .withColumn("kept", kept)
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("kept")).alias("cleaned_text"),
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size("kept")).cast("long").alias("n_removed"),
        )
        .orderBy("doc_id")
    )


def sql_span_cleaned_corpus(n: int = 8, min_count: int = 2) -> str:
    spans = sql_duplicate_spans(n, min_count).strip()
    return f"""
WITH spans AS ({spans}),
per_doc AS (
  SELECT doc_id, list({{'s': span_start, 'e': span_end}}) AS spans
  FROM spans GROUP BY doc_id),
base AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents),
k AS (
  SELECT base.doc_id, toks,
         CASE WHEN spans IS NULL THEN toks
              ELSE list_filter(toks, (x, i) ->
                     LENGTH(list_filter(spans,
                            sp -> sp.s <= i - 1 AND i - 1 <= sp.e)) = 0)
         END AS kept
  FROM base LEFT JOIN per_doc ON base.doc_id = per_doc.doc_id)
SELECT doc_id,
       -- DuckDB array_to_string([]) is NULL; Spark concat_ws is ''
       COALESCE(array_to_string(kept, ' '), '') AS cleaned_text,
       LENGTH(toks) AS n_tokens,
       LENGTH(toks) - LENGTH(kept) AS n_removed
FROM k ORDER BY doc_id
"""


def sql_duplicate_span_coverage(n: int = 8, min_count: int = 2) -> str:
    spans = sql_duplicate_spans(n, min_count).strip().rstrip()
    # reuse the span SQL as a subquery; DuckDB allows ORDER BY in a subquery
    return f"""
WITH spans AS ({spans}),
per_doc AS (SELECT doc_id, CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY doc_id),
lens AS (
  SELECT doc_id,
         LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS n_tokens
  FROM documents)
SELECT lens.doc_id,
       COALESCE(dup_tokens, 0) AS dup_tokens,
       n_tokens,
       ROUND(COALESCE(dup_tokens, 0) / CAST(n_tokens AS DOUBLE), 4) AS dup_frac
FROM lens LEFT JOIN per_doc ON lens.doc_id = per_doc.doc_id
ORDER BY lens.doc_id
"""


# ----------------------------------------------------------- phrase search

def phrase_search(
    docs: DataFrame,
    phrase: str = "big order scan",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase query over a POSITIONAL inverted index: documents
    containing the query tokens at consecutive positions, with the match
    count and the first match position (1-based).

    Index shape, not a scan: ``posexplode`` builds (doc_id, pos, token)
    postings, the filter to the query's terms prunes the postings BEFORE
    any shuffle (predicate on the exploded token — at 100 TB with a
    materialized postings table this is an index lookup of |terms|
    posting lists, not a corpus scan), and one groupBy(doc_id) folds the
    per-term position lists. Adjacency is then a pure array expression:
    positions p of term0 where every term_i has p+i in its list. Only
    docs containing ALL terms survive the size guards, so the aggregate
    state is bounded by the phrase's rarest term df.

    The DuckDB oracle walks every position of every document — the
    brute-force definition the index must reproduce exactly.
    """
    terms = phrase.split()
    pos = docs.select(
        "doc_id",
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
    ).where(F.col("tok").isin(terms))
    per_term = pos.groupBy("doc_id").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("tok") == t, F.col("pos") - i))
            ).alias(f"_p{i}")
            for i, t in enumerate(terms)
        ]
    )
    # _p{i} holds (pos - i) for term i, so a phrase match at position p is
    # simply p present in EVERY list — adjacency becomes set intersection.
    matches = F.filter(
        F.col("_p0"),
        lambda p: F.aggregate(
            F.array(*[F.array_contains(F.col(f"_p{i}"), p) for i in range(1, len(terms))]),
            F.lit(True),
            lambda acc, x: acc & x,
        ),
    )
    all_present = functools.reduce(
        lambda acc, i: acc & (F.size(F.col(f"_p{i}")) > 0),
        range(1, len(terms)),
        F.size(F.col("_p0")) > 0,
    )
    guarded = per_term.where(all_present)
    return (
        guarded.select("doc_id", matches.alias("_m"))
        .where(F.size("_m") > 0)
        .select(
            "doc_id",
            F.size("_m").alias("n_matches"),
            (F.element_at("_m", 1) + 1).alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def sql_phrase_search(phrase: str = "big order scan") -> str:
    terms = phrase.split()
    n = len(terms)
    conds = " AND ".join(
        f"toks[p + {i}] = '{t}'" for i, t in enumerate(terms)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) - {n} + 2), p -> {conds}) AS hits
  FROM t
  WHERE len(toks) >= {n}
)
SELECT doc_id,
       CAST(len(hits) AS BIGINT) AS n_matches,
       CAST(hits[1] AS BIGINT) AS first_pos
FROM m
WHERE len(hits) > 0
ORDER BY doc_id
"""


# ------------------------------------------------- hybrid retrieval (RRF)

def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str] | None = None,
    query_id: int = 0,
    k: int = 20,
    r: int = 100,
    kconst: int = 60,
) -> DataFrame:
    """Hybrid sparse+dense retrieval via reciprocal-rank fusion (Cormack
    et al., SIGIR 2009): fuse the BM25 top-``r`` list for the query terms
    with the embedding-cosine top-``r`` list for the query document's
    vector as ``rrf = Σ_rankers 1/(kconst + rank)``; docs absent from a
    ranker contribute 0 to the sum. The production pattern behind every
    RAG stack's "keyword + vector" search, here with BOTH legs reusing
    the repo's existing operators (:func:`bm25_topk`,
    :func:`simsearch.cosine_topk`).

    Determinism: each leg's rank comes from a total order (rounded score
    DESC, doc_id) computed identically in DuckDB, and the fusion score is
    a fixed-order sum of two exact rationals 1/(kconst+rank) — so the
    fused ranking is engine-exact, no tolerance needed. The dense leg
    excludes the query document itself (cosine_topk's self-match rule);
    the sparse leg may still surface it.

    Scale shape: both legs are bounded top-r lists per query (TakeOrdered
    / per-query windows — never a global sort), the fusion is a full
    outer join of two r-row-per-query frames keyed (query_id, doc_id),
    and the final top-k is again a TakeOrdered. With Q queries everything
    is per-query-partitioned; nothing grows with corpus size except the
    legs' own scans.
    """
    from magiceye_spark.llmops import simsearch

    terms = DEFAULT_TERMS if terms is None else terms
    sparse = bm25_topk(docs, terms, k=r).select(
        F.lit(query_id).alias("query_id"), "doc_id", "bm25"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    sparse = sparse.select(
        "query_id", "doc_id", F.row_number().over(w).alias("r_sparse")
    )
    q = emb.where(F.col("vec_id") == query_id)
    dense = simsearch.cosine_topk(emb, q, k=r).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_dense"),
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(kconst) + F.col("r_sparse")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(kconst) + F.col("r_dense")), F.lit(0.0))
    # order by the UNROUNDED fusion score (exactly what the SQL twin's
    # ORDER BY computes) and round only the displayed column — sorting on
    # the rounded value could order/cut the top-k differently from the
    # oracle when two scores straddle a 1e-6 rounding boundary
    return (
        fused.select(
            "query_id",
            "doc_id",
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("_rrf_exact"),
            "r_sparse",
            "r_dense",
        )
        .orderBy(F.desc("_rrf_exact"), "doc_id")
        .limit(k)
        .drop("_rrf_exact")
    )


def sql_hybrid_rrf_topk(
    terms: list[str] | None = None,
    query_id: int = 0,
    k: int = 20,
    r: int = 100,
    kconst: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    terms = DEFAULT_TERMS if terms is None else terms
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents),
ld AS (SELECT doc_id, toks, LENGTH(toks) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM ld),
hit AS (
  SELECT doc_id, dl, q.term,
         LENGTH(list_filter(toks, x -> x = q.term)) AS tf
  FROM ld CROSS JOIN (SELECT UNNEST([{term_list}]) AS term) q
  WHERE LENGTH(list_filter(toks, x -> x = q.term)) > 0),
df AS (SELECT term, COUNT(*) AS doc_freq FROM hit GROUP BY term),
bm25 AS (
  SELECT doc_id,
         ROUND(SUM(LN(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
                   * tf * ({k1} + 1)
                   / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 4) AS bm25
  FROM hit JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id),
sparse AS (
  SELECT {query_id} AS query_id, doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_sparse
  FROM bm25
  QUALIFY r_sparse <= {r}),
qv AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
       WHERE vec_id = {query_id}),
scored AS (
  SELECT qv.query_id, c.vec_id AS doc_id,
         ROUND(list_dot_product(CAST(qv.q_vec AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(qv.q_vec AS DOUBLE[]), CAST(qv.q_vec AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS cosine_sim
  FROM embeddings c CROSS JOIN qv
  WHERE qv.query_id <> c.vec_id),
dense AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, doc_id) AS r_dense
  FROM scored
  QUALIFY r_dense <= {r})
SELECT COALESCE(s.query_id, d.query_id) AS query_id,
       COALESCE(s.doc_id, d.doc_id) AS doc_id,
       ROUND(COALESCE(1.0 / ({kconst} + s.r_sparse), 0.0)
             + COALESCE(1.0 / ({kconst} + d.r_dense), 0.0), 6) AS rrf,
       CAST(s.r_sparse AS INTEGER) AS r_sparse,
       CAST(d.r_dense AS INTEGER) AS r_dense
FROM sparse s FULL JOIN dense d
  ON s.query_id = d.query_id AND s.doc_id = d.doc_id
ORDER BY COALESCE(1.0 / ({kconst} + s.r_sparse), 0.0)
         + COALESCE(1.0 / ({kconst} + d.r_dense), 0.0) DESC,
         COALESCE(s.doc_id, d.doc_id)
LIMIT {k}
"""
