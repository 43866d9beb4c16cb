"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language identification, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — whole-stage codegen,
no UDFs, trivially scale-out (embarrassingly parallel per row; zero
shuffles). Each operator has a DuckDB-SQL twin for the driver's oracle
check; expressions are chosen so both engines compute bit-identical results
(integer counts, per-row rounded doubles, md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: whitespace-delimited token pattern shared by both engines
_WS = r"\s+"
#: BPE-ish token estimator: letter runs | single digits | single punctuation
#: (a crude GPT-2-style pre-tokenizer shape; counts, not splits)
BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT = r"[^A-Za-z0-9\s]"
DIGIT = r"[0-9]"
#: CJK unified ideographs as a literal character range (valid in both Java
#: regex and RE2 without engine-specific escapes)
CJK = "[一-鿿]"

#: stopword profiles for the language-ID heuristic (tiny, deterministic;
#: real pipelines plug in fastText — this is the SQL-expressible baseline)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "es": ["el", "los", "y", "que", "una", "por"],
    "fr": ["le", "les", "et", "une", "dans", "pour"],
}
#: deterministic tie-break order (first wins on >=)
LANG_ORDER = ["en", "de", "es", "fr"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), _WS)


def _r4(c: Column) -> Column:
    return F.round(c, 4)


def _isin(words: list[str]):
    # single-arg lambda factory: pyspark higher-order functions derive the
    # lambda's variable count from its Python signature, so default-arg
    # closures would be passed a second lambda variable.
    return lambda x: x.isin(*words)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: counts and ratios used for quality filtering."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    out = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH)).alias("n_bpeish_tokens"),
        _r4((n_chars - F.length(F.regexp_replace(t, _WS, ""))) / n_chars).alias("ws_ratio"),
        _r4(F.regexp_count(t, F.lit(PUNCT)) / n_chars).alias("punct_ratio"),
        _r4(F.regexp_count(t, F.lit(DIGIT)) / n_chars).alias("digit_ratio"),
        _r4(
            F.size(F.filter(toks, _isin(STOPWORDS["en"]))) / n_tokens
        ).alias("stopword_ratio"),
        _r4(
            F.length(F.regexp_replace(t, _WS, "")) / n_tokens
        ).alias("avg_token_len"),
    )
    return out


SQL_TEXT_STATS = f"""
SELECT doc_id,
       LENGTH(text) AS n_chars,
       LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS n_tokens,
       LENGTH(list_distinct(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}'))) AS n_uniq_tokens,
       LENGTH(regexp_extract_all(text, '{BPE_ISH}')) AS n_bpeish_tokens,
       ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '{_WS}', '', 'g'))) / CAST(LENGTH(text) AS DOUBLE), 4) AS ws_ratio,
       ROUND(LENGTH(regexp_extract_all(text, '{PUNCT}')) / CAST(LENGTH(text) AS DOUBLE), 4) AS punct_ratio,
       ROUND(LENGTH(regexp_extract_all(text, '{DIGIT}')) / CAST(LENGTH(text) AS DOUBLE), 4) AS digit_ratio,
       ROUND(LENGTH(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}'),
                    x -> x IN ('the','a','and','of','to','is')))
             / CAST(LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS DOUBLE), 4) AS stopword_ratio,
       ROUND(LENGTH(regexp_replace(text, '{_WS}', '', 'g'))
             / CAST(LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS DOUBLE), 4) AS avg_token_len
FROM documents
"""


# The weighted score sum runs in DECIMAL (exact, order-free), not DOUBLE:
# three of the four terms are exact short decimals (length term = n·0.002;
# the stopword/punct terms scale 4-dp-rounded ratios by 5·0.3 / 10·0.2), so
# true scores land EXACTLY on 4-dp halves for real docs (sf0.1 doc 1000:
# 0.032+0.09375+0.2+0.1625 = 0.48825) — where the double sum sits 1 ulp off
# the half and Spark's BigDecimal HALF_UP vs DuckDB's ×10⁴-then-round
# disagree (measured: 0.4882 vs 0.4883). The one non-terminating term
# (uniq/n) enters via a DECIMAL(16,12) cast of a single IEEE division that
# is bit-identical in both engines. Same class and fix as the weighted-
# money sums (PLANS.md "Exact decimal halves are a CLASS"). The [0,1] caps
# are CASE, not LEAST: DuckDB's LEAST over DECIMALs (even same-typed ones)
# promotes to DOUBLE, silently undoing the exact arithmetic; CASE with
# same-typed branches preserves the decimal in both engines.
_CAP1 = "CASE WHEN {x} < 1 THEN {x} ELSE CAST(1 AS {t}) END"
_T2 = _CAP1.format(x="(CAST(stopword_ratio AS DECIMAL(14,4)) * 5)", t="DECIMAL(18,4)")
_T3 = _CAP1.format(x="(CAST(punct_ratio AS DECIMAL(14,4)) * 10)", t="DECIMAL(18,4)")
_T4 = _CAP1.format(
    x="CAST(n_uniq_tokens / CAST(GREATEST(n_tokens, 1) AS DOUBLE)"
    " AS DECIMAL(16,12))",
    t="DECIMAL(16,12)",
)
_QUALITY_SCORE_DEC = f"""(
  CAST(LEAST(n_tokens, 200) AS DECIMAL(10,0)) * 0.002
  + ({_T2}) * 0.3
  + (1.0 - ({_T3})) * 0.2
  + ({_T4}) * 0.2
)"""


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length saturation + stopword
    presence + punctuation sanity — the standard cheap pre-filter shape for
    pretraining corpora (cf. C4/Gopher rules), deterministic and
    SQL-expressible. The weighted sum is decimal-exact (see
    _QUALITY_SCORE_DEC) so the 4-dp rounding is engine-identical even when
    the true score sits on a rounding half."""
    stats = text_stats(docs, text_col)
    score = F.expr(f"CAST(ROUND({_QUALITY_SCORE_DEC}, 4) AS DOUBLE)")
    return stats.select("doc_id", score.alias("quality_score"))


SQL_QUALITY = f"""
SELECT doc_id,
       CAST(ROUND({_QUALITY_SCORE_DEC}, 4) AS DOUBLE) AS quality_score
FROM ({SQL_TEXT_STATS})
"""


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: score each language profile by
    stopword hits (plus a CJK character count for zh) and take the argmax
    with a fixed tie-break order. Returns (doc_id, lang_pred, lang_score)."""
    t = F.col(text_col)
    toks = _tokens(t)
    scores = {
        lang: F.size(F.filter(toks, _isin(ws))) for lang, ws in STOPWORDS.items()
    }
    scores["zh"] = F.regexp_count(t, F.lit(CJK))
    order = LANG_ORDER + ["zh"]

    def wins(lang: str) -> Column:
        conds = [scores[lang] >= scores[o] for o in order if o != lang]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    pred, best = None, None
    for lang in order[:-1]:
        w = wins(lang)
        pred = (F.when if pred is None else pred.when)(w, F.lit(lang))
        best = (F.when if best is None else best.when)(w, scores[lang])
    pred = pred.otherwise(F.lit(order[-1]))
    best = best.otherwise(scores[order[-1]])
    return docs.select("doc_id", pred.alias("lang_pred"), best.cast("long").alias("lang_score"))


def _sql_lang_scores() -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    parts = [
        f"LENGTH(list_filter({toks}, x -> x IN ({', '.join(repr(w) for w in ws)}))) AS score_{lang}"
        for lang, ws in STOPWORDS.items()
    ]
    parts.append(f"LENGTH(regexp_extract_all(text, '{CJK}')) AS score_zh")
    return f"SELECT doc_id, {', '.join(parts)} FROM documents"


def sql_language_id() -> str:
    order = LANG_ORDER + ["zh"]
    whens = []
    for lang in order[:-1]:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in order if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    pred = "CASE " + " ".join(whens) + f" ELSE '{order[-1]}' END"
    score = "CASE " + " ".join(
        w.replace(f"THEN '{lang}'", f"THEN score_{lang}")
        for w, lang in zip(whens, order[:-1])
    ) + f" ELSE score_{order[-1]}" + " END"
    return (
        f"SELECT doc_id, {pred} AS lang_pred, CAST({score} AS BIGINT) AS lang_score "
        f"FROM ({_sql_lang_scores()})"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap — the
    training-window chunking pass. (doc_id, chunk_id, chunk_text,
    chunk_len). Pure expressions: explode(sequence) × substring, no UDF;
    output row count is Σ⌈len/stride⌉, computed without ever collecting a
    document to the driver."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    # chunks start at 1, 1+stride, 1+2*stride, ... while start <= len
    n_chunks = F.ceil((F.greatest(n - F.lit(overlap), F.lit(1))) / F.lit(stride))
    chunk_id = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    out = docs.select("doc_id", t.alias("_t"), chunk_id.alias("chunk_id"))
    chunk_text = F.substring(
        F.col("_t"), F.col("chunk_id") * stride + 1, chunk_chars
    )
    return out.select(
        "doc_id",
        "chunk_id",
        chunk_text.alias("chunk_text"),
        F.length(chunk_text).alias("chunk_len"),
    )


def sql_chunk_documents(chunk_chars: int = 512, overlap: int = 64) -> str:
    stride = chunk_chars - overlap
    return f"""
SELECT doc_id, chunk_id,
       substr(text, chunk_id * {stride} + 1, {chunk_chars}) AS chunk_text,
       LENGTH(substr(text, chunk_id * {stride} + 1, {chunk_chars})) AS chunk_len
FROM (
  SELECT doc_id, text,
         UNNEST(generate_series(0, CAST(CEIL(GREATEST(LENGTH(text) - {overlap}, 1)
                                             / CAST({stride} AS DOUBLE)) AS INTEGER) - 1)) AS chunk_id
  FROM documents
)
"""


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-k tokens by term frequency with document
    frequency — the token-histogram shape behind BPE vocab induction and
    stopword mining. Explode → two-level aggregate; the token groupBy gets
    map-side partial aggregation for free, so the shuffle carries one row
    per distinct (partition, token), not per occurrence — the property that
    makes this viable on a 100 TB corpus."""
    tok = F.explode(_tokens(F.col(text_col))).alias("token")
    per_doc = docs.select("doc_id", tok).where(F.col("token") != "")
    return (
        per_doc.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


def sql_vocab_topk(k: int = 100) -> str:
    return f"""
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM (
  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY tf DESC, token ASC
LIMIT {k}
"""


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF:
    tf(term, doc) · ln(N / df(term)), smooth-free, natural log rounded to
    6 — identical math both engines. Plan: one explode + per-doc term
    counts, a broadcast-sized df table joined back, a per-doc window for
    the top-k. (doc_id, term, tfidf, rnk)."""
    # tf computed ROW-LOCALLY (array fold over the distinct tokens) —
    # kills the (doc_id, term) token shuffle; rows leaving the map side
    # are already per-doc-distinct, so df is a plain COUNT (no 2-phase
    # countDistinct). 7 → 5 exchanges, and the shuffled volume drops from
    # every token to distinct terms per doc. Tokens are materialized
    # behind the explicit-count barrier first: the nested tf filter would
    # re-evaluate an inline split per distinct token.
    base = docs.select(
        "doc_id",
        F.filter(_tokens(F.col(text_col)), lambda t: t != F.lit("")).alias("toks"),
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = F.col("toks")
    pairs = F.transform(
        F.array_sort(F.array_distinct(toks)),
        lambda d: F.struct(
            d.alias("term"),
            F.size(F.filter(toks, lambda t: t == d)).alias("tf"),
        ),
    )
    tf = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.term").alias("term"), F.col("p.tf").alias("tf")
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .orderBy("doc_id", "rnk")
    )


def sql_tfidf_top_terms(k: int = 3) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    return f"""
WITH terms AS (
  SELECT doc_id, UNNEST({toks}) AS term FROM documents
),
t AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2),
d AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms WHERE term <> '' GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT t.doc_id, t.term,
         ROUND(t.tf * LN(n.n_docs / CAST(d.df AS DOUBLE)), 6) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY ROUND(t.tf * LN(n.n_docs / CAST(d.df AS DOUBLE)), 6) DESC,
                                     t.term ASC) AS rnk
  FROM t JOIN d USING (term) CROSS JOIN n
)
WHERE rnk <= {k}
ORDER BY doc_id, rnk
"""


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical fingerprints for dedup keys: md5 of whitespace-normalized
    lowercase text (exact-canonical) and md5 of the sorted distinct token
    set (bag-of-words identity — catches reorderings)."""
    t = F.col(text_col)
    canon = F.regexp_replace(F.trim(F.lower(t)), _WS, " ")
    bag = F.array_join(F.array_sort(F.array_distinct(_tokens(t))), " ")
    return docs.select(
        "doc_id",
        F.md5(canon).alias("canon_md5"),
        F.md5(bag).alias("bag_md5"),
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
       md5(regexp_replace(TRIM(LOWER(text)), '{_WS}', ' ', 'g')) AS canon_md5,
       md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}'))), ' ')) AS bag_md5
FROM documents
"""

#: Mersenne prime modulus — keeps acc*31 + h inside BIGINT on both engines
_ROLL_MOD = 2147483647


#: PII patterns — deliberately simple, valid in both Java regex and RE2
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,14}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII pattern counts: (doc_id, n_email, n_phone, n_ipv4,
    has_pii). The cheap regex pre-filter a corpus pipeline runs before the
    expensive NER pass — pure JVM regexp_count, no Python."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)) for k, p in PII_PATTERNS.items()}
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


SQL_PII_SCAN = f"""
SELECT doc_id,
       LENGTH(regexp_extract_all(text, '{PII_PATTERNS["email"]}')) AS n_email,
       LENGTH(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) AS n_phone,
       LENGTH(regexp_extract_all(text, '{PII_PATTERNS["ipv4"]}')) AS n_ipv4,
       (LENGTH(regexp_extract_all(text, '{PII_PATTERNS["email"]}'))
        + LENGTH(regexp_extract_all(text, '{PII_PATTERNS["phone"]}'))
        + LENGTH(regexp_extract_all(text, '{PII_PATTERNS["ipv4"]}'))) > 0 AS has_pii
FROM documents
"""


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace each PII match with a typed placeholder ([EMAIL]/[PHONE]/
    [IP]) — the scrub pass. Same regexes as :func:`pii_scan`, chained
    regexp_replace, still whole-stage codegen."""
    t = F.col(text_col)
    t = F.regexp_replace(t, PII_PATTERNS["email"], "[EMAIL]")
    t = F.regexp_replace(t, PII_PATTERNS["phone"], "[PHONE]")
    t = F.regexp_replace(t, PII_PATTERNS["ipv4"], "[IP]")
    return docs.withColumn(text_col, t)


def rolling_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token sequence
    (Rabin–Karp shape): h ← (h·31 + hash(token)) mod p. Distinguishes
    reorderings that ``bag_md5`` collapses; computed as a pure JVM
    ``aggregate`` expression — no UDF, embarrassingly parallel."""
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    roll = F.aggregate(
        _tokens(F.col(text_col)),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + tok_hash(t)) % _ROLL_MOD,
    )
    return docs.select("doc_id", roll.alias("rolling_hash"))


SQL_ROLLING_FP = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}'),
                          t -> CAST(CONCAT('0x', substr(md5(t), 1, 8)) AS BIGINT))),
         (acc, h) -> (acc * 31 + h) % {_ROLL_MOD}) AS rolling_hash
FROM documents
"""


# ------------------------------------------------------- repetition stats

def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText repetition
    filters): duplicate n-gram fraction for n=2,3 (1 − distinct/total) and
    the most-frequent-token share. Repetitious documents (boilerplate,
    scraper loops, degenerate generations) poison training corpora while
    sailing through length/stopword quality checks.

    All array expressions over the token list — row-local; the token
    array is materialized behind an explicit-count repartition barrier
    because the top-token fold's nested filter re-evaluates an inline
    split per distinct token (the nested-HOF re-evaluation pathology).
    """
    base = docs.select(
        "doc_id", _tokens(F.col(text_col)).alias("toks")
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = F.col("toks")

    def ngrams(n: int) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))

    def dup_frac(n: int) -> Column:
        g = ngrams(n)
        return _r4((F.size(g) - F.size(F.array_distinct(g))) / F.size(g))

    # most-frequent token share: count occurrences of each DISTINCT token
    # with a nested array fold (row-local; token lists are document-sized)
    top_share = _r4(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda t: t == d)),
            )
        )
        / F.size(toks)
    )
    return base.select(
        "doc_id",
        dup_frac(2).alias("dup_bigram_frac"),
        dup_frac(3).alias("dup_trigram_frac"),
        top_share.alias("top_token_frac"),
    )


def sql_repetition_stats() -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"

    def ngrams(n: int) -> str:
        # DuckDB list slicing is 1-based inclusive: t[i:i+n-1] is the n-gram
        return (
            f"list_transform(range(1, GREATEST(LENGTH(t) - {n} + 1, 1) + 1), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' '))"
        )

    def dup_frac(n: int) -> str:
        g = ngrams(n)
        return (
            f"ROUND((LENGTH({g}) - LENGTH(list_distinct({g})))"
            f" / CAST(LENGTH({g}) AS DOUBLE), 4)"
        )

    return f"""
WITH toksets AS (SELECT doc_id, {toks} AS t FROM documents)
SELECT doc_id,
       {dup_frac(2)} AS dup_bigram_frac,
       {dup_frac(3)} AS dup_trigram_frac,
       ROUND(list_max(list_transform(list_distinct(t),
                 d -> LENGTH(list_filter(t, x -> x = d))))
             / CAST(LENGTH(t) AS DOUBLE), 4) AS top_token_frac
FROM toksets
"""


def gopher_quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/MassiveText-style hard quality rules as boolean flags plus the
    conjunction verdict: word-count bounds, mean word length bounds, symbol
    ratio, and stopword presence (Rae et al. 2021 §A1.1, here with thresholds
    scaled to the synthetic corpus). Unlike ``quality_score`` (a soft
    ranking), these are the REJECT rules a curation pipeline applies first.

    Row-local column expressions only — map-only at any corpus scale.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_words = F.size(toks)
    mean_word_len = F.length(F.regexp_replace(t, _WS, "")) / F.greatest(
        n_words, F.lit(1)
    )
    symbol_ratio = F.regexp_count(t, F.lit(PUNCT)) / F.greatest(
        F.length(t), F.lit(1)
    )
    n_stop = F.size(F.filter(toks, _isin(STOPWORDS["en"])))
    flags = {
        "flag_word_count": (n_words >= 5) & (n_words <= 100_000),
        "flag_mean_word_len": (mean_word_len >= F.lit(2.0))
        & (mean_word_len <= F.lit(12.0)),
        "flag_symbol_ratio": symbol_ratio <= F.lit(0.2),
        "flag_stopwords": n_stop >= 1,
    }
    out = docs.select("doc_id", *[c.alias(n) for n, c in flags.items()])
    return out.withColumn(
        "passes_gopher",
        F.col("flag_word_count")
        & F.col("flag_mean_word_len")
        & F.col("flag_symbol_ratio")
        & F.col("flag_stopwords"),
    )


SQL_GOPHER_FLAGS = f"""
WITH s AS (
  SELECT doc_id,
         LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS n_words,
         LENGTH(regexp_replace(text, '{_WS}', '', 'g'))
           / CAST(GREATEST(LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')), 1) AS DOUBLE) AS mean_word_len,
         LENGTH(regexp_extract_all(text, '{PUNCT}'))
           / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE) AS symbol_ratio,
         LENGTH(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}'),
                x -> x IN ('the','a','and','of','to','is'))) AS n_stop
  FROM documents)
SELECT doc_id,
       n_words >= 5 AND n_words <= 100000 AS flag_word_count,
       mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS flag_mean_word_len,
       symbol_ratio <= 0.2 AS flag_symbol_ratio,
       n_stop >= 1 AS flag_stopwords,
       (n_words >= 5 AND n_words <= 100000)
         AND (mean_word_len >= 2.0 AND mean_word_len <= 12.0)
         AND symbol_ratio <= 0.2 AND n_stop >= 1 AS passes_gopher
FROM s
"""


def length_buckets(docs: DataFrame, text_col: str = "text", budget: int = 512) -> DataFrame:
    """Token-length histogram by power-of-two bucket with the packing
    efficiency a fixed ``budget``-token context would achieve packing each
    bucket alone (``bucket_tokens / (ceil(docs·len/budget)·budget)``). The
    pre-flight report for sequence packing: where the corpus mass sits and
    how much padding a naive per-bucket packer would burn.

    One map-side bucket assignment + one small groupBy — a single shuffle
    whose cardinality is ~log2(max_len) rows.
    """
    n_tokens = F.size(_tokens(F.col(text_col)))
    b = F.pow(F.lit(2.0), F.floor(F.log2(F.greatest(n_tokens, F.lit(1))))).cast("long")
    per_doc = docs.select(n_tokens.alias("n_tokens"), b.alias("bucket"))
    return (
        per_doc.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .withColumn(
            "packing_efficiency",
            F.round(
                F.col("total_tokens")
                / (
                    F.ceil(F.col("total_tokens") / F.lit(float(budget)))
                    * F.lit(float(budget))
                ),
                4,
            ),
        )
        .orderBy("bucket")
    )


def sql_length_buckets(budget: int = 512) -> str:
    return f"""
WITH d AS (
  SELECT LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS n_tokens
  FROM documents),
b AS (
  SELECT n_tokens,
         CAST(POW(2.0, FLOOR(LOG2(GREATEST(n_tokens, 1)))) AS BIGINT) AS bucket
  FROM d)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_tokens), 4) AS avg_tokens,
       ROUND(SUM(n_tokens) / (CEIL(SUM(n_tokens) / {float(budget)}) * {float(budget)}), 4) AS packing_efficiency
FROM b
GROUP BY bucket
ORDER BY bucket
"""


# ------------------------------------------------- per-source report card

def entropy_from_tokens(toks: Column) -> Column:
    """Token entropy −Σ p·ln p from an ALREADY-MATERIALIZED tokens column.
    Folds over the SORTED distinct token list so every engine sums in the
    same IEEE order. Pass a concrete column (e.g. one that crossed an
    exchange), not an inline `split(...)` expression: the nested filter's
    argument is re-evaluated per distinct token, so an inline split costs
    O(distinct · len) re-splits per row (measured 6.9× at sf0.1)."""
    n = F.size(toks)
    counts = F.transform(
        F.array_sort(F.array_distinct(toks)),
        lambda d: F.size(F.filter(toks, lambda t: t == d)),
    )
    return -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + (c / n) * F.log(c / n),
    )


def token_entropy(text_col: str = "text") -> Column:
    """Row-local token-entropy column over raw text — convenience wrapper;
    for corpus-sized scans prefer materializing the token array behind a
    repartition barrier and calling :func:`entropy_from_tokens` (see its
    docstring for why)."""
    return entropy_from_tokens(_tokens(F.col(text_col)))


def source_report_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per source: the corpus-audit dashboard a mixing decision
    reads — volume, length profile, language share, duplicate exposure,
    and token-entropy (the information-density proxy: low entropy =
    repetitious/templated text even when repetition n-gram filters pass).

    Plan: per-doc signals (tokens, entropy, lang flag) are row-local array
    expressions; the duplicate flag is ONE window over the bag-canonical
    hash (count per hash, shuffle on the hash); the rollup is one
    source-keyed agg with map-side partials. Entropy folds over the SORTED
    distinct token list so Spark and the oracle sum in the same IEEE order.
    The token array is materialized behind an explicit-count repartition
    barrier first — the entropy fold's nested filter re-evaluates an
    inline split per distinct token (6.9× at sf0.1).
    """
    from pyspark.sql.window import Window

    base = docs.select(
        "source",
        "n_chars",
        "lang",
        _tokens(F.col(text_col)).alias("toks"),
    ).repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = F.col("toks")
    per_doc = base.select(
        "source",
        F.col("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
        entropy_from_tokens(toks).alias("entropy"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("h"),
    ).withColumn(
        "is_dup", (F.count(F.lit(1)).over(Window.partitionBy("h")) > 1).cast("int")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("is_en"), 4).alias("en_frac"),
            F.round(F.avg("is_dup"), 4).alias("dup_doc_frac"),
            F.round(F.avg("entropy"), 4).alias("avg_token_entropy"),
        )
        .orderBy("source")
    )


def sql_source_report_card() -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    cnt = f"LENGTH(list_filter(toks, x -> x = d))"
    p = f"({cnt} / CAST(LENGTH(toks) AS DOUBLE))"
    return f"""
WITH base AS (
  SELECT source, n_chars, lang, {toks} AS toks FROM documents),
per_doc AS (
  SELECT source, n_chars,
         LENGTH(toks) AS n_tokens,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         -(list_sum(list_transform(list_sort(list_distinct(toks)),
                                   d -> {p} * LN({p})))) AS entropy,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS h
  FROM base),
flagged AS (
  SELECT *, CASE WHEN COUNT(*) OVER (PARTITION BY h) > 1 THEN 1 ELSE 0 END AS is_dup
  FROM per_doc)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       ROUND(AVG(n_tokens), 4) AS avg_tokens,
       ROUND(AVG(is_en), 4) AS en_frac,
       ROUND(AVG(is_dup), 4) AS dup_doc_frac,
       ROUND(AVG(entropy), 4) AS avg_token_entropy
FROM flagged
GROUP BY source
ORDER BY source
"""


# ------------------------------------------- bigram LM quality (CCNet-ish)

def bigram_logprob(docs: DataFrame, alpha: float = 0.5, text_col: str = "text") -> DataFrame:
    """Perplexity-proxy quality score without an external LM: each doc's
    mean bigram log-likelihood under the CORPUS's own add-α-smoothed
    bigram model — the relational core of CCNet-style perplexity
    filtering (docs whose word transitions are unlike the corpus score
    very negative: gibberish, wrong-language fragments, shredded text).

    score(d) = (1/m) Σ ln( (B(w₁,w₂) + α) / (U(w₁) + α·V) )

    Plan: ONE exploded bigram stream feeds both count tables; scoring
    joins the stream against bigram counts (shuffle on the bigram key)
    and unigram counts (broadcast at catalog vocab, shuffle join at web
    vocab — Spark picks by stats), then one per-doc mean. V is a scalar
    broadcast. Output: (doc_id, n_bigrams, avg_logprob).
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    stream = (
        # explicit spread BEFORE the persist: the cached stream keeps
        # whatever partitioning it materializes with, so a single-scan-
        # task persist serializes all four consumers (measured 21 s of
        # 1-task stage time at sf0.1). Plain explode is safe under the
        # session-level InferFiltersFromGenerate exclusion (PLANS.md
        # "CPU-dense stages vs byte-based sizing").
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
        .where(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .where(F.col("w2").isNotNull())
    )
    # four consumers (bi, uni, V, scoring) would each re-scan and
    # re-explode the corpus; persist the compact stream once (measured
    # 16.6 s → materialize-once at sf0.1). Lifecycle note as in
    # io.assign_global_ids.
    stream = stream.persist()
    bi = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bn"))
    uni = stream.groupBy("w1").agg(F.count(F.lit(1)).alias("un"))
    v = stream.agg(F.countDistinct("w1").alias("v"))
    lp = F.log(
        (F.col("bn") + alpha) / (F.col("un") + alpha * F.col("v"))
    )
    return (
        stream.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def sql_bigram_logprob(alpha: float = 0.5) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    return f"""
WITH base AS (
  SELECT doc_id, {toks} AS toks FROM documents
  WHERE LENGTH({toks}) >= 2),
stream AS (
  SELECT doc_id,
         UNNEST(toks[1:LENGTH(toks) - 1]) AS w1,
         UNNEST(toks[2:LENGTH(toks)]) AS w2
  FROM base),
bi AS (SELECT w1, w2, COUNT(*) AS bn FROM stream GROUP BY w1, w2),
uni AS (SELECT w1, COUNT(*) AS un FROM stream GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS v FROM stream)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(AVG(LN((bn + {alpha}) / (un + {alpha} * v))), 4) AS avg_logprob
FROM stream JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
GROUP BY doc_id
ORDER BY doc_id
"""


def source_similarity_matrix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pairwise cosine similarity between sources' unigram COUNT vectors —
    the outlier-source detector (a source whose token distribution is
    unlike every other needs review before mixing; near-1.0 pairs suggest
    mirrors). Sparse formulation: token-count join on shared tokens plus
    per-source norms — no dense vocab grid, no smoothing parameter.

    Plan: one (source, token) count agg over the corpus, a norms rollup,
    and the pair dot-products via a token-keyed self-join of the
    CATALOG-sized count table. Σ over shared tokens only — exact for
    cosine. Dot products fold per (a, b) with integer products (engine-
    exact); only the final ratio is floating point.
    """
    toks = _tokens(F.col(text_col))
    counts = (
        docs.select("source", F.explode(toks).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    norms = counts.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).alias("sq")
    )
    a = counts.select(
        F.col("source").alias("source_a"), "w", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("source_b"), "w", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(F.col("source").alias("source_a"), F.col("sq").alias("sqa"))
    nb = norms.select(F.col("source").alias("source_b"), F.col("sq").alias("sqb"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("dot") / (F.sqrt("sqa") * F.sqrt("sqb")), 6
            ).alias("cosine_sim"),
        )
        .orderBy("source_a", "source_b")
    )


SQL_SOURCE_SIMILARITY = f"""
WITH counts AS (
  SELECT source, w, COUNT(*) AS c FROM (
    SELECT source, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS w
    FROM documents)
  WHERE w <> ''
  GROUP BY source, w),
norms AS (SELECT source, CAST(SUM(c * c) AS BIGINT) AS sq FROM counts GROUP BY source),
dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM counts a JOIN counts b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b,
       ROUND(dot / (SQRT(na.sq) * SQRT(nb.sq)), 6) AS cosine_sim
FROM dots
JOIN norms na ON na.source = dots.source_a
JOIN norms nb ON nb.source = dots.source_b
ORDER BY source_a, source_b
"""


def vocab_zipf_slope(docs: DataFrame, top_n: int = 1000, text_col: str = "text") -> DataFrame:
    """Zipf diagnostic: the log-log slope of the rank-frequency curve over
    the top-N vocabulary (natural text ≈ −1; far shallower = synthetic or
    templated vocabulary, far steeper = degenerate repetition). Exact
    integer term counts; ranks from a two-phase global rank (count DESC,
    term ASC — :func:`magiceye_spark.io.two_phase_window`, parallel over
    the vocabulary instead of a single-task sort of a real corpus's
    multi-hundred-million-term vocab); the OLS slope runs on
    ln(rank)/ln(freq) doubles over at most top_n catalog-sized rows.
    Output: one row (n_terms, slope, intercept)."""
    from magiceye_spark.io import two_phase_window

    toks = F.explode(_tokens(F.col(text_col))).alias("term")
    counts = (
        docs.select(toks)
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = two_phase_window(
        counts, [F.desc("freq"), F.asc("term")], rank_col="rank"
    ).where(F.col("rank") <= top_n)
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "n_terms",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


def sql_vocab_zipf_slope(top_n: int = 1000) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    return f"""
WITH counts AS (
  SELECT term, COUNT(*) AS freq
  FROM (SELECT UNNEST({toks}) AS term FROM documents)
  WHERE term <> ''
  GROUP BY term),
ranked AS (
  SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS DOUBLE)) AS x,
         LN(CAST(freq AS DOUBLE)) AS y,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank
  FROM counts
  QUALIFY rank <= {top_n}),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx,
         COUNT(*) AS n_terms
  FROM ranked)
SELECT n_terms,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept
FROM s
"""


def token_pmi_pairs(
    docs: DataFrame, min_pair_docs: int = 5, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Collocation mining: top token pairs by pointwise mutual information
    over document-level co-occurrence — PMI = ln(N·n_ab / (n_a·n_b)).
    High-PMI pairs are the multi-word expressions a tokenizer or phrase
    index should treat as units. Doc-distinct tokens explode into
    row-local pairs (the collect_set idiom — no self-join); counts are
    exact integers, floats only at the final log. Ranked output is
    tie-broken on the pair so both engines cut identically."""
    from pyspark.sql.window import Window

    toks = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    base = docs.select(F.filter(toks, lambda t: t != F.lit("")).alias("toks"))
    n_docs = base.count()
    pairs = F.flatten(
        F.transform(
            F.col("toks"),
            lambda a, i: F.transform(
                F.slice(F.col("toks"), i + 2, F.size(F.col("toks"))),
                lambda b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            ),
        )
    )
    pair_counts = (
        base.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_docs)
    )
    tok_counts = (
        base.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    ca = tok_counts.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    cb = tok_counts.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    pmi = F.log(
        (F.col("n_ab").cast("double") * n_docs)
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    # rank over the UNROUNDED pmi (matching the SQL twin) — ordering by
    # the rounded value diverges when distinct count triples land within
    # 5e-5 of each other. Two-phase global rank: the pair table grows
    # ~vocab² on a real corpus, so an unpartitioned Window.orderBy here
    # would serialize it through one core; the range-partitioned rank
    # (magiceye_spark.io.two_phase_window) stays parallel and the df
    # floor (n_ab >= min_pair_docs) lands BELOW the rank.
    from magiceye_spark.io import two_phase_window

    scored = (
        pair_counts.join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .select("tok_a", "tok_b", "n_ab", pmi.alias("_praw"))
    )
    return (
        two_phase_window(
            scored,
            [F.desc("_praw"), F.asc("tok_a"), F.asc("tok_b")],
            rank_col="rank",
        )
        .where(F.col("rank") <= top_k)
        .select("tok_a", "tok_b", "n_ab", F.round("_praw", 4).alias("pmi"), "rank")
        .orderBy("rank")
    )


def sql_token_pmi_pairs(min_pair_docs: int = 5, top_k: int = 50) -> str:
    toks = f"list_sort(list_distinct(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')))"
    return f"""
WITH d AS (
  SELECT ROW_NUMBER() OVER () AS rid, list_filter({toks}, t -> t <> '') AS toks
  FROM documents),
n AS (SELECT COUNT(*) AS n_docs FROM d),
tok AS (SELECT rid, UNNEST(toks) AS tok FROM d),
tc AS (SELECT tok, COUNT(*) AS n_tok FROM tok GROUP BY tok),
pc AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_ab
  FROM tok a JOIN tok b ON a.rid = b.rid AND a.tok < b.tok
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_pair_docs}),
scored AS (
  SELECT tok_a, tok_b, n_ab,
         ROUND(LN(n_ab * CAST(n.n_docs AS DOUBLE) / (ca.n_tok * CAST(cb.n_tok AS DOUBLE))), 4) AS pmi,
         LN(n_ab * CAST(n.n_docs AS DOUBLE) / (ca.n_tok * CAST(cb.n_tok AS DOUBLE))) AS pmi_raw
  FROM pc
  JOIN tc ca ON ca.tok = pc.tok_a
  JOIN tc cb ON cb.tok = pc.tok_b
  CROSS JOIN n)
SELECT tok_a, tok_b, n_ab, pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi_raw DESC, tok_a ASC, tok_b ASC) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {top_k}
ORDER BY rank
"""


def bigram_continuations(
    docs: DataFrame, k: int = 3, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Language-model-as-table: for each word, its top-k most likely next
    words with conditional probability — the autocomplete/suggest table
    and the inspectable form of the bigram LM the perplexity filter uses.
    One exploded bigram stream, one (w1, w2) count, one per-w1 rank
    window; probabilities row-normalized over KEPT rows' parent totals."""
    from pyspark.sql.window import Window

    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    stream = (
        # explicit spread; plain explode is safe under the session-level
        # InferFiltersFromGenerate exclusion (see bigram_logprob)
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
        .where(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    counts = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("w1")
    rankw = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        counts.withColumn("p", F.round(F.col("n") / F.sum("n").over(tot), 4))
        .withColumn("rank", F.row_number().over(rankw).cast("long"))
        .where((F.col("rank") <= k) & (F.col("n") >= min_count))
        .select("w1", "w2", "n", "p", "rank")
        .orderBy("w1", "rank")
    )


def sql_bigram_continuations(k: int = 3, min_count: int = 5) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    return f"""
WITH base AS (
  SELECT {toks} AS toks FROM documents WHERE LENGTH({toks}) >= 2),
stream AS (
  SELECT UNNEST(toks[1:LENGTH(toks) - 1]) AS w1,
         UNNEST(toks[2:LENGTH(toks)]) AS w2
  FROM base),
c AS (SELECT w1, w2, COUNT(*) AS n FROM stream GROUP BY w1, w2),
r AS (
  SELECT w1, w2, n,
         ROUND(n / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE), 4) AS p,
         CAST(ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY n DESC, w2 ASC) AS BIGINT) AS rank
  FROM c)
SELECT w1, w2, n, p, rank
FROM r
WHERE rank <= {k} AND n >= {min_count}
ORDER BY w1, rank
"""


def source_charset_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source character-class profile: ASCII-letter, digit,
    whitespace, CJK, and other shares — the encoding/mojibake screen run
    before any tokenizer commits to a corpus. Row-local regexp counts
    rolled up per source; exact integer counts, shares at the end."""
    t = F.col(text_col)
    n = F.length(t)
    counts = {
        "letters": F.regexp_count(t, F.lit(r"[A-Za-z]")),
        "digits": F.regexp_count(t, F.lit(DIGIT)),
        "spaces": n - F.length(F.regexp_replace(t, _WS, "")),
        "cjk": F.regexp_count(t, F.lit(CJK)),
    }
    per_doc = docs.select(
        "source",
        n.alias("n_chars"),
        *[c.alias(k) for k, c in counts.items()],
    ).withColumn(
        "other",
        F.col("n_chars") - F.col("letters") - F.col("digits")
        - F.col("spaces") - F.col("cjk"),
    )
    sums = [F.sum(k).alias(f"s_{k}") for k in (*counts, "other")]
    out = per_doc.groupBy("source").agg(F.sum("n_chars").alias("chars"), *sums)
    total = F.col("chars").cast("double")
    return out.select(
        "source",
        F.col("chars").cast("long").alias("n_chars"),
        *[
            F.round(F.col(f"s_{k}") / total, 6).alias(f"{k}_share")
            for k in (*counts, "other")
        ],
    ).orderBy("source")


SQL_SOURCE_CHARSET_PROFILE = f"""
WITH per_doc AS (
  SELECT source, LENGTH(text) AS n_chars,
         LENGTH(regexp_extract_all(text, '[A-Za-z]')) AS letters,
         LENGTH(regexp_extract_all(text, '{DIGIT}')) AS digits,
         LENGTH(text) - LENGTH(regexp_replace(text, '{_WS}', '', 'g')) AS spaces,
         LENGTH(regexp_extract_all(text, '{CJK}')) AS cjk
  FROM documents),
x AS (SELECT *, n_chars - letters - digits - spaces - cjk AS other FROM per_doc)
SELECT source,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       ROUND(SUM(letters) / CAST(SUM(n_chars) AS DOUBLE), 6) AS letters_share,
       ROUND(SUM(digits) / CAST(SUM(n_chars) AS DOUBLE), 6) AS digits_share,
       ROUND(SUM(spaces) / CAST(SUM(n_chars) AS DOUBLE), 6) AS spaces_share,
       ROUND(SUM(cjk) / CAST(SUM(n_chars) AS DOUBLE), 6) AS cjk_share,
       ROUND(SUM(other) / CAST(SUM(n_chars) AS DOUBLE), 6) AS other_share
FROM x
GROUP BY source
ORDER BY source
"""


def source_hapax_rate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary health per source: hapax rate (share of the source's
    vocabulary occurring exactly once) and type-token ratio. A near-zero
    hapax rate on a large source flags template/synthetic text; an
    extreme one flags OCR noise or tokenizer breakage. One (source,
    token) count + one source rollup."""
    toks = F.explode(_tokens(F.col(text_col))).alias("tok")
    counts = (
        docs.select("source", toks)
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("n").cast("long").alias("tokens"),
            F.sum((F.col("n") == 1).cast("int")).cast("long").alias("hapax"),
            F.round(
                F.sum((F.col("n") == 1).cast("int")) / F.count(F.lit(1)), 4
            ).alias("hapax_rate"),
            F.round(F.count(F.lit(1)) / F.sum("n"), 4).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


SQL_SOURCE_HAPAX_RATE = f"""
WITH c AS (
  SELECT source, tok, COUNT(*) AS n FROM (
    SELECT source, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS tok
    FROM documents)
  WHERE tok <> ''
  GROUP BY source, tok)
SELECT source,
       COUNT(*) AS vocab,
       CAST(SUM(n) AS BIGINT) AS tokens,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS hapax_rate,
       ROUND(COUNT(*) / CAST(SUM(n) AS DOUBLE), 4) AS type_token_ratio
FROM c
GROUP BY source
ORDER BY source
"""


# ------------------------------------------------- BPE vocab induction

def bpe_train(
    docs: DataFrame,
    num_merges: int = 64,
    text_col: str = "text",
    max_word_types: int = 1_000_000,
) -> DataFrame:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2015) over
    the corpus — the step after :func:`vocab_topk`'s histogram: learn the
    ``num_merges`` highest-frequency symbol merges and return them ranked,
    ``(rank, left, right, merged, pair_count)``.

    Scale shape (the HF-tokenizers design, and the repo's IVF k-means
    precedent): ONE distributed corpus pass aggregates to the distinct
    WORD-frequency table — map-side-combined explode+groupBy, the shuffle
    carries distinct words, not occurrences — then the merge loop runs
    driver-side over that bounded table (word TYPES, ~1 M for web-scale
    corpora; ``max_word_types`` caps the documented driver
    materialization by dropping the lowest-frequency tail, exactly the
    min_frequency cut real tokenizer training applies). Each merge
    re-counts pairs only in words that CONTAIN the merged pair via an
    inverted pair→word index — the classic incremental trainer, not a
    quadratic rescan. Ties break on (count desc, left asc, right asc) so
    the result is deterministic in both engines and in the pure-Python
    reference test pin.

    End-of-word is modeled with a '</w>' sentinel so merges never cross
    word boundaries."""
    toks = F.explode(_tokens(F.col(text_col))).alias("w")
    all_types = (
        docs.select(toks)
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    words = all_types.orderBy(F.desc("n"), F.asc("w")).limit(max_word_types)
    wc = [(r["w"], int(r["n"])) for r in words.collect()]
    # no-silent-caps rule (README): if the tail cut binds, SAY so — a
    # silently truncated type table trains a subtly different vocabulary.
    # One extra count over the already-aggregated (distinct-word-sized)
    # frame, only when the collect hit the cap exactly.
    if len(wc) == max_word_types:
        n_types = all_types.count()
        if n_types > max_word_types:
            import warnings

            warnings.warn(
                f"bpe_train: word-type table truncated to max_word_types="
                f"{max_word_types} ({n_types - max_word_types} lowest-"
                f"frequency types dropped, {n_types} total); raise "
                f"max_word_types or pre-filter by min frequency",
                stacklevel=2,
            )

    splits = {w: tuple(list(w) + ["</w>"]) for w, _ in wc}
    counts: dict[str, int] = dict(wc)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}
    for w, n in wc:
        seq = splits[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(w)

    merges = []
    for rank in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt <= 0:
            break
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        for w in list(pair_words.get((left, right), ())):
            seq = splits[w]
            n = counts[w]
            # remove old pair contributions of this word
            for p in zip(seq, seq[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        pair_words.pop(p, None)
            # apply the merge within the word
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = tuple(out)
            splits[w] = seq
            # add new pair contributions
            for p in zip(seq, seq[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(w)

    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


def bpe_segment_stats(
    docs: DataFrame, merges_df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus compression achieved by a learned BPE merge table: per-source
    characters, whitespace tokens, BPE symbols after applying the merges,
    and the chars-per-symbol ratio (the number tokenizer training is
    optimizing). The merge application runs JVM-side per WORD over the
    distinct-word table (not per occurrence): each merge rank becomes one
    ``regexp_replace`` on a '\\x00'-joined symbol string — a fixed-size
    expression chain built from the (bounded, collected) merge table —
    then occurrence-weighted per source. One corpus shuffle + one
    broadcast join of the symbol counts back onto sources."""
    merges = [
        (r["left"], r["right"], r["merged"])
        for r in merges_df.orderBy("rank").collect()
    ]
    toks = F.explode(_tokens(F.col(text_col))).alias("w")
    per_source = (
        docs.select(F.col("source"), toks)
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    import re as _re

    # symbol string: chars joined by \x00 with the </w> sentinel; each
    # regexp_replace consumes non-overlapping matches left-to-right —
    # exactly the single-scan pair application the trainer uses. The
    # pattern is ANCHORED to symbol boundaries with zero-width lookaround
    # (consuming the delimiters would skip consecutive merges): without
    # anchoring, 'o\x00w' would also fire INSIDE the multi-char symbol
    # 'to', merging across symbols the trainer never merges.
    sym = F.concat_ws("\x00", F.split(F.col("w"), ""), F.lit("</w>"))
    for left, right, merged in merges:
        pat = (
            "(?<=\x00|^)" + _re.escape(left) + "\x00" + _re.escape(right) + "(?=\x00|$)"
        )
        repl = merged.replace("\\", "\\\\").replace("$", r"\$")
        sym = F.regexp_replace(sym, F.lit(pat), F.lit(repl))
    n_sym = F.size(F.split(sym, "\x00"))
    return (
        per_source.select(
            "source",
            "n",
            (F.length("w") * F.col("n")).alias("chars"),
            (n_sym * F.col("n")).alias("symbols"),
        )
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum("chars").alias("n_chars"),
            F.sum("symbols").alias("n_symbols"),
            F.round(F.sum("chars") / F.sum("symbols"), 4).alias("chars_per_symbol"),
        )
        .orderBy("source")
    )


def cross_source_perplexity(docs: DataFrame, alpha: float = 0.5, text_col: str = "text") -> DataFrame:
    """Domain-mismatch matrix: each SOURCE's documents scored under every
    source's add-α bigram LM — avg over docs of the per-doc mean bigram
    log-likelihood. The diagonal (own-LM) scores highest; a low
    off-diagonal cell says those two sources speak different
    distributions, the signal behind mixing-weight and curriculum
    decisions (and the multi-source generalization of
    :func:`bigram_logprob`'s single-corpus score).

    Plan: the bigram stream explodes ONCE (spread before the persist),
    per-source count tables group it by (lm_source, w1, w2) / (lm_source,
    w1), and scoring crosses the stream with the source list (broadcast
    nested loop over a dimension-sized side) then LEFT joins the count
    tables — a bigram absent from an LM scores ln(α / (U + α·V)) with
    B=0, exactly the smoothing's unseen-transition mass. Two shuffle
    joins keyed by (lm_source, bigram); per-doc means round at 6 before
    the matrix avg so both engines aggregate identical inputs.

    Output: (doc_source, lm_source, n_docs, avg_logprob).
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    bigrams = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    stream = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
        .where(F.size(toks) >= 2)
        .select("doc_id", "source", F.explode(bigrams).alias("b"))
        .select(
            "doc_id", "source", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
        )
        .where(F.col("w2").isNotNull())
        .persist()
    )
    bi = stream.groupBy(
        F.col("source").alias("lm_source"), "w1", "w2"
    ).agg(F.count(F.lit(1)).alias("bn"))
    uni = stream.groupBy(F.col("source").alias("lm_source"), "w1").agg(
        F.count(F.lit(1)).alias("un")
    )
    v = stream.groupBy(F.col("source").alias("lm_source")).agg(
        F.countDistinct("w1").alias("v")
    )
    sources = docs.select(F.col("source").alias("lm_source")).distinct()
    scored = (
        stream.crossJoin(F.broadcast(sources))
        .join(bi, ["lm_source", "w1", "w2"], "left")
        .join(uni, ["lm_source", "w1"], "left")
        .join(F.broadcast(v), "lm_source")
    )
    lp = F.log(
        (F.coalesce(F.col("bn"), F.lit(0)) + alpha)
        / (F.coalesce(F.col("un"), F.lit(0)) + alpha * F.col("v"))
    )
    per_doc = scored.groupBy("doc_id", "source", "lm_source").agg(
        F.round(F.avg(lp), 6).alias("doc_lp")
    )
    return (
        per_doc.groupBy(F.col("source").alias("doc_source"), "lm_source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("doc_lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_source", "lm_source")
    )


def sql_cross_source_perplexity(alpha: float = 0.5) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')"
    return f"""
WITH base AS (
  SELECT doc_id, source, {toks} AS toks FROM documents
  WHERE LENGTH({toks}) >= 2),
stream AS (
  SELECT doc_id, source, toks[i] AS w1, toks[i+1] AS w2
  FROM base, unnest(range(1, LENGTH(toks))) AS u(i)
  WHERE toks[i+1] IS NOT NULL),
bi AS (SELECT source AS lm_source, w1, w2, COUNT(*) AS bn FROM stream GROUP BY 1,2,3),
uni AS (SELECT source AS lm_source, w1, COUNT(*) AS un FROM stream GROUP BY 1,2),
v AS (SELECT source AS lm_source, COUNT(DISTINCT w1) AS v FROM stream GROUP BY 1),
sources AS (SELECT DISTINCT source AS lm_source FROM base),
scored AS (
  SELECT s.doc_id, s.source, src.lm_source,
         LN((COALESCE(bn, 0) + {alpha}) / (COALESCE(un, 0) + {alpha} * v.v)) AS lp
  FROM stream s
  CROSS JOIN sources src
  LEFT JOIN bi ON bi.lm_source = src.lm_source AND bi.w1 = s.w1 AND bi.w2 = s.w2
  LEFT JOIN uni ON uni.lm_source = src.lm_source AND uni.w1 = s.w1
  JOIN v ON v.lm_source = src.lm_source),
per_doc AS (
  SELECT doc_id, source, lm_source, ROUND(AVG(lp), 6) AS doc_lp
  FROM scored GROUP BY 1, 2, 3)
SELECT source AS doc_source, lm_source,
       COUNT(*) AS n_docs,
       ROUND(AVG(doc_lp), 4) AS avg_logprob
FROM per_doc
GROUP BY 1, 2
ORDER BY doc_source, lm_source
"""


# ------------------------------------------- distinctive terms per source

def source_distinctive_terms(
    docs: DataFrame,
    k: int = 10,
    a0: float = 100.0,
    min_df: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k DISTINCTIVE terms per source by the log-odds-ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008) — the
    standard "what words characterize this subcorpus vs the rest" screen,
    robust where raw TF-IDF surfaces rare noise: the corpus-wide prior
    a_w = a0·y_w/n shrinks low-evidence terms toward zero and the
    variance term 1/(y_sw+a_w) + 1/(y_rw+a_w) turns the ratio into a
    z-score.

    Determinism: all counts are exact integers; δ and z are fixed IEEE
    expressions over them. Because ln() can differ by 1 ulp across
    engines, the per-source rank key is the ROUNDED z (6 dp) with the
    term as tiebreak — a 1-ulp wobble can never reorder the top-k.
    Scale: one corpus-sized explode→(source, term) aggregation; the
    term-totals join is a hash join on the term key (no broadcast of the
    vocabulary), per-source totals broadcast; ranking windows are
    partitioned by source."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "source", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("y_sw"))
    tw = st.groupBy("term").agg(F.sum("y_sw").cast("long").alias("y_w"))
    ns = st.groupBy("source").agg(F.sum("y_sw").cast("long").alias("n_s"))
    scal = tw.agg(F.sum("y_w").cast("long").alias("n_tot"))
    cells = (
        st.join(tw.where(F.col("y_w") >= min_df), "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(scal))
    )
    a_w = F.lit(a0) * F.col("y_w").cast("double") / F.col("n_tot").cast("double")
    y_rw = (F.col("y_w") - F.col("y_sw")).cast("double")
    n_r = (F.col("n_tot") - F.col("n_s")).cast("double")
    ysw = F.col("y_sw").cast("double")
    ns_d = F.col("n_s").cast("double")
    delta = F.log(
        (ysw + a_w) / (ns_d + F.lit(a0) - ysw - a_w)
    ) - F.log((y_rw + a_w) / (n_r + F.lit(a0) - y_rw - a_w))
    var = F.lit(1.0) / (ysw + a_w) + F.lit(1.0) / (y_rw + a_w)
    z = F.round(delta / F.sqrt(var), 6)
    scored = cells.select(
        "source", "term", "y_sw", "y_w", z.alias("z_odds")
    )
    w = Window.partitionBy("source").orderBy(F.desc("z_odds"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("source", "rank", "term", "y_sw", "y_w", "z_odds")
        .orderBy("source", "rank")
    )


def sql_source_distinctive_terms(
    k: int = 10, a0: float = 100.0, min_df: int = 5
) -> str:
    return f"""
WITH toks AS (
  SELECT source, UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS term
  FROM documents),
st AS (SELECT source, term, COUNT(*) AS y_sw FROM toks GROUP BY 1, 2),
tw AS (SELECT term, CAST(SUM(y_sw) AS BIGINT) AS y_w FROM st GROUP BY 1),
ns AS (SELECT source, CAST(SUM(y_sw) AS BIGINT) AS n_s FROM st GROUP BY 1),
scal AS (SELECT CAST(SUM(y_w) AS BIGINT) AS n_tot FROM tw),
cells AS (
  SELECT st.source, st.term, st.y_sw, tw.y_w, ns.n_s, scal.n_tot
  FROM st JOIN tw USING (term) JOIN ns USING (source) CROSS JOIN scal
  WHERE tw.y_w >= {min_df}),
scored AS (
  SELECT source, term, y_sw, y_w,
         ROUND((
           LN((CAST(y_sw AS DOUBLE) + {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
              / (CAST(n_s AS DOUBLE) + {a0} - CAST(y_sw AS DOUBLE)
                 - {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE)))
           - LN((CAST(y_w - y_sw AS DOUBLE) + {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
                / (CAST(n_tot - n_s AS DOUBLE) + {a0} - CAST(y_w - y_sw AS DOUBLE)
                   - {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE)))
         ) / SQRT(1.0 / (CAST(y_sw AS DOUBLE) + {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
                  + 1.0 / (CAST(y_w - y_sw AS DOUBLE) + {a0} * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))), 6) AS z_odds
  FROM cells),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY z_odds DESC, term ASC) AS rank
  FROM scored)
SELECT source, rank, term, y_sw, y_w, z_odds
FROM ranked WHERE rank <= {k}
ORDER BY source, rank
"""


# ------------------------------------------- naive Bayes source classifier

def nb_source_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train a multinomial Naive Bayes source classifier on the corpus and
    emit its resubstitution confusion matrix (actual, predicted, n_docs) —
    the declarative stand-in for the fastText-style quality/domain
    classifiers LLM curation pipelines run (CCNet, RefinedWeb): "is this
    corpus separable by source, and which sources are confusable?"
    Training IS the aggregation: token likelihoods with add-1 smoothing,
    log-prior from document counts.

    Algebraic rearrangement keeps the score join sparse:
      score(d, s) = ln(N_s/N) − T_d·ln(n_s + V) + Σ_{t∈d, y_ts>0} c_td·ln(y_ts + 1)
    so only SEEN (term, source) pairs join (the unseen-mass term folds
    into T_d·ln(n_s+V)). The per-(doc, source) correction sum folds over
    the term-sorted list (fixed IEEE order on both engines); argmax
    breaks ties on source name. Scale: one term-keyed hash join between
    the doc-term and source-term count tables (both corpus-sized,
    map-side combined), then doc×S lattice rows via a broadcast of the
    S-row source table."""
    from pyspark.sql.window import Window

    toks = docs.select("doc_id", F.col("source").alias("actual"), F.explode(_tokens(F.col(text_col))).alias("term"))
    dt_counts = toks.groupBy("doc_id", "actual", "term").agg(
        F.count(F.lit(1)).alias("c_td")
    )
    st_counts = toks.groupBy(F.col("actual").alias("s"), "term").agg(
        F.count(F.lit(1)).alias("y_ts")
    )
    vocab = st_counts.select("term").distinct().agg(F.count(F.lit(1)).alias("v_size"))
    src = (
        st_counts.groupBy("s")
        .agg(F.sum("y_ts").cast("long").alias("n_s"))
        .join(
            docs.groupBy(F.col("source").alias("s")).agg(
                F.count(F.lit(1)).alias("docs_s")
            ),
            "s",
        )
    )
    n_docs_tot = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    # seen-pair correction, folded in term order for a fixed IEEE sum
    seen = (
        dt_counts.join(st_counts, "term")
        .groupBy("doc_id", "s")
        .agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("term").alias("t"),
                            (
                                F.col("c_td").cast("double")
                                * F.log(F.col("y_ts").cast("double") + F.lit(1.0))
                            ).alias("contrib"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("seen_sum")
        )
    )
    doc_len = dt_counts.groupBy("doc_id", "actual").agg(
        F.sum("c_td").cast("long").alias("t_d")
    )
    lat = (
        doc_len.crossJoin(F.broadcast(src))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs_tot))
        .join(seen, ["doc_id", "s"], "left")
    )
    score = (
        F.log(F.col("docs_s").cast("double") / F.col("n_docs").cast("double"))
        - F.col("t_d").cast("double")
        * F.log((F.col("n_s") + F.col("v_size")).cast("double"))
        + F.coalesce(F.col("seen_sum"), F.lit(0.0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("s"))
    pred = (
        lat.withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return (
        pred.groupBy(F.col("actual"), F.col("s").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


SQL_NB_SOURCE_CONFUSION = f"""
WITH toks AS (
  SELECT doc_id, source AS actual,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS term
  FROM documents),
dt_counts AS (SELECT doc_id, actual, term, COUNT(*) AS c_td FROM toks GROUP BY 1, 2, 3),
st_counts AS (SELECT actual AS s, term, COUNT(*) AS y_ts FROM toks GROUP BY 1, 2),
vocab AS (SELECT COUNT(DISTINCT term) AS v_size FROM st_counts),
src AS (
  SELECT st.s, CAST(SUM(y_ts) AS BIGINT) AS n_s, d.docs_s
  FROM st_counts st
  JOIN (SELECT source AS s, COUNT(*) AS docs_s FROM documents GROUP BY 1) d USING (s)
  GROUP BY st.s, d.docs_s),
ntot AS (SELECT COUNT(*) AS n_docs FROM documents),
seen AS (
  SELECT dt.doc_id, st.s,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(
               list_sort(list({{'t': dt.term,
                                'contrib': CAST(dt.c_td AS DOUBLE) * LN(CAST(st.y_ts AS DOUBLE) + 1.0)}})),
               x -> x.contrib)),
           (acc, v) -> acc + v) AS seen_sum
  FROM dt_counts dt JOIN st_counts st USING (term)
  GROUP BY 1, 2),
doc_len AS (SELECT doc_id, actual, CAST(SUM(c_td) AS BIGINT) AS t_d FROM dt_counts GROUP BY 1, 2),
lat AS (
  SELECT dl.doc_id, dl.actual, dl.t_d, src.s, src.n_s, src.docs_s,
         vocab.v_size, ntot.n_docs, COALESCE(seen.seen_sum, 0.0) AS seen_sum
  FROM doc_len dl CROSS JOIN src CROSS JOIN vocab CROSS JOIN ntot
  LEFT JOIN seen ON seen.doc_id = dl.doc_id AND seen.s = src.s),
scored AS (
  SELECT doc_id, actual, s,
         LN(CAST(docs_s AS DOUBLE) / CAST(n_docs AS DOUBLE))
           - CAST(t_d AS DOUBLE) * LN(CAST(n_s + v_size AS DOUBLE))
           + seen_sum AS score
  FROM lat),
pred AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, s ASC) AS rk
  FROM scored)
SELECT actual, s AS predicted, COUNT(*) AS n_docs
FROM pred WHERE rk = 1
GROUP BY 1, 2
ORDER BY actual, predicted
"""


# ------------------------------------------- Wilson interval flag rates

def source_flag_rate_ci(
    docs: DataFrame, max_chars: int = 400, z: float = 1.96
) -> DataFrame:
    """Per-source short-document rate with a Wilson score interval —
    the rate screen with honest uncertainty: a 3%-flagged source with 40
    docs and one with 40k docs get very different bounds, and curation
    cuts should key on the UPPER bound, not the point rate.

    Wilson: (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
    Counts are exact; the interval is one fixed IEEE expression —
    bit-identical on any engine. Map-only flag + one catalog-sized
    rollup."""
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars") < max_chars, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_flagged").cast("double") / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(z) * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
    # the exact interval lies in [0, 1]; the float evaluation can stray by
    # ~1e-17 at the p = 0 / p = 1 ends — clamp (identically in the twin)
    return agg.select(
        "source",
        "n_docs",
        "n_flagged",
        p.alias("flag_rate"),
        F.greatest(F.lit(0.0), (center - half) / denom).alias("wilson_lo"),
        F.least(F.lit(1.0), (center + half) / denom).alias("wilson_hi"),
    ).orderBy("source")


def sql_source_flag_rate_ci(max_chars: int = 400, z: float = 1.96) -> str:
    zz = z * z
    return f"""
WITH agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN n_chars < {max_chars} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
  FROM documents GROUP BY 1)
SELECT source, n_docs, n_flagged,
       CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE) AS flag_rate,
       GREATEST(0.0, ((CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE)
          + {zz} / (2.0 * CAST(n_docs AS DOUBLE)))
        - {z} * SQRT(CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE)
                     * (1.0 - CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE))
                     / CAST(n_docs AS DOUBLE)
                     + {zz} / (4.0 * CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))))
       / (1.0 + {zz} / CAST(n_docs AS DOUBLE))) AS wilson_lo,
       LEAST(1.0, ((CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE)
          + {zz} / (2.0 * CAST(n_docs AS DOUBLE)))
        + {z} * SQRT(CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE)
                     * (1.0 - CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE))
                     / CAST(n_docs AS DOUBLE)
                     + {zz} / (4.0 * CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))))
       / (1.0 + {zz} / CAST(n_docs AS DOUBLE))) AS wilson_hi
FROM agg
ORDER BY source
"""


# ------------------------------------------- vocabulary coverage curve

def vocab_coverage_curve(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Cumulative token-coverage curve of the top-k vocabulary: rank,
    term, freq, and the fraction of ALL token occurrences covered by
    ranks 1..r — how head-heavy the corpus is (the practical question
    behind stopword lists and vocab-size choices: "how few words cover
    90%?").

    The global rank AND the running frequency sum come from ONE
    :func:`magiceye_spark.io.two_phase_window` pass (range-partition +
    broadcast prefix offsets — no single-task sort); counts are exact
    integers so the running sum is order-free, and cum_frac is one
    double division. The total is a broadcast scalar."""
    from magiceye_spark.io import two_phase_window

    freqs = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    tot = freqs.agg(F.sum("freq").cast("long").alias("n_tokens"))
    ranked = two_phase_window(
        freqs,
        [F.desc("freq"), F.asc("term")],
        rank_col="rank",
        cumsum={"cum_freq": "freq"},
    )
    return (
        ranked.where(F.col("rank") <= k)
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "term",
            "freq",
            F.col("cum_freq").cast("long").alias("cum_freq"),
            (
                F.col("cum_freq").cast("double") / F.col("n_tokens").cast("double")
            ).alias("cum_frac"),
        )
        .orderBy("rank")
    )


def sql_vocab_coverage_curve(k: int = 100) -> str:
    return f"""
WITH freqs AS (
  SELECT UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS term
  FROM documents),
f AS (SELECT term, COUNT(*) AS freq FROM freqs GROUP BY 1),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_tokens FROM f),
r AS (
  SELECT term, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank,
         CAST(SUM(freq) OVER (ORDER BY freq DESC, term ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq
  FROM f)
SELECT rank, term, freq, cum_freq,
       CAST(cum_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS cum_frac
FROM r CROSS JOIN tot
WHERE rank <= {k}
ORDER BY rank
"""


# ------------------------------------------- cross-validated NB accuracy

def nb_crossval_accuracy(
    docs: DataFrame, salt: str = "nbcv-v1", text_col: str = "text"
) -> DataFrame:
    """2-fold cross-validated accuracy of the Naive Bayes source
    classifier — the honest generalization number next to
    :func:`nb_source_confusion`'s resubstitution matrix (train on fold
    ¬f via the deterministic md5 coin, score fold f). One row per fold:
    (fold, n_eval, n_correct, accuracy).

    The fold assignment is the repo's engine-exact md5 coin (same as
    hash_split), so train/eval membership is identical on any engine and
    stable at any scale; per-fold smoothing constants (vocabulary size,
    per-source mass, priors) are recomputed from the TRAINING side only,
    exactly as a leakage-safe eval requires. Same sparse seen-pair
    rearrangement and term-sorted folds as the resubstitution query."""
    from pyspark.sql.window import Window

    coin = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    )
    d = docs.withColumn("fold", coin)
    out = None
    for f in (0, 1):
        train = d.where(F.col("fold") != f)
        evald = d.where(F.col("fold") == f)
        toks_tr = train.select(
            F.col("source").alias("s"), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        st = toks_tr.groupBy("s", "term").agg(F.count(F.lit(1)).alias("y_ts"))
        vocab = st.select("term").distinct().agg(F.count(F.lit(1)).alias("v_size"))
        src = st.groupBy("s").agg(F.sum("y_ts").cast("long").alias("n_s")).join(
            train.groupBy(F.col("source").alias("s")).agg(
                F.count(F.lit(1)).alias("docs_s")
            ),
            "s",
        )
        ntot = train.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
        toks_ev = evald.select(
            "doc_id",
            F.col("source").alias("actual"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        # explicit user-count barrier: AQE byte-coalesces the (doc, term)
        # groupBy reads to ONE partition at bench byte sizes, serializing
        # the CPU-dense sort_array/collect_list scoring downstream (r12
        # stage audit: 8 × ~3.5 s single-task stages). User-specified
        # repartition counts are exempt from AQE coalescing; at lake
        # scale the shuffle exceeds the advisory size and this barrier
        # costs nothing new (dt already shuffles on these keys).
        dt = toks_ev.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        ).groupBy("doc_id", "actual", "term").agg(
            F.count(F.lit(1)).alias("c_td")
        )
        seen = (
            dt.join(st, "term")
            .repartition(
                docs.sparkSession.sparkContext.defaultParallelism,
                "doc_id",
                "s",
            )
            .groupBy("doc_id", "s")
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("term").alias("t"),
                                (
                                    F.col("c_td").cast("double")
                                    * F.log(F.col("y_ts").cast("double") + F.lit(1.0))
                                ).alias("contrib"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("seen_sum")
            )
        )
        doc_len = dt.groupBy("doc_id", "actual").agg(
            F.sum("c_td").cast("long").alias("t_d")
        )
        lat = (
            doc_len.crossJoin(F.broadcast(src))
            .crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(ntot))
            .join(seen, ["doc_id", "s"], "left")
        )
        score = (
            F.log(F.col("docs_s").cast("double") / F.col("n_docs").cast("double"))
            - F.col("t_d").cast("double")
            * F.log((F.col("n_s") + F.col("v_size")).cast("double"))
            + F.coalesce(F.col("seen_sum"), F.lit(0.0))
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("s"))
        pred = (
            lat.withColumn("score", score)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
        )
        res = pred.agg(
            F.lit(f).alias("fold"),
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(F.when(F.col("actual") == F.col("s"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
            (
                F.sum(F.when(F.col("actual") == F.col("s"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("accuracy"),
        )
        out = res if out is None else out.unionByName(res)
    return out.orderBy("fold")


def sql_nb_crossval_accuracy(salt: str = "nbcv-v1") -> str:
    def fold_block(f: int) -> str:
        return f"""
SELECT {f} AS fold, COUNT(*) AS n_eval,
       CAST(SUM(CASE WHEN actual = s THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN actual = s THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, s ASC) AS rk
  FROM (
    SELECT dl.doc_id, dl.actual, src.s,
           LN(CAST(src.docs_s AS DOUBLE) / CAST(ntot.n_docs AS DOUBLE))
             - CAST(dl.t_d AS DOUBLE) * LN(CAST(src.n_s + vocab.v_size AS DOUBLE))
             + COALESCE(seen.seen_sum, 0.0) AS score
    FROM (SELECT doc_id, actual, CAST(SUM(c_td) AS BIGINT) AS t_d
          FROM dt_{f} GROUP BY 1, 2) dl
    CROSS JOIN (SELECT st.s, CAST(SUM(st.y_ts) AS BIGINT) AS n_s, tr.docs_s
                FROM st_{f} st
                JOIN (SELECT source AS s, COUNT(*) AS docs_s FROM folded
                      WHERE fold <> {f} GROUP BY 1) tr USING (s)
                GROUP BY st.s, tr.docs_s) src
    CROSS JOIN (SELECT COUNT(DISTINCT term) AS v_size FROM st_{f}) vocab
    CROSS JOIN (SELECT COUNT(*) AS n_docs FROM folded WHERE fold <> {f}) ntot
    LEFT JOIN (
      SELECT dt.doc_id, st.s,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(
                   list_sort(list({{'t': dt.term,
                                    'contrib': CAST(dt.c_td AS DOUBLE)
                                               * LN(CAST(st.y_ts AS DOUBLE) + 1.0)}})),
                   x -> x.contrib)),
               (acc, v) -> acc + v) AS seen_sum
      FROM dt_{f} dt JOIN st_{f} st USING (term)
      GROUP BY 1, 2) seen
      ON seen.doc_id = dl.doc_id AND seen.s = src.s
  )
) WHERE rk = 1
"""

    return f"""
WITH folded AS (
  SELECT *, CAST(CONCAT('0x', SUBSTR(md5(CONCAT('{salt}', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2 AS fold
  FROM documents),
toks AS (
  SELECT doc_id, source, fold,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '{_WS}')) AS term
  FROM folded),
st_0 AS (SELECT source AS s, term, COUNT(*) AS y_ts FROM toks WHERE fold <> 0 GROUP BY 1, 2),
st_1 AS (SELECT source AS s, term, COUNT(*) AS y_ts FROM toks WHERE fold <> 1 GROUP BY 1, 2),
dt_0 AS (SELECT doc_id, source AS actual, term, COUNT(*) AS c_td FROM toks WHERE fold = 0 GROUP BY 1, 2, 3),
dt_1 AS (SELECT doc_id, source AS actual, term, COUNT(*) AS c_td FROM toks WHERE fold = 1 GROUP BY 1, 2, 3)
{fold_block(0)}
UNION ALL
{fold_block(1)}
ORDER BY fold
"""


def language_id_confusion(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Label-QA screen: confusion matrix between the DECLARED ``lang``
    column and the n-gram/stopword prediction of :func:`language_id` —
    off-diagonal mass is either mislabeled metadata or classifier bias,
    and both need eyes before lang-filtered training cuts. One map-side
    prediction + one catalog-sized rollup."""
    pred = language_id(docs, text_col)
    return (
        docs.select("doc_id", F.col("lang").alias("declared_lang"))
        .join(pred, "doc_id")
        .groupBy("declared_lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("declared_lang", "lang_pred")
    )


def sql_language_id_confusion() -> str:
    return f"""
WITH pred AS ({sql_language_id()})
SELECT d.lang AS declared_lang, p.lang_pred, COUNT(*) AS n_docs
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def quality_score_calibration(
    docs: DataFrame, max_chars: int = 400, n_bins: int = 10
) -> DataFrame:
    """Calibration table for the composite quality score: rank-decile the
    corpus by score and report each decile's short-document rate — does
    the score actually order quality? (A filter cut at score s is only
    defensible if the rate curve is monotone through s.) One row per
    decile: (decile, n_docs, mean_score, short_rate).

    The global rank comes from the two-phase window (no single-task
    sort); deciles are exact integer arithmetic on the rank; the score
    sum stays a 4-dp decimal so the mean is one engine-identical
    division."""
    from magiceye_spark.io import two_phase_window

    qs = quality_score(docs).join(docs.select("doc_id", "n_chars"), "doc_id")
    ranked = two_phase_window(
        qs, [F.asc("quality_score"), F.asc("doc_id")], rank_col="rnk"
    )
    tot = ranked.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    binned = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "decile",
        (
            F.floor(
                (F.col("rnk") - 1).cast("double")
                * n_bins
                / F.col("n_total").cast("double")
            )
            + 1
        ).cast("int"),
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("quality_score").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_score"),
            (
                F.sum(F.when(F.col("n_chars") < max_chars, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("short_rate"),
        )
        .orderBy("decile")
    )


def sql_quality_score_calibration(max_chars: int = 400, n_bins: int = 10) -> str:
    return f"""
WITH q AS ({SQL_QUALITY}),
j AS (SELECT q.doc_id, q.quality_score, d.n_chars
      FROM q JOIN documents d ON d.doc_id = q.doc_id),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY quality_score ASC, doc_id ASC) AS rnk,
             COUNT(*) OVER () AS n_total
      FROM j),
b AS (SELECT *, CAST(FLOOR(CAST(rnk - 1 AS DOUBLE) * {n_bins} / CAST(n_total AS DOUBLE)) + 1 AS INTEGER) AS decile
      FROM r)
SELECT decile, COUNT(*) AS n_docs,
       CAST(SUM(CAST(quality_score AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_score,
       CAST(SUM(CASE WHEN n_chars < {max_chars} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS short_rate
FROM b
GROUP BY decile
ORDER BY decile
"""
