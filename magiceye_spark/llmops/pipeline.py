"""The composed corpus-curation pipeline: quality filter → exact dedup →
near dedup — the standard pretraining-data funnel, chained from the
individual operators so each stage stays independently testable.

Everything is lazy DataFrame composition: Catalyst sees the WHOLE funnel as
one plan, so column pruning flows through all stages (e.g. the final count
never materializes text payloads) and stages share scans where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.llmops import dedup, textstats


def filter_quality(docs: DataFrame, min_score: float = 0.5) -> DataFrame:
    """Drop documents below the composite quality score (C4/Gopher-style
    cheap pre-filter)."""
    scores = textstats.quality_score(docs).where(F.col("quality_score") >= min_score)
    return docs.join(scores.select("doc_id"), "doc_id", "left_semi")


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    minhash_threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """quality filter → exact dedup → near dedup; returns the kept corpus."""
    q = filter_quality(docs, min_quality)
    e = dedup.dedup_exact(q)
    pairs = dedup.minhash_lsh_pairs(
        e, num_hashes=32, bands=8, threshold=minhash_threshold, shingle_n=shingle_n
    )
    return dedup.dedup_near(e, pairs)


def chunk_dedup_stats(docs: DataFrame, chunk_chars: int = 512, overlap: int = 64) -> DataFrame:
    """Duplication measured at the TRAINING-WINDOW level: chunk the corpus,
    hash each window, count repeats — near-dup documents that exact
    doc-level dedup misses still surface as repeated windows here. One row:
    (n_chunks, n_uniq_chunks, dup_rate)."""
    from magiceye_spark.llmops.textstats import chunk_documents

    chunks = chunk_documents(docs, chunk_chars=chunk_chars, overlap=overlap)
    h = F.md5(F.col("chunk_text"))
    return chunks.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("h").alias("n_uniq_chunks"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("h")) / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )


def sql_chunk_dedup_stats(chunk_chars: int = 512, overlap: int = 64) -> str:
    from magiceye_spark.llmops.textstats import sql_chunk_documents

    return f"""
SELECT COUNT(*) AS n_chunks,
       COUNT(DISTINCT md5(chunk_text)) AS n_uniq_chunks,
       ROUND((COUNT(*) - COUNT(DISTINCT md5(chunk_text))) / CAST(COUNT(*) AS DOUBLE), 4) AS dup_rate
FROM ({sql_chunk_documents(chunk_chars, overlap)})
"""


def corpus_composition(docs: DataFrame) -> DataFrame:
    """Corpus composition by (source, lang): docs, characters, exact-dup
    rate — the first report run on any new data drop. One aggregation
    shuffle; dup rate from canonical-hash distinct counts."""
    canon = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    )
    return (
        docs.select("source", "lang", "n_chars", canon.alias("c"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct("c").alias("n_uniq"),
            F.round(
                (F.count(F.lit(1)) - F.countDistinct("c")) / F.count(F.lit(1)), 4
            ).alias("dup_rate"),
        )
        .orderBy("source", "lang")
    )


SQL_CORPUS_COMPOSITION = r"""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       COUNT(DISTINCT md5(regexp_replace(TRIM(LOWER(text)), '\s+', ' ', 'g'))) AS n_uniq,
       ROUND((COUNT(*) - COUNT(DISTINCT md5(regexp_replace(TRIM(LOWER(text)), '\s+', ' ', 'g'))))
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_rate
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    key: str = "lang",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) — the corpus-rebalance
    op (e.g. downsample over-represented languages). Seeded → reproducible
    for a fixed input partitioning; for split-stability under re-layout use
    :func:`hash_split`-style bucket filters instead."""
    return docs.sampleBy(key, fractions, seed)


def stratified_quota_sample(
    docs: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """EXACT per-stratum sample counts: rank each stratum by a salted,
    content-independent md5 of the id and keep the first ``quotas[s]`` rows
    — (id, stratum) output. The exact-count complement to the probabilistic
    :func:`resample_to_mix` (hash-Bernoulli hits quotas only in
    expectation; dataset cards usually promise exact counts).

    Deterministic across runs, engines, and cluster layouts: the winners
    are a pure function of (salt, id), and because ranking follows the hash
    order, growing a stratum only displaces rows at the rank boundary —
    re-sampling after ingest keeps almost all previous picks. Strata absent
    from ``quotas`` are dropped. One hash-partition shuffle on the strata
    column; each stratum ranks within its own task, so this is the right
    tool when quotas × strata are warehouse-sane (per-language/per-source
    curation). For a single colossal stratum prefer :func:`resample_to_mix`
    (map-only) — the same tradeoff the docstring there documents in
    reverse. md5 (not xxhash64) so the DuckDB oracle computes the identical
    ranking."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    quota = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(strata_col)]
    return (
        docs.select(id_col, strata_col)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.coalesce(quota, F.lit(0)))
        .select(id_col, strata_col)
    )


def sql_stratified_quota_sample(
    quotas: dict[str, int], salt: str = "quota-v1"
) -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in quotas.items())
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, ROW_NUMBER() OVER (
    PARTITION BY source
    ORDER BY md5('{salt}' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
WHERE rk <= CASE source {cases} ELSE 0 END
"""


def hash_split(
    docs: DataFrame,
    train_pct: int = 90,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/eval assignment by content-independent id hash:
    md5(salt ∥ id) mod 100 < train_pct → 'train' else 'eval'.

    Hash-based (not random) splitting is what a 100 TB pipeline needs:
    reproducible across runs/engines/cluster layouts, stable under
    re-partitioning, and new data lands in the same split forever. The salt
    versions the split. md5 (not xxhash64) so the DuckDB oracle computes
    the identical assignment."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return docs.select(
        id_col,
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval")).alias("split"),
    )


def sql_hash_split(train_pct: int = 90, salt: str = "split-v1") -> str:
    return f"""
SELECT doc_id,
       CASE WHEN CAST(CONCAT('0x', substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < {train_pct}
            THEN 'train' ELSE 'eval' END AS split
FROM documents
"""


def leakage_pairs(pairs: DataFrame, splits: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Join any near-dup pair table (doc_a, doc_b, …) against a split
    assignment (id, split) and keep pairs that STRADDLE the boundary —
    an eval document with a training near-twin is benchmark leakage the
    decontamination n-gram check can miss (paraphrase-level overlap).

    Pair-generator-agnostic: feed :func:`magiceye_spark.llmops.dedup.
    minhash_lsh_pairs` (the 100 TB path) or the exact Jaccard twin.
    Two doc_id equi-joins on a pair table that LSH already shrank —
    no new shuffle beyond the pair generator's own."""
    sa = splits.select(F.col(id_col).alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col(id_col).alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


def split_leakage_audit(
    docs: DataFrame,
    train_pct: int = 90,
    threshold: float = 0.8,
    salt: str = "split-v1",
) -> DataFrame:
    """End-to-end split-leakage audit over the documents corpus: exact
    Jaccard near-dup pairs (the oracle-checkable small-scale twin —
    swap in minhash_lsh_pairs at corpus scale) × the deterministic
    hash split, keeping cross-boundary pairs."""
    from magiceye_spark.llmops import dedup

    pairs = dedup.jaccard_near_dups(docs, threshold=threshold)
    splits = hash_split(docs, train_pct=train_pct, salt=salt)
    return leakage_pairs(pairs, splits)


def sql_split_leakage(
    train_pct: int = 90, threshold: float = 0.8, salt: str = "split-v1", length_tol: int = 60
) -> str:
    return f"""
WITH toksets AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS toks
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(LENGTH(list_intersect(a.toks, b.toks))
               / CAST(LENGTH(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 4) AS jaccard
  FROM toksets a JOIN toksets b
    ON a.lang = b.lang AND a.doc_id < b.doc_id AND ABS(a.n_chars - b.n_chars) <= {length_tol}
  WHERE LENGTH(list_intersect(a.toks, b.toks))
        / CAST(LENGTH(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= {threshold}
),
splits AS (
  SELECT doc_id,
         CASE WHEN CAST(CONCAT('0x', substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < {train_pct}
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
)
SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
FROM pairs p
JOIN splits sa ON p.doc_a = sa.doc_id
JOIN splits sb ON p.doc_b = sb.doc_id
WHERE sa.split <> sb.split
"""


def curation_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of funnel counts: input → after quality → after exact dedup
    → after near dedup. The per-stage counts are what a pipeline operator
    reports to its scheduler."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = filter_quality(docs)
    e = dedup.dedup_exact(q)
    pairs = dedup.minhash_lsh_pairs(e, num_hashes=32, bands=8, threshold=0.7, shingle_n=3)
    kept = dedup.dedup_near(e, pairs)
    row = [(docs.count(), q.count(), e.count(), kept.count())]
    return spark.createDataFrame(
        row, "n_input long, n_after_quality long, n_after_exact long, n_after_near long"
    )


# --------------------------------------------------- eval decontamination

def _doc_ngram_hashes(docs: DataFrame, ngram_n: int, text_col: str) -> DataFrame:
    """(doc_id, sh): md5 of each DISTINCT word n-gram per document. md5 (not
    xxhash64) so the DuckDB oracle computes the identical key; per-doc
    distinct happens BEFORE the join so a phrase repeated inside one doc
    contributes one row."""
    toks = textstats._tokens(F.col(text_col))  # noqa: SLF001
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram_n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, ngram_n))))
    # explicit spread: one md5 per gram is CPU-dense on byte-light input
    # (PLANS.md "CPU-dense stages vs byte-based sizing"); plain explode
    # is safe under the session-level InferFiltersFromGenerate exclusion
    return docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))


def decontamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    ngram_n: int = 8,
    text_col: str = "text",
    max_ngram_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C shape): flag every
    (train doc, eval doc) pair sharing at least one word ``ngram_n``-gram.
    Returns (doc_id, eval_doc_id, n_shared_ngrams).

    Plan: per-side distinct n-gram hashes, one equi-join on the hash, one
    pair aggregation. At 100 TB the join key is md5-uniform; hot boilerplate
    n-grams are the skew risk — AQE skew-join splits them, but a gram shared
    by d documents per side still emits d² pair rows, so for short grams /
    boilerplate-heavy corpora pass ``max_ngram_df``: grams whose corpus-wide
    document frequency (train ∪ eval) exceeds it are dropped BEFORE the join
    (the standard stopgram cut). The hot set is small by construction
    (a df cap admits at most |corpus|/cap grams above it), so the cut is a
    broadcast anti-join — map-side, no extra shuffle on the gram stream
    beyond the one df aggregation."""
    t = _doc_ngram_hashes(train, ngram_n, text_col)
    e = _doc_ngram_hashes(eval_docs, ngram_n, text_col).select(
        F.col("doc_id").alias("eval_doc_id"), "sh"
    )
    if max_ngram_df is not None:
        hot = (
            t.select("sh").unionAll(e.select("sh"))
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_ngram_df)
            .select("sh")
        )
        t = t.join(F.broadcast(hot), "sh", "left_anti")
        e = e.join(F.broadcast(hot), "sh", "left_anti")
    return (
        t.join(e, "sh")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    ngram_n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Drop every training document that shares an ``ngram_n``-gram with the
    eval set (left anti join on the overlap pairs)."""
    contaminated = decontamination_overlap(train, eval_docs, ngram_n, text_col)
    return train.join(
        contaminated.select("doc_id").distinct(), "doc_id", "left_anti"
    )


def sql_decontamination_overlap(
    ngram_n: int = 8, eval_mod: int = 50, max_ngram_df: int | None = None
) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{textstats._WS}')"  # noqa: SLF001
    sh = (
        f"list_transform(range(1, GREATEST(LENGTH(t) - {ngram_n} + 1, 1) + 1), "
        f"i -> md5(array_to_string(t[i:i+{ngram_n - 1}], ' ')))"
    )
    stop = (
        f"AND a.sh NOT IN (SELECT sh FROM hot) AND b.sh NOT IN (SELECT sh FROM hot)"
        if max_ngram_df is not None
        else ""
    )
    hot_cte = (
        f", hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > {max_ngram_df})"
        if max_ngram_df is not None
        else ""
    )
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, UNNEST({sh}) AS sh FROM toks
  )
){hot_cte}
SELECT a.doc_id, b.doc_id AS eval_doc_id, COUNT(*) AS n_shared_ngrams
FROM sh a JOIN sh b ON a.sh = b.sh
WHERE a.doc_id % {eval_mod} <> 0 AND b.doc_id % {eval_mod} = 0 {stop}
GROUP BY 1, 2
"""


# ------------------------------------------------- packing & source mixing

def sequence_packing(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    documents are concatenated in deterministic order and cut every
    ``budget`` tokens; each document is assigned the training sequence its
    FIRST token lands in. Returns (doc_id, shard, seq_id, tok_offset,
    n_tokens, spans_boundary) — spans_boundary marks documents a chunk cut
    crosses (the ones attention masking has to care about).

    Scale shape: a GLOBAL running token sum would serialize on one
    partition, so packing is per-shard (shard = crc32(doc_id) % n_shards,
    the same sharding a real pipeline uses for its output files) and the
    prefix sum is a window over each shard — n_shards-way parallel, one
    shuffle. Sequence ids are (shard, seq_id) pairs, globally unique.
    Shard hash is md5-derived (same recipe as :func:`hash_split`) so the
    DuckDB oracle computes the identical assignment."""
    toks = textstats._tokens(F.col(text_col))  # noqa: SLF001
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    base = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(toks).alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("cum_before")
    return (
        base.select("doc_id", "shard", "n_tokens", start)
        .select(
            "doc_id",
            "shard",
            F.floor(F.col("cum_before") / budget).cast("long").alias("seq_id"),
            (F.col("cum_before") % budget).alias("tok_offset"),
            "n_tokens",
            (
                (F.col("cum_before") % budget) + F.col("n_tokens") > budget
            ).alias("spans_boundary"),
        )
        .orderBy("shard", "seq_id", "doc_id")
    )


def sql_sequence_packing(budget: int = 512, n_shards: int = 32) -> str:
    toks = f"regexp_split_to_array(TRIM(LOWER(text)), '{textstats._WS}')"  # noqa: SLF001
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {n_shards} AS shard,
         LENGTH({toks}) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM base
)
SELECT doc_id, shard, CAST(FLOOR(cum_before / {budget}) AS BIGINT) AS seq_id,
       CAST(cum_before % {budget} AS BIGINT) AS tok_offset, n_tokens,
       cum_before % {budget} + n_tokens > {budget} AS spans_boundary
FROM cum
ORDER BY shard, seq_id, doc_id
"""


def source_mixing_weights(
    docs: DataFrame, target_shares: dict[str, float]
) -> DataFrame:
    """Per-source sampling weights to reshape the corpus toward a target
    mixture: (source, n_docs, natural_share, target_share, weight) with
    weight = target/natural — multiply into per-document sampling
    probabilities (or epoch counts) to hit the prescribed mix. Sources
    absent from ``target_shares`` get target 0 (dropped from training).
    One aggregation on a low-cardinality key; the weight table is
    dimension-sized and meant to be broadcast back onto documents. The
    corpus total is a scalar aggregate crossJoined back broadcast (not a
    SUM() OVER () — keeps registered plans free of single-partition
    windows)."""
    tgt = F.create_map(
        *[F.lit(x) for kv in target_shares.items() for x in kv]
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    counts.persist()  # source-grain: the total pass must not re-scan docs
    counts = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("n_docs").alias("_total")))
    )
    natural = (F.col("n_docs") / F.col("_total")).alias("natural_share")
    return (
        counts.select(
            "source",
            "n_docs",
            F.round(natural, 6).alias("natural_share"),
            F.coalesce(tgt[F.col("source")], F.lit(0.0)).alias("target_share"),
        )
        .withColumn(
            "weight",
            F.round(F.col("target_share") / F.col("natural_share"), 6),
        )
        .orderBy("source")
    )


def sql_source_mixing_weights(target_shares: dict[str, float]) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {v}" for s, v in target_shares.items()
    )
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT source, n_docs,
       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS natural_share,
       CAST(CASE source {cases} ELSE 0.0 END AS DOUBLE) AS target_share,
       ROUND(CAST(CASE source {cases} ELSE 0.0 END AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()), 6) AS weight
FROM counts
ORDER BY source
"""


def resample_to_mix(
    docs: DataFrame,
    target_shares: dict[str, float],
    salt: str = "mix-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted subsample that reshapes the corpus toward a
    target source mixture: keep a document iff its content-independent hash
    coin ``md5(salt ∥ id) / 2^32`` falls below the source's sampling rate
    ``min(weight, 1) = min(target/natural, 1)``.

    Hash-thresholding (not RNG sampling) for the same reason as
    :func:`hash_split`: the kept set is reproducible across runs, engines,
    and cluster layouts, and re-running after appending data never flips
    previously-kept documents. Up-weighted sources (weight > 1) are kept
    whole — epoch repetition is the trainer's job, not the corpus writer's.

    Plan: the weight table is source-count-sized and broadcasts onto the
    corpus; the keep decision is map-side. One aggregation + one broadcast
    join at any corpus size."""
    # unrounded rate (source_mixing_weights rounds for display; a rounded
    # rate could flip borderline coins vs an engine computing it exactly)
    tgt = F.create_map(*[F.lit(x) for kv in target_shares.items() for x in kv])
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    counts.persist()  # source-grain: the total pass must not re-scan docs
    counts = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("n_docs").alias("_total")))
    )
    natural = F.col("n_docs") / F.col("_total")
    weights = counts.select(
        "source",
        F.least(
            F.coalesce(tgt[F.col("source")], F.lit(0.0)) / natural, F.lit(1.0)
        ).alias("rate"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    return (
        docs.join(F.broadcast(weights), "source")
        .where(coin < F.col("rate"))
        .select(*docs.columns)
    )


def sql_resample_to_mix(target_shares: dict[str, float], salt: str = "mix-v1") -> str:
    tgt = " ".join(
        f"WHEN '{s}' THEN {p!r}" for s, p in sorted(target_shares.items())
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
weights AS (
  SELECT source,
         LEAST((CASE source {tgt} ELSE 0.0 END)
               / (n_docs / CAST((SELECT SUM(n_docs) FROM counts) AS DOUBLE)),
               1.0) AS rate
  FROM counts)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d JOIN weights w USING (source)
WHERE CAST(CONCAT('0x', substr(md5('{salt}' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / CAST(4294967296 AS DOUBLE) < w.rate
"""


def hash_split_multi(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """N-way deterministic split by the same content-independent md5
    bucket as :func:`hash_split`: fractions like {'train': .9, 'val': .05,
    'test': .05} map to contiguous bucket ranges of [0, 100). Same
    100 TB properties — reproducible across engines/layouts, new data
    lands in its split forever, salt versions the split. Fractions must
    sum to 1 (±1e-9); ranges are cut at integer percent boundaries via
    cumulative rounding so every bucket belongs to exactly one split."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cuts: list[tuple[str, int]] = []  # (name, exclusive upper bucket)
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cuts.append((name, round(acc * 100)))
    if cuts[-1][1] != 100:
        raise ValueError(f"fraction resolution is 1%: cumulative cuts {cuts}")
    uppers = [hi for _, hi in cuts]
    if uppers != sorted(set(uppers)) or uppers[0] <= 0:
        raise ValueError(
            f"a fraction rounded to an empty 1% range — cumulative cuts {cuts}"
        )
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100
    )
    expr = None
    for name, hi in reversed(cuts):
        expr = F.when(bucket < hi, F.lit(name)) if expr is None else F.when(
            bucket < hi, F.lit(name)
        ).otherwise(expr)
    # reversed+otherwise chain: the first (smallest hi) wins for low buckets
    return docs.select(id_col, expr.alias("split"))


def sql_hash_split_multi(fractions: dict[str, float], salt: str = "split-v1") -> str:
    cuts, acc = [], 0.0
    for name, frac in fractions.items():
        acc += frac
        cuts.append((name, round(acc * 100)))
    whens = " ".join(
        f"WHEN b < {hi} THEN '{name}'" for name, hi in cuts
    )
    return f"""
SELECT doc_id, CASE {whens} END AS split FROM (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
  FROM documents)
"""


# ------------------------------------------------ contrastive negatives

def negative_samples(
    rows: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    k_neg: int = 4,
    step: int = 7919,
) -> DataFrame:
    """Deterministic hash-ring negative sampling for contrastive/triplet
    dataset construction: each anchor draws ``k_neg`` pseudo-random
    partners at ring offsets j·``step`` (mod N) on the corpus's global-ID
    ring, then pairs whose labels collide are dropped (they would be
    false negatives). Deterministic across runs, engines, and layouts —
    the property `sampleBy`-style randomness can't give a training-data
    lineage audit.

    Plan: global IDs via the two-phase range-partition rank
    (:func:`magiceye_spark.io.assign_global_ids` — no single-task sort),
    the scalar N broadcast, a k_neg-wide map-side explode, and ONE
    self-join on the ring id. Output: (anchor_id, negative_id, j) sorted.
    ``step`` must not share factors with N in a degenerate way; offsets
    ``(gid + j·step) % N`` never hit the anchor itself for j·step % N ≠ 0
    — j = 0 is not emitted.
    """
    from magiceye_spark.io import assign_global_ids

    ids = assign_global_ids(
        rows.select(id_col, label_col), [id_col], id_col="gid"
    )
    n = ids.agg(F.count(F.lit(1)).alias("n"))
    fanned = (
        ids.crossJoin(F.broadcast(n))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(k_neg)),
                    lambda j: F.struct(
                        j.alias("j"),
                        ((F.col("gid") + j * step) % F.col("n")).alias("ngid"),
                    ),
                )
            ).alias("e"),
        )
        .select("anchor_id", "anchor_label", F.col("e.j").cast("long").alias("j"), F.col("e.ngid").alias("ngid"))
    )
    cand = ids.select(
        F.col("gid").alias("ngid"),
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("neg_label"),
    )
    return (
        fanned.join(cand, "ngid")
        .where(
            (F.col("anchor_label") != F.col("neg_label"))
            & (F.col("anchor_id") != F.col("negative_id"))
        )
        .select("anchor_id", "negative_id", "j")
        .orderBy("anchor_id", "j")
    )


def sql_negative_samples(k_neg: int = 4, step: int = 7919) -> str:
    return f"""
WITH ids AS (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS gid
  FROM embeddings),
n AS (SELECT COUNT(*) AS n FROM ids),
fanned AS (
  SELECT i.vec_id AS anchor_id, i.label AS anchor_label,
         t.j, (i.gid + t.j * {step}) % n.n AS ngid
  FROM ids i CROSS JOIN n
       CROSS JOIN (SELECT UNNEST(range(1, {k_neg} + 1)) AS j) t)
SELECT f.anchor_id, c.vec_id AS negative_id, CAST(f.j AS BIGINT) AS j
FROM fanned f JOIN ids c ON f.ngid = c.gid
WHERE f.anchor_label <> c.label AND f.anchor_id <> c.vec_id
ORDER BY anchor_id, j
"""


def token_budget_plan(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    text_col: str = "text",
) -> DataFrame:
    """Training-token accounting: given per-source mixing weights and a
    total token budget, how many tokens each source contributes and how
    many EPOCHS over its natural supply that implies (>1 = repetition,
    the overfitting red flag the LLaMA-style mixture tables track).
    Sources without a weight get 0. One corpus aggregation; the plan
    arithmetic runs on the catalog-sized rollup."""
    toks = F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    natural = docs.groupBy("source").agg(
        F.sum(toks).cast("long").alias("natural_tokens")
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    return (
        natural.withColumn(
            "weight", F.coalesce(wmap[F.col("source")], F.lit(0.0))
        )
        .select(
            "source",
            "natural_tokens",
            F.round("weight", 4).alias("weight"),
            F.round(F.col("weight") * budget_tokens, 0)
            .cast("long")
            .alias("budget_tokens"),
            F.round(
                (F.col("weight") * budget_tokens) / F.col("natural_tokens"), 4
            ).alias("epochs"),
        )
        .orderBy("source")
    )


def sql_token_budget_plan(weights: dict[str, float], budget_tokens: int) -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(weights.items())
    )
    return f"""
WITH nat AS (
  SELECT source,
         CAST(SUM(LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'))) AS BIGINT) AS natural_tokens
  FROM documents GROUP BY source),
w AS (
  SELECT *, CASE {cases} ELSE 0.0 END AS weight_raw FROM nat)
SELECT source, natural_tokens,
       CAST(ROUND(weight_raw, 4) AS DOUBLE) AS weight,
       CAST(ROUND(weight_raw * {budget_tokens}, 0) AS BIGINT) AS budget_tokens,
       ROUND(weight_raw * {budget_tokens} / CAST(natural_tokens AS DOUBLE), 4) AS epochs
FROM w
ORDER BY source
"""


def corpus_version_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Corpus versioning report: per source, how many docs were ADDED,
    REMOVED, CHANGED (same doc_id, different canonical text), or
    UNCHANGED between two corpus versions — the datadiff shape on the
    documents table, the first audit after every ingest/cleaning run.
    One full-outer join on doc_id comparing canonical md5s."""
    canon = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    o = old.select(
        "doc_id", F.col("source").alias("src_o"), canon.alias("h_o")
    )
    n = new.select(
        "doc_id", F.col("source").alias("src_n"), canon.alias("h_n")
    )
    joined = o.join(n, "doc_id", "full_outer").select(
        F.coalesce("src_n", "src_o").alias("source"),
        F.when(F.col("h_o").isNull(), "added")
        .when(F.col("h_n").isNull(), "removed")
        .when(F.col("h_o") != F.col("h_n"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        joined.groupBy("source")
        .pivot("status", ["added", "removed", "changed", "unchanged"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "source",
            F.col("added").cast("long").alias("n_added"),
            F.col("removed").cast("long").alias("n_removed"),
            F.col("changed").cast("long").alias("n_changed"),
            F.col("unchanged").cast("long").alias("n_unchanged"),
        )
        .orderBy("source")
    )


#: derived old/new corpus versions for the registered twin: old drops every
#: 7th doc, new drops every 5th and appends a token to every 3rd — the
#: identical derivation runs in the oracle CTEs.
def _corpus_versions(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" changed"))
        ).otherwise(F.col("text")),
    )
    return old, new


def sql_corpus_version_diff() -> str:
    canon = "md5(regexp_replace(TRIM(LOWER(text)), '\\s+', ' ', 'g'))"
    return f"""
WITH old AS (
  SELECT doc_id, source, {canon} AS h FROM documents WHERE doc_id % 7 <> 0),
new AS (
  SELECT doc_id, source,
         md5(regexp_replace(TRIM(LOWER(
           CASE WHEN doc_id % 3 = 0 THEN text || ' changed' ELSE text END
         )), '\\s+', ' ', 'g')) AS h
  FROM documents WHERE doc_id % 5 <> 0),
j AS (
  SELECT COALESCE(new.source, old.source) AS source,
         CASE WHEN old.h IS NULL THEN 'added'
              WHEN new.h IS NULL THEN 'removed'
              WHEN old.h <> new.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old FULL OUTER JOIN new USING (doc_id))
SELECT source,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM j
GROUP BY source
ORDER BY source
"""


def token_budget_waterfill(
    docs: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    max_epochs: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Cap-aware token-budget allocation by waterfilling: allocate
    ``budget_tokens`` across sources proportionally to integer
    ``weights``, but no source may exceed ``max_epochs`` passes over its
    natural supply — its excess redistributes proportionally to the
    uncapped sources (what :func:`token_budget_plan` flags with
    epochs > cap, this operator RESOLVES). The classic waterfilling
    solution: sort sources by cap/weight ascending (binds first); the
    capped prefix is the smallest k whose water level
    λ = (B − Σ_{i<k} cap_i) / Σ_{i≥k} w_i fits under the k-th source's
    cap — tested by EXACT integer cross-multiplication
    (rest_b · w_k ≤ cap_k · rest_w), so Spark and the DuckDB oracle pick
    the identical capped set with no float-ordering hazard; λ itself is
    a single double division applied identically on both sides.

    Driver materialization: ONE catalog-grain rollup (a row per source —
    bounded by the source catalog, not data volume; same pattern as the
    IVF centroid fit and the PSI baseline). Output per source:
    natural/cap/allocated tokens, implied epochs, capped flag. Allocated
    sums to min(B, Σcaps) — a gap is the honest "budget unachievable
    under the epoch cap" answer.
    """
    toks = F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    natural = docs.groupBy("source").agg(
        F.sum(toks).cast("long").alias("natural_tokens")
    )
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    base = natural.select(
        "source",
        "natural_tokens",
        F.coalesce(wmap[F.col("source")], F.lit(0)).cast("long").alias("weight"),
        (F.col("natural_tokens") * max_epochs).alias("cap_tokens"),
    )
    # bounded driver materialization: one row per source
    rows = sorted(
        (r for r in base.collect() if r["weight"] > 0),
        key=lambda r: (r["cap_tokens"] / r["weight"], r["source"]),
    )
    total_w = sum(r["weight"] for r in rows)
    capped: list[str] = []
    lam_num, lam_den = 0, 0  # all-capped default (rest_w exhausted)
    rest_b, rest_w = budget_tokens, total_w
    for r in rows:
        if rest_b * r["weight"] <= r["cap_tokens"] * rest_w:
            lam_num, lam_den = rest_b, rest_w  # water level λ = rest_b/rest_w
            break
        capped.append(r["source"])
        rest_b -= r["cap_tokens"]
        rest_w -= r["weight"]
    lam = (
        F.lit(float(lam_num)) / F.lit(float(lam_den))
        if lam_den
        else F.lit(0.0)
    )
    is_capped = F.col("source").isin(capped) if capped else F.lit(False)
    alloc = F.when(F.col("weight") == 0, F.lit(0.0)).otherwise(
        F.when(is_capped, F.col("cap_tokens").cast("double")).otherwise(
            F.round(lam * F.col("weight"), 4)
        )
    )
    return base.select(
        "source",
        "natural_tokens",
        "weight",
        "cap_tokens",
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("natural_tokens"), 4).alias("epochs"),
        ((F.col("weight") > 0) & is_capped).alias("capped"),
    ).orderBy("source")


def sql_token_budget_waterfill(
    weights: dict[str, int], budget_tokens: int, max_epochs: int = 4
) -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(weights.items())
    )
    return f"""
WITH nat AS (
  SELECT source,
         CAST(SUM(LENGTH(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'))) AS BIGINT) AS natural_tokens
  FROM documents GROUP BY source),
base AS (
  SELECT source, natural_tokens,
         CAST(CASE {cases} ELSE 0 END AS BIGINT) AS weight,
         natural_tokens * {max_epochs} AS cap_tokens
  FROM nat),
ord AS (
  SELECT *,
         COALESCE(SUM(cap_tokens) OVER w_before, 0) AS cumcap_before,
         COALESCE(SUM(weight) OVER w_before, 0) AS cumw_before,
         (SELECT SUM(weight) FROM base WHERE weight > 0) AS total_w
  FROM base WHERE weight > 0
  WINDOW w_before AS (ORDER BY cap_tokens * 1.0 / weight, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
cand AS (
  SELECT *, {budget_tokens} - cumcap_before AS rest_b,
         total_w - cumw_before AS rest_w
  FROM ord),
-- the water level: first source (in bind order) whose λ fits under its cap,
-- chosen by exact integer cross-multiplication
lvl AS (
  SELECT rest_b AS lam_num, rest_w AS lam_den,
         cap_tokens * 1.0 / weight AS r, source AS lsrc
  FROM cand
  WHERE rest_b * weight <= cap_tokens * rest_w
  ORDER BY cap_tokens * 1.0 / weight, source LIMIT 1)
SELECT b.source, b.natural_tokens, b.weight, b.cap_tokens,
       CASE WHEN b.weight = 0 THEN 0.0
            WHEN l.lam_num IS NULL OR (b.cap_tokens * 1.0 / b.weight, b.source) < (l.r, l.lsrc)
                 THEN CAST(b.cap_tokens AS DOUBLE)
            ELSE ROUND(CAST(l.lam_num AS DOUBLE) / l.lam_den * b.weight, 4)
       END AS alloc_tokens,
       ROUND(CASE WHEN b.weight = 0 THEN 0.0
                  WHEN l.lam_num IS NULL OR (b.cap_tokens * 1.0 / b.weight, b.source) < (l.r, l.lsrc)
                       THEN CAST(b.cap_tokens AS DOUBLE)
                  ELSE ROUND(CAST(l.lam_num AS DOUBLE) / l.lam_den * b.weight, 4)
             END / b.natural_tokens, 4) AS epochs,
       (b.weight > 0 AND (l.lam_num IS NULL OR (b.cap_tokens * 1.0 / b.weight, b.source) < (l.r, l.lsrc))) AS capped
FROM base b LEFT JOIN lvl l ON TRUE
ORDER BY b.source
"""


def pps_weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "pps-v1",
) -> DataFrame:
    """Deterministic probability-proportional-to-size sample of ``k``
    documents: sequential Poisson sampling (Ohlsson 1998, the PPS scheme
    in production at Statistics Sweden) — rank by ``u_i / w_i`` with
    ``u_i`` a content-independent md5 coin, keep the k smallest. Longer /
    heavier documents are proportionally likelier to be drawn, which is
    the curation shape for "sample a few docs per source for human review,
    biased toward the bulk of the token mass".

    Engine-exact by construction: the rank key uses ONLY IEEE division on
    integers (``(X+1) / 2^32 / w``) — correctly-rounded in both engines —
    never ln/exp/pow, whose libm implementations may differ in the last
    ulp and flip the k-boundary (the reason this is sequential Poisson
    and not Efraimidis–Elias ``u^(1/w)`` order sampling). md5 (not
    xxhash64) so DuckDB computes the identical coin; doc_id tie-break
    makes the cutoff total.

    Scale: the per-row key is map-side arithmetic; selection is a global
    top-k = TakeOrdered (tree-reduced per-partition heaps, no global
    sort, no single partition)."""
    x = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    key = ((x + F.lit(1)).cast("double") / F.lit(4294967296.0)) / F.col(
        weight_col
    ).cast("double")
    return (
        docs.where(F.col(weight_col) > 0)
        .select(id_col, "source", weight_col, key.alias("pps_key"))
        .orderBy("pps_key", id_col)
        .limit(k)
    )


def sql_pps_weighted_sample(
    k: int = 50, weight_col: str = "n_chars", salt: str = "pps-v1"
) -> str:
    return f"""
SELECT doc_id, source, {weight_col},
       ((CAST(CONCAT('0x', substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
         / 4294967296.0) / CAST({weight_col} AS DOUBLE) AS pps_key
FROM documents
WHERE {weight_col} > 0
ORDER BY pps_key, doc_id
LIMIT {k}
"""
