"""Schema-diff operators D1-D17 as pure DataFrame transforms.

Reference semantics (``/root/reference/src/action/run/steps/check.rs``):

- Directional base→target: objects present only in *target* are ignored
  (``src/action/run/background.rs:48-51``) — hence LEFT joins, never full.
- Tables matched by name (``check.rs:33-34``); columns by name within a
  matched table (``check.rs:50-51``); indexes by name (``check.rs:64-65``);
  FKs by constraint name (``check.rs:78-80``, ``src/sql/mod.rs:74-79``).
- Property checks per matched object: column data_type/comment/nullable/
  default/auto_increment (``check.rs:137-233``); index columns (ORDER
  SENSITIVE, ``check.rs:267-277``)/predicate/uniqueness
  (``check.rs:284-324``); FK referenced table.column (``check.rs:356-380``
  — local columns are NOT compared, matching the reference).

The reference does all this with single-threaded HashMap probes and O(n²)
linear scans (``check.rs:33,51,65,80``). Here every matcher is an equi-join
Catalyst turns into a broadcast hash join (catalog snapshots are small
relative to executors) and every property check is a codegen'd predicate —
the same plan shape scales to a catalog with millions of objects by falling
back to sort-merge join on the (table_name, object_name) shuffle key.

Each matched object produces its findings in ONE pass: an array of candidate
finding structs filtered and exploded, so there is exactly one join per
object kind — no per-check re-join, no shuffle beyond the single left join
(which itself is shuffle-free when the target side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magiceye_spark.schema import FINDINGS_SCHEMA
from magiceye_spark.snapshot import SchemaSnapshot

_FINDING_COLS = [f.name for f in FINDINGS_SCHEMA.fields]

#: marker column proving the target row matched (every real target column is
#: ''-coalesced, so only an injected literal can distinguish "matched with
#: empty properties" from "no match").
_PRESENT = "_magiceye_target_present"


def _empty_str(c: Column) -> Column:
    return F.coalesce(c, F.lit(""))


def _finding(check: str, base_value: Column, target_value: Column) -> Column:
    return F.struct(
        F.lit(check).alias("check"),
        _empty_str(base_value).alias("base_value"),
        _empty_str(target_value).alias("target_value"),
    )


def _check(cond: Column, check: str, base_value: Column, target_value: Column) -> Column:
    """A candidate finding: the struct when the property differs, else NULL
    (filtered out before explode)."""
    return F.when(cond, _finding(check, base_value, target_value))


def _explode_findings(
    joined: DataFrame, kind: str, object_name_col: Column, checks: list[Column]
) -> DataFrame:
    """Shared tail for every matcher: one row in -> 0..n finding rows out.

    Missing target object -> single 'missing' finding; matched object -> one
    finding per differing property; identical object -> zero rows (explode of
    an empty array drops the row, mirroring the reference's has_report flag,
    check.rs:41-46,109-111).
    """
    candidates = F.filter(F.array(*checks), lambda x: x.isNotNull())
    findings = F.when(
        F.col(_PRESENT).isNull(),
        F.array(_finding("missing", F.lit(""), F.lit(""))),
    ).otherwise(candidates)
    return (
        joined.select(
            F.col("table_name"),
            F.lit(kind).alias("object_kind"),
            object_name_col.alias("object_name"),
            F.explode(findings).alias("f"),
        )
        .select(
            "table_name",
            "object_kind",
            "object_name",
            F.col("f.check").alias("check"),
            F.col("f.base_value").alias("base_value"),
            F.col("f.target_value").alias("target_value"),
        )
    )


def _scope_to_target_tables(
    child: DataFrame, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """Restrict child objects (columns/indexes/FKs) to tables that exist on
    the target side — a missing table reports once as a table finding, not
    once per column (check.rs:48-107 match arms).

    The reference iterates base tables and descends only on a match, i.e. it
    scopes to base.tables ∩ target.tables. A snapshot's child objects come
    from the same catalog scan as its table list (fetching.rs:11-60), so
    every child table_name is already in base.tables and the semi-join
    against target.tables alone is equivalent — one scan and zero joins
    cheaper per matcher, which matters because this subtree is built three
    times per diff."""
    t = target.tables.select("table_name")
    if hint_broadcast:
        t = F.broadcast(t)
    return child.join(t, "table_name", "left_semi")


def _left_join(
    base_df: DataFrame, target_df: DataFrame, keys: list[str], broadcast: bool = True
) -> DataFrame:
    """base LEFT JOIN target on keys, with target columns suffixed '_t' and a
    match marker. Broadcast hint on the target side by default — catalog
    snapshots are tiny next to the cluster; Catalyst falls back to SMJ when
    stats say otherwise."""
    t = target_df.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{c}_t") for c in target_df.columns if c not in keys],
        F.lit(True).alias(_PRESENT),
    )
    if broadcast:
        t = F.broadcast(t)
    return base_df.join(t, keys, "left")


def diff_tables(
    base: SchemaSnapshot, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """D1: tables in base but not target (check.rs:94-107) — a left anti join."""
    t = F.broadcast(target.tables) if hint_broadcast else target.tables
    missing = base.tables.join(t, "table_name", "left_anti")
    return missing.select(
        "table_name",
        F.lit("table").alias("object_kind"),
        F.col("table_name").alias("object_name"),
        F.lit("missing").alias("check"),
        F.lit("").alias("base_value"),
        F.lit("").alias("target_value"),
    )


def diff_columns(
    base: SchemaSnapshot, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """D3-D9: per-column presence + property checks (check.rs:122-251).

    Rendered values follow the reference exactly: nullable as NULL/NOT NULL
    (check.rs:171-178), auto_increment as AUTO_INCREMENT/NOT AUTO_INCREMENT
    (check.rs:210-221); check order data_type, comment, nullable, default,
    auto_increment matches check.rs:137-233.
    """
    scoped = _scope_to_target_tables(base.columns, target, hint_broadcast)
    j = _left_join(
        scoped, target.columns, ["table_name", "column_name"], broadcast=hint_broadcast
    )
    render_null = lambda c: F.when(c, F.lit("NULL")).otherwise(F.lit("NOT NULL"))
    render_auto = lambda c: F.when(c, F.lit("AUTO_INCREMENT")).otherwise(
        F.lit("NOT AUTO_INCREMENT")
    )
    checks = [
        _check(
            ~F.col("data_type").eqNullSafe(F.col("data_type_t")),
            "data_type",
            F.col("data_type"),
            F.col("data_type_t"),
        ),
        _check(
            ~F.col("comment").eqNullSafe(F.col("comment_t")),
            "comment",
            F.col("comment"),
            F.col("comment_t"),
        ),
        _check(
            ~F.col("is_nullable").eqNullSafe(F.col("is_nullable_t")),
            "nullable",
            render_null(F.col("is_nullable")),
            render_null(F.col("is_nullable_t")),
        ),
        _check(
            ~F.col("column_default").eqNullSafe(F.col("column_default_t")),
            "default",
            F.col("column_default"),
            F.col("column_default_t"),
        ),
        _check(
            ~F.col("is_auto_increment").eqNullSafe(F.col("is_auto_increment_t")),
            "auto_increment",
            render_auto(F.col("is_auto_increment")),
            render_auto(F.col("is_auto_increment_t")),
        ),
    ]
    return _explode_findings(j, "column", F.col("column_name"), checks)


def diff_indexes(
    base: SchemaSnapshot, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """D10-D14: index presence + columns/predicate/uniqueness
    (check.rs:253-342). Array `!=` is element- AND order-wise, exactly the
    reference's Vec<String> compare (check.rs:267) — no sort, no set-ify.
    """
    scoped = _scope_to_target_tables(base.indexes, target, hint_broadcast)
    j = _left_join(
        scoped, target.indexes, ["table_name", "index_name"], broadcast=hint_broadcast
    )
    render_cols = lambda c: F.array_join(c, ", ")  # check.rs:268 join(", ")
    render_uniq = lambda c: F.when(c, F.lit("UNIQUE")).otherwise(F.lit("NOT UNIQUE"))
    checks = [
        _check(
            ~(F.col("columns").eqNullSafe(F.col("columns_t"))),
            "index_columns",
            render_cols(F.col("columns")),
            render_cols(F.col("columns_t")),
        ),
        _check(
            ~F.col("predicate").eqNullSafe(F.col("predicate_t")),
            "index_predicate",
            F.col("predicate"),
            F.col("predicate_t"),
        ),
        _check(
            ~F.col("is_unique").eqNullSafe(F.col("is_unique_t")),
            "index_unique",
            render_uniq(F.col("is_unique")),
            render_uniq(F.col("is_unique_t")),
        ),
    ]
    return _explode_findings(j, "index", F.col("index_name"), checks)


def diff_foreign_keys(
    base: SchemaSnapshot, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """D15-D17: FK presence by constraint name + referenced-column equality
    (check.rs:344-398). Only the referenced side is compared; the local
    column list is deliberately ignored, matching the reference
    (check.rs:358 compares `foreign_column` only)."""
    scoped = _scope_to_target_tables(base.fks, target, hint_broadcast)
    j = _left_join(
        scoped, target.fks, ["table_name", "fk_name"], broadcast=hint_broadcast
    )
    render_ref = lambda t, c: F.concat_ws(".", t, c)  # check.rs:371 t.c rendering
    checks = [
        _check(
            ~F.col("ref_table").eqNullSafe(F.col("ref_table_t"))
            | ~F.col("ref_column").eqNullSafe(F.col("ref_column_t")),
            "fk_ref",
            render_ref(F.col("ref_table"), F.col("ref_column")),
            render_ref(F.col("ref_table_t"), F.col("ref_column_t")),
        ),
    ]
    return _explode_findings(j, "fk", F.col("fk_name"), checks)


def diff_timeline(snapshots: list[tuple[str, SchemaSnapshot]]) -> DataFrame:
    """Catalog drift across an ordered snapshot history: diff each adjacent
    pair and tag findings with (from_version, to_version). The version loop
    is driver-side and catalog-sized; each pairwise diff is the same
    distributed plan as :func:`diff_schemas`, so the union is one lazy plan
    over all versions. Turns the one-shot checker into the drift-timeline
    primitive the streaming monitor aggregates."""
    if len(snapshots) < 2:
        raise ValueError("diff_timeline needs at least two snapshots")
    out = None
    for (v_from, s_from), (v_to, s_to) in zip(snapshots, snapshots[1:]):
        d = diff_schemas(s_from, s_to).select(
            F.lit(v_from).alias("from_version"),
            F.lit(v_to).alias("to_version"),
            *_FINDING_COLS,
        )
        out = d if out is None else out.unionByName(d)
    return out


def diff_schemas(
    base: SchemaSnapshot, target: SchemaSnapshot, hint_broadcast: bool = True
) -> DataFrame:
    """The full D1-D17 diff: union of all four matchers.

    The findings SET is deterministic; row order is left to the engine here
    (a global orderBy would add a range-partitioner sampling pass that
    re-executes the whole union). Deterministic ORDER is applied where a
    human reads it — ``report.grouped_report`` sorts tables and sorts each
    table's findings — fixing the reference's nondeterministic HashMap
    iteration (check.rs:33) without taxing the operator layer."""
    findings = (
        diff_tables(base, target, hint_broadcast)
        .unionByName(diff_columns(base, target, hint_broadcast))
        .unionByName(diff_indexes(base, target, hint_broadcast))
        .unionByName(diff_foreign_keys(base, target, hint_broadcast))
    )
    return findings.select(_FINDING_COLS)


def rename_candidates(base, target) -> "DataFrame":
    """Column-RENAME detection — the finding class the reference's
    drop+add model cannot express (`check.rs` reports a rename as one
    missing-column plus one unmatched new column; a human reads it as a
    rename). A dropped base column and an added target column in the SAME
    table with IDENTICAL data_type and comment are paired as a rename
    candidate, ranked per dropped column by name edit distance (ties to
    the lexicographically first new name) so each dropped column proposes
    at most one rename.

    Returns (table_name, old_column, new_column, name_dist,
    default_match). Anti-joins + one equi-join on (table, type, comment)
    + a per-(table, old) rank window — broadcast-sized at catalog scale,
    like every other diff here."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    matched = base.tables.select("table_name").intersect(
        target.tables.select("table_name")
    )
    bcols = base.columns.join(F.broadcast(matched), "table_name")
    tcols = target.columns.join(F.broadcast(matched), "table_name")
    dropped = bcols.join(
        tcols.select("table_name", "column_name"), ["table_name", "column_name"], "left_anti"
    )
    added = tcols.join(
        bcols.select("table_name", "column_name"), ["table_name", "column_name"], "left_anti"
    )
    cand = dropped.alias("d").join(
        added.alias("a"),
        (F.col("d.table_name") == F.col("a.table_name"))
        & (F.col("d.data_type") == F.col("a.data_type"))
        & (F.col("d.comment") == F.col("a.comment")),
    )
    scored = cand.select(
        F.col("d.table_name").alias("table_name"),
        F.col("d.column_name").alias("old_column"),
        F.col("a.column_name").alias("new_column"),
        F.levenshtein(F.col("d.column_name"), F.col("a.column_name")).alias("name_dist"),
        (
            F.coalesce(F.col("d.column_default"), F.lit(""))
            == F.coalesce(F.col("a.column_default"), F.lit(""))
        ).alias("default_match"),
    )
    w = Window.partitionBy("table_name", "old_column").orderBy(
        F.asc("name_dist"), F.asc("new_column")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
        .orderBy("table_name", "old_column")
    )
