"""R1-R3: findings → localized message strings → grouped JSON report.

Message templates reproduce the reference byte-for-byte (English and Korean;
``/root/reference/src/action/run/steps/check.rs`` — table :96-101, column
:141-147/:158-164/:180-186/:197-203/:222-228/:236-242, index
:271-277/:288-294/:313-319/:327-333, fk :369-375/:383-389). The reference
renders strings inline inside every predicate arm; we render at the edge from
the structured findings DF so the operator layer stays language-neutral.

Report envelope matches ``ReportSchema { report_table_list: [ { table_name,
report_list } ] }`` (check.rs:6-15) with one deliberate improvement: output
is sorted by table_name and by (object kind, object name, check) within a
table — the reference's HashMap iteration order is nondeterministic
(check.rs:33), which makes golden testing impossible; ours is stable.
"""

from __future__ import annotations

import json
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from magiceye_spark.schema import CHECK_RANK, OBJECT_KIND_RANK

_KIND_LABEL = {
    "table": "Table",
    "column": "Column",
    "index": "Index",
    "fk": "Foreign Key",
}

# check -> (english phrase, korean phrase); property phrases are followed by
# " => {base} != {target}" appended uniformly (the reference's format! strings
# all end with "=> {b} != {t}").
_PHRASES = {
    "missing": (
        " exists in the base database, but not in the target database.",
        "가 base 데이터베이스에는 있지만, target 데이터베이스에는 없습니다.",
    ),
    "data_type": (" has different data type.", "의 데이터 타입이 다릅니다."),
    "comment": (" has different comment.", "의 코멘트가 다릅니다."),
    "nullable": (" has different nullable.", "의 NULLABLE이 다릅니다."),
    "default": (" has different default value.", "의 DEFAULT 값이 다릅니다."),
    "auto_increment": (
        " has different AUTO_INCREMENT.",
        "의 AUTO_INCREMENT 여부가 다릅니다.",
    ),
    "index_columns": (
        " has different columns. Please check the order.",
        "의 컬럼이 다릅니다. 순서까지 확인해주세요.",
    ),
    "index_predicate": (" has different predicate.", "의 조건이 다릅니다."),
    "index_unique": (" has different uniqueness.", "의 UNIQUE 여부가 다릅니다."),
    "fk_ref": (" references different column.", "의 참조 컬럼이 다릅니다."),
}


def _map_literal(mapping: dict[str, str]) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def render_findings(findings: DataFrame, language: str = "english") -> DataFrame:
    """Add a localized ``report`` string column to a findings DataFrame.

    Pure column expressions (map lookup + concat) — whole-stage codegen,
    no UDF, no driver round-trip.
    """
    lang_idx = {"english": 0, "korean": 1}[language.lower()]
    label = _map_literal(_KIND_LABEL)[F.col("object_kind")]
    phrase = _map_literal({k: v[lang_idx] for k, v in _PHRASES.items()})[F.col("check")]
    qualname = F.when(
        F.col("object_kind") == "table", F.col("object_name")
    ).otherwise(F.concat_ws(".", F.col("table_name"), F.col("object_name")))
    head = F.concat(label, F.lit(": "), qualname, phrase)
    message = F.when(F.col("check") == "missing", head).otherwise(
        F.concat(head, F.lit(" => "), F.col("base_value"), F.lit(" != "), F.col("target_value"))
    )
    return findings.withColumn("report", message)


def _rank(col: str, ranks: dict[str, int]) -> Column:
    return F.coalesce(_map_literal({k: str(v) for k, v in ranks.items()})[F.col(col)], F.lit("9"))


def grouped_report(findings: DataFrame, language: str = "english") -> DataFrame:
    """R2: group rendered findings per table → (table_name, report_list).

    Ordering inside the list is made deterministic by sorting an array of
    (rank…, message) structs AFTER the aggregation — ``sort_array`` over
    structs compares field-by-field, so collect_list's arbitrary
    shuffle-order never leaks into output. Tables with zero findings vanish
    naturally (no group), matching the reference's has_report flag
    (check.rs:41-46,109-111).
    """
    rendered = render_findings(findings, language)
    return (
        rendered.groupBy("table_name")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            _rank("object_kind", OBJECT_KIND_RANK).alias("k"),
                            F.col("object_name").alias("o"),
                            _rank("check", CHECK_RANK).alias("c"),
                            F.col("report").alias("report"),
                        )
                    )
                ),
                lambda x: x["report"],
            ).alias("report_list")
        )
        .orderBy("table_name")
    )


def write_report(findings: DataFrame, path: str, language: str = "english") -> dict:
    """R3: serialize the grouped report as one pretty JSON document shaped
    exactly like the reference's ReportSchema (check.rs:6-15;
    background.rs:58-66 writes pretty JSON to a timestamped file — the path
    is the caller's choice here).

    The grouped report is metadata-sized (one row per *changed table*), so a
    driver-side collect is appropriate; for lake-scale reports use
    ``grouped_report(f).write.json(path)`` instead.
    """
    rows = grouped_report(findings, language).collect()
    doc = {
        "report_table_list": [
            {"table_name": r["table_name"], "report_list": list(r["report_list"])}
            for r in rows
        ]
    }
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, ensure_ascii=False, indent=2)
    return doc
