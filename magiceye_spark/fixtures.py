"""The reference's example schema pairs encoded as catalog snapshots.

Source DDL: ``/root/reference/examples/{postgres,mysql}/{base,target}.sql``
(the reference's only test assets — it ships zero unit tests). Rows are
encoded as the live catalogs WOULD render them through the reference's scan
queries: Postgres ``format_type`` renders ``varchar(N)`` and serial columns
as integer/bigint + nextval default (``src/sql/postgres.rs:39-44``); MySQL
uses ``column_type`` verbatim, auto FK names ``{table}_ibfk_{n}`` and FK
auto-indexes named after the local column — naming confirmed by the golden
report in ``/root/reference/README.md:55-86`` (``reports_fk_test.post_id``
index, ``reports_fk_test_ibfk_2`` FK).

EXPECTED_* lists are the golden findings derived from the planted diffs
(FIXTURES.md §2; corrected against the actual DDL — the PG pair keeps
``blocks`` on both sides, the MySQL pair drops it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from magiceye_spark.snapshot import SchemaSnapshot

# ---------------------------------------------------------------- helpers

def _serial(table: str, col: str, dtype: str = "integer"):
    """A Postgres SERIAL/BIGSERIAL column as the catalog renders it."""
    return (col, dtype, f"nextval('{table}_{col}_seq'::regclass)", False, "", False)


def _c(name, dtype, default="", nullable=True, comment="", auto=False):
    return (name, dtype, default, nullable, comment, auto)


def _build(spark: SparkSession, spec: dict) -> SchemaSnapshot:
    tables = [(t, "") for t in spec["columns"]]
    columns = [
        (t, c[0], c[1], c[2], c[3], c[4], c[5])
        for t, cols in spec["columns"].items()
        for c in cols
    ]
    indexes = [(t, n, list(cols), pred, uniq) for t, n, cols, pred, uniq in spec["indexes"]]
    fks = [(t, n, list(cols), rt, rc) for t, n, cols, rt, rc in spec["fks"]]
    return SchemaSnapshot.from_rows(spark, tables, columns, indexes, fks)


# ------------------------------------------------------------ postgres pair

def _pg_base_spec() -> dict:
    v255 = "varchar(255)"
    columns = {
        "users": [_serial("users", "id"), _c("name", v255, nullable=False), _c("email", v255, nullable=False)],
        "posts": [_serial("posts", "id"), _c("title", v255, nullable=False), _c("body", "text", nullable=False), _c("user_id", "integer")],
        "comments": [_serial("comments", "id"), _c("body", "text", nullable=False), _c("post_id", "integer")],
        "tags": [_serial("tags", "id"), _c("name", v255, nullable=False)],
        "post_tags": [_c("post_id", "integer", nullable=False), _c("tag_id", "integer", nullable=False)],
        "likes": [_c("user_id", "integer", nullable=False), _c("post_id", "integer", nullable=False)],
        "followers": [_c("follower_id", "integer", nullable=False), _c("followee_id", "integer", nullable=False)],
        "notifications": [_serial("notifications", "id"), _c("user_id", "integer"), _c("message", "text", nullable=False)],
        "messages": [_serial("messages", "id"), _c("sender_id", "integer"), _c("receiver_id", "integer"), _c("body", "text", nullable=False)],
        "sessions": [_serial("sessions", "id"), _c("user_id", "integer"), _c("token", v255, nullable=False)],
        "settings": [_serial("settings", "id"), _c("user_id", "integer"), _c("theme", v255, nullable=False)],
        "reports": [_serial("reports", "id"), _c("user_id", "integer"), _c("post_id", "integer"), _c("reason", "text", nullable=False)],
        "blocks": [_c("blocker_id", "integer", nullable=False), _c("blockee_id", "integer", nullable=False)],
        "mutes": [_c("muter_id", "integer", nullable=False), _c("mutee_id", "integer", nullable=False)],
        "key_values": [_serial("key_values", "key"), _c("value", "text", nullable=False)],
        "reports_fk_test": [_serial("reports_fk_test", "id"), _c("user_id", "integer"), _c("post_id", "integer"), _c("reason", "text", nullable=False)],
    }
    pkeys = {
        "users": ["id"], "posts": ["id"], "comments": ["id"], "tags": ["id"],
        "post_tags": ["post_id", "tag_id"], "likes": ["user_id", "post_id"],
        "followers": ["follower_id", "followee_id"], "notifications": ["id"],
        "messages": ["id"], "sessions": ["id"], "settings": ["id"],
        "reports": ["id"], "blocks": ["blocker_id", "blockee_id"],
        "mutes": ["muter_id", "mutee_id"], "key_values": ["key"],
        "reports_fk_test": ["id"],
    }
    indexes = [(t, f"{t}_pkey", cols, "", True) for t, cols in pkeys.items()]
    indexes += [
        ("users", "idx_user_email", ["email"], "", False),
        ("users", "idx_user_name_email", ["name", "email"], "", False),
        ("posts", "idx_post_user_id", ["user_id"], "", False),
        ("comments", "idx_comment_post_id", ["post_id"], "", False),
        ("post_tags", "idx_post_tag_post_id", ["post_id"], "", False),
        ("post_tags", "idx_post_tag_tag_id", ["tag_id"], "", False),
        ("likes", "idx_like_user_id", ["user_id"], "", False),
        ("likes", "idx_like_post_id", ["post_id"], "", False),
    ]
    fk_specs = [
        ("posts", "user_id", "users", "id"),
        ("comments", "post_id", "posts", "id"),
        ("post_tags", "post_id", "posts", "id"),
        ("post_tags", "tag_id", "tags", "id"),
        ("likes", "user_id", "users", "id"),
        ("likes", "post_id", "posts", "id"),
        ("followers", "follower_id", "users", "id"),
        ("followers", "followee_id", "users", "id"),
        ("notifications", "user_id", "users", "id"),
        ("messages", "sender_id", "users", "id"),
        ("messages", "receiver_id", "users", "id"),
        ("sessions", "user_id", "users", "id"),
        ("settings", "user_id", "users", "id"),
        ("reports", "user_id", "users", "id"),
        ("reports", "post_id", "posts", "id"),
        ("blocks", "blocker_id", "users", "id"),
        ("blocks", "blockee_id", "users", "id"),
        ("mutes", "muter_id", "users", "id"),
        ("mutes", "mutee_id", "users", "id"),
        ("reports_fk_test", "user_id", "users", "id"),
        ("reports_fk_test", "post_id", "posts", "id"),
    ]
    fks = [(t, f"{t}_{c}_fkey", [c], rt, rc) for t, c, rt, rc in fk_specs]
    return {"columns": columns, "indexes": indexes, "fks": fks}


def postgres_base(spark: SparkSession) -> SchemaSnapshot:
    return _build(spark, _pg_base_spec())


def postgres_target(spark: SparkSession) -> SchemaSnapshot:
    """target.sql planted diffs: users.id bigserial (:6), posts.title
    varchar(100) (:13), tags.name nullable (:26), likes.user_id bigint
    (:36), notifications FK dropped (:47-51), sessions.user_id dropped
    (:60-63), idx_user_name_email order swapped (:91), idx_comment_post_id
    partial predicate (:94), idx_like_post_id dropped, key_values PK
    dropped (:99-102), reports_fk_test FK retargeted to messages
    (:111-113)."""
    spec = _pg_base_spec()
    cols = spec["columns"]
    cols["users"][0] = _serial("users", "id", "bigint")
    cols["posts"][1] = _c("title", "varchar(100)", nullable=False)
    cols["tags"][1] = _c("name", "varchar(255)", nullable=True)
    cols["likes"][0] = _c("user_id", "bigint", nullable=False)
    cols["sessions"] = [c for c in cols["sessions"] if c[0] != "user_id"]
    spec["fks"] = [
        f for f in spec["fks"]
        if f[1] not in ("notifications_user_id_fkey", "sessions_user_id_fkey")
    ]
    spec["fks"] = [
        (t, n, c, "messages", "id") if n == "reports_fk_test_post_id_fkey" else (t, n, c, rt, rc)
        for t, n, c, rt, rc in spec["fks"]
    ]
    out_indexes = []
    for t, n, c, p, u in spec["indexes"]:
        if n in ("idx_like_post_id", "key_values_pkey"):
            continue
        if n == "idx_user_name_email":
            c = ["email", "name"]
        if n == "idx_comment_post_id":
            p = "(post_id IS NOT NULL)"
        out_indexes.append((t, n, c, p, u))
    spec["indexes"] = out_indexes
    return _build(spark, spec)


#: golden findings for the postgres pair (base→target), as FINDINGS rows.
EXPECTED_PG_FINDINGS = [
    ("comments", "index", "idx_comment_post_id", "index_predicate", "", "(post_id IS NOT NULL)"),
    ("key_values", "index", "key_values_pkey", "missing", "", ""),
    ("likes", "column", "user_id", "data_type", "integer", "bigint"),
    ("likes", "index", "idx_like_post_id", "missing", "", ""),
    ("notifications", "fk", "notifications_user_id_fkey", "missing", "", ""),
    ("posts", "column", "title", "data_type", "varchar(255)", "varchar(100)"),
    ("reports_fk_test", "fk", "reports_fk_test_post_id_fkey", "fk_ref", "posts.id", "messages.id"),
    ("sessions", "column", "user_id", "missing", "", ""),
    ("sessions", "fk", "sessions_user_id_fkey", "missing", "", ""),
    ("tags", "column", "name", "nullable", "NOT NULL", "NULL"),
    ("users", "column", "id", "data_type", "integer", "bigint"),
    ("users", "index", "idx_user_name_email", "index_columns", "name, email", "email, name"),
]


# ------------------------------------------------------------- mysql pair

def _my_base_spec() -> dict:
    v255 = "varchar(255)"

    def auto_id():
        return _c("id", "int", "", False, "", True)

    columns = {
        "users": [auto_id(), _c("name", v255, nullable=False), _c("email", v255, nullable=False)],
        "posts": [auto_id(), _c("title", v255, "asdf", False), _c("body", "text", nullable=False), _c("user_id", "int")],
        "comments": [auto_id(), _c("body", "text", nullable=False), _c("post_id", "int")],
        "tags": [auto_id(), _c("name", v255, nullable=False)],
        "post_tags": [_c("post_id", "int", nullable=False), _c("tag_id", "int", nullable=False)],
        "likes": [_c("user_id", "int", nullable=False), _c("post_id", "int", nullable=False)],
        "followers": [_c("follower_id", "int", nullable=False), _c("followee_id", "int", nullable=False)],
        "notifications": [auto_id(), _c("user_id", "int"), _c("message", "text", nullable=False)],
        "messages": [auto_id(), _c("sender_id", "int"), _c("receiver_id", "int"), _c("body", "text", nullable=False)],
        "sessions": [auto_id(), _c("user_id", "int"), _c("token", v255, nullable=False)],
        "settings": [auto_id(), _c("user_id", "int"), _c("theme", v255, nullable=False)],
        "reports": [auto_id(), _c("user_id", "int"), _c("post_id", "int"), _c("reason", "text", nullable=False)],
        "blocks": [_c("blocker_id", "int", nullable=False), _c("blockee_id", "int", nullable=False)],
        "mutes": [_c("muter_id", "int", nullable=False), _c("mutee_id", "int", nullable=False)],
        "admins": [auto_id(), _c("name", v255, nullable=False), _c("email", v255, nullable=False)],
        "reports_fk_test": [auto_id(), _c("user_id", "int"), _c("post_id", "int"), _c("reason", "text", nullable=False)],
    }
    pkeys = {
        "users": ["id"], "posts": ["id"], "comments": ["id"], "tags": ["id"],
        "post_tags": ["post_id", "tag_id"], "likes": ["user_id", "post_id"],
        "followers": ["follower_id", "followee_id"], "notifications": ["id"],
        "messages": ["id"], "sessions": ["id"], "settings": ["id"],
        "reports": ["id"], "blocks": ["blocker_id", "blockee_id"],
        "mutes": ["muter_id", "mutee_id"], "admins": ["id"],
        "reports_fk_test": ["id"],
    }
    # FK declaration order per table -> {table}_ibfk_{n} names + an auto
    # index named after the local column unless the PK already leads with it
    # (InnoDB reuses a usable index; naming per README.md:66-70 golden).
    fk_specs = [
        ("posts", "user_id", "users", "id"),
        ("comments", "post_id", "posts", "id"),
        ("post_tags", "post_id", "posts", "id"),
        ("post_tags", "tag_id", "tags", "id"),
        ("likes", "user_id", "users", "id"),
        ("likes", "post_id", "posts", "id"),
        ("followers", "follower_id", "users", "id"),
        ("followers", "followee_id", "users", "id"),
        ("notifications", "user_id", "users", "id"),
        ("messages", "sender_id", "users", "id"),
        ("messages", "receiver_id", "users", "id"),
        ("sessions", "user_id", "users", "id"),
        ("settings", "user_id", "users", "id"),
        ("reports", "user_id", "users", "id"),
        ("reports", "post_id", "posts", "id"),
        ("blocks", "blocker_id", "users", "id"),
        ("blocks", "blockee_id", "users", "id"),
        ("mutes", "muter_id", "users", "id"),
        ("mutes", "mutee_id", "users", "id"),
        ("reports_fk_test", "user_id", "users", "id"),
        ("reports_fk_test", "post_id", "posts", "id"),
    ]
    fks, counters = [], {}
    fk_auto_indexes = []
    for t, c, rt, rc in fk_specs:
        counters[t] = counters.get(t, 0) + 1
        fks.append((t, f"{t}_ibfk_{counters[t]}", [c], rt, rc))
        if pkeys[t][0] != c:
            fk_auto_indexes.append((t, c, [c], "", False))
    indexes = [(t, "PRIMARY", cols, "", True) for t, cols in pkeys.items()]
    indexes += fk_auto_indexes
    indexes += [
        ("users", "idx_user_email", ["email"], "", False),
        ("users", "idx_user_name_email", ["name", "email"], "", False),
        ("posts", "idx_post_user_id", ["user_id"], "", False),
        ("comments", "idx_comment_post_id", ["post_id"], "", False),
        ("post_tags", "idx_post_tag_post_id", ["post_id"], "", False),
        ("post_tags", "idx_post_tag_tag_id", ["tag_id"], "", False),
        ("likes", "idx_like_user_id", ["user_id"], "", False),
        ("likes", "idx_like_post_id", ["post_id"], "", False),
        ("followers", "idx_follower_follower_id", ["follower_id"], "", False),
    ]
    return {"columns": columns, "indexes": indexes, "fks": fks}


def mysql_base(spark: SparkSession) -> SchemaSnapshot:
    return _build(spark, _my_base_spec())


def _my_target_spec() -> dict:
    """target.sql planted diffs: posts.id loses AUTO_INCREMENT (:12),
    posts.title loses DEFAULT 'asdf' (:13), comments.body loses NOT NULL
    (:21), tags.name varchar(155) (:28), messages.receiver_id dropped
    (:62-68), blocks dropped (absent :93), admins.id loses AUTO_INCREMENT
    (:112), idx_follower_follower_id dropped (:101-109), reports_fk_test
    post_id FK dropped (:117-123)."""
    spec = _my_base_spec()
    cols = spec["columns"]
    cols["posts"][0] = _c("id", "int", "", False, "", False)
    cols["posts"][1] = _c("title", "varchar(255)", "", False)
    cols["comments"][1] = _c("body", "text", nullable=True)
    cols["tags"][1] = _c("name", "varchar(155)", nullable=False)
    cols["messages"] = [c for c in cols["messages"] if c[0] != "receiver_id"]
    cols["admins"][0] = _c("id", "int", "", False, "", False)
    del cols["blocks"]
    spec["fks"] = [
        f for f in spec["fks"]
        if f[0] != "blocks"
        and f[1] not in ("messages_ibfk_2", "reports_fk_test_ibfk_2")
    ]
    spec["indexes"] = [
        ix for ix in spec["indexes"]
        if ix[0] != "blocks"
        and not (ix[0] == "messages" and ix[1] == "receiver_id")
        and not (ix[0] == "reports_fk_test" and ix[1] == "post_id")
        and ix[1] != "idx_follower_follower_id"
    ]
    return spec


def mysql_target(spark: SparkSession) -> SchemaSnapshot:
    return _build(spark, _my_target_spec())


#: golden findings for the mysql pair; the README report example
#: (README.md:55-86) shows a subset of exactly these strings.
EXPECTED_MYSQL_FINDINGS = [
    ("admins", "column", "id", "auto_increment", "AUTO_INCREMENT", "NOT AUTO_INCREMENT"),
    ("blocks", "table", "blocks", "missing", "", ""),
    ("comments", "column", "body", "nullable", "NOT NULL", "NULL"),
    ("followers", "index", "idx_follower_follower_id", "missing", "", ""),
    ("messages", "column", "receiver_id", "missing", "", ""),
    ("messages", "fk", "messages_ibfk_2", "missing", "", ""),
    ("messages", "index", "receiver_id", "missing", "", ""),
    ("posts", "column", "id", "auto_increment", "AUTO_INCREMENT", "NOT AUTO_INCREMENT"),
    ("posts", "column", "title", "default", "asdf", ""),
    ("reports_fk_test", "fk", "reports_fk_test_ibfk_2", "missing", "", ""),
    ("reports_fk_test", "index", "post_id", "missing", "", ""),
    ("tags", "column", "name", "data_type", "varchar(255)", "varchar(155)"),
]
