"""Golden tests for the PostgreSQL plain-dump source (sources/pg_dump.py).

The reference has no pg ingestion (sync.py parses only mysqldump
INSERTs); these pin the COPY text-protocol semantics the new reader
implements: positional line→block assignment, tab splitting, ``\\N``
NULL marking before unescape, the backslash escape chain, DDL-typed
casts, and multi-file (sharded) dumps.
"""

from __future__ import annotations

import datetime
import textwrap
from decimal import Decimal

import pytest

from database_syncer_spark.sources.pg_dump import (
    parse_pg_create_table,
    read_pg_dump,
    write_pg_dump,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# --- DDL parse ---------------------------------------------------------------

def test_parse_pg_create_table_types_and_constraints():
    tbl, cols = parse_pg_create_table(textwrap.dedent("""\
        CREATE TABLE public.users (
            id bigint NOT NULL,
            name text,
            bal numeric(12,2) DEFAULT 0,
            joined timestamp without time zone,
            active boolean,
            PRIMARY KEY (id),
            CONSTRAINT users_chk CHECK (bal >= 0)
        )"""))
    assert tbl == "users"
    assert cols == [
        ("id", "bigint"), ("name", "text"), ("bal", "numeric(12,2)"),
        ("joined", "timestamp without time zone"), ("active", "boolean")]


def test_parse_pg_create_table_quoted_and_unschemad():
    tbl, cols = parse_pg_create_table(
        'CREATE TABLE "orders" ("id" integer, "note" character varying(40))')
    assert tbl == "orders"
    assert cols == [("id", "integer"), ("note", "character varying(40)")]


# --- writer/reader round trip -------------------------------------------------

def test_pg_roundtrip_escapes_and_nulls(spark, tmp_path):
    """Tab / newline / CR / backslash / literal two-char '\\N' string /
    empty string / NULL all survive write->read byte-exact. A literal
    '\\N' VALUE is escaped on disk as '\\\\N' and must stay data — only
    the unescaped single-backslash marker means NULL."""
    rows = [
        (1, "plain"),
        (2, "tab\there"),
        (3, "line\nbreak"),
        (4, "cr\rhere"),
        (5, "back\\slash"),
        (6, "\\N"),          # literal backslash-N string, NOT null
        (7, ""),
        (8, None),
        (9, "trailing\\"),
    ]
    df = spark.createDataFrame(rows, "id bigint, v string")
    path = str(tmp_path / "esc.sql")
    write_pg_dump(df, "t", ["id"], path)
    back = read_pg_dump(spark, path)["t"]
    assert {(r.id, r.v) for r in back.collect()} == set(rows)


def test_pg_roundtrip_typed_columns(spark, tmp_path):
    rows = [
        (1, Decimal("12.34"), 0.5, True,
         datetime.datetime(2024, 2, 29, 12, 30, 45, 123456),
         datetime.date(2024, 2, 29)),
        (2, None, None, False, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, bal decimal(12,2), x double, ok boolean, "
              "ts timestamp_ntz, d date")
    path = str(tmp_path / "typed.sql")
    write_pg_dump(df, "t", ["id"], path)
    back = read_pg_dump(spark, path)["t"]
    assert dict(back.dtypes) == {
        "id": "bigint", "bal": "decimal(12,2)", "x": "double",
        "ok": "boolean", "ts": "timestamp_ntz", "d": "date"}
    assert {tuple(r) for r in back.collect()} == set(rows)


# --- block assignment ----------------------------------------------------------

def test_pg_multi_block_assignment_and_header_lookalike(spark, tmp_path):
    """Two COPY blocks in one file: every line lands in ITS table, and a
    data line that looks exactly like a COPY header stays data (inside a
    block only '\\.' is a marker — pg's own COPY-mode rule)."""
    path = _write(tmp_path, "multi.sql", textwrap.dedent("""\
        CREATE TABLE public.a (
            id bigint NOT NULL,
            v text
        );
        CREATE TABLE public.b (
            id bigint NOT NULL,
            w text
        );
        COPY public.a (id, v) FROM stdin;
        1\tx
        2\tCOPY public.fake (id) FROM stdin;
        \\.
        COPY public.b (id, w) FROM stdin;
        10\ty
        \\.
        """))
    out = read_pg_dump(spark, path)
    assert set(out) == {"a", "b"}
    a = {(r.id, r.v) for r in out["a"].collect()}
    assert a == {(1, "x"), (2, "COPY public.fake (id) FROM stdin;")}
    assert {(r.id, r.w) for r in out["b"].collect()} == {(10, "y")}


def test_pg_column_list_free_header_uses_ddl_order(spark, tmp_path):
    path = _write(tmp_path, "nolist.sql", textwrap.dedent("""\
        CREATE TABLE public.t (
            id bigint NOT NULL,
            v text
        );
        COPY public.t FROM stdin;
        5\thello
        \\.
        """))
    assert {(r.id, r.v) for r in read_pg_dump(spark, path)["t"].collect()} \
        == {(5, "hello")}


def test_pg_sharded_directory(spark, tmp_path):
    """A directory of shard files, each with its own COPY block for the
    same table, unions — and per-file range assignment never leaks a
    line across shards."""
    d = tmp_path / "shards"
    d.mkdir()
    ddl = "CREATE TABLE public.t (\n    id bigint NOT NULL,\n    v text\n);\n"
    (d / "part-000.sql").write_text(
        ddl + "COPY public.t (id, v) FROM stdin;\n1\ta\n2\tb\n\\.\n")
    (d / "part-001.sql").write_text(
        ddl + "COPY public.t (id, v) FROM stdin;\n3\tc\n\\.\n")
    back = read_pg_dump(spark, str(d))["t"]
    assert {(r.id, r.v) for r in back.collect()} == {
        (1, "a"), (2, "b"), (3, "c")}


def test_pg_missing_terminator_raises(spark, tmp_path):
    path = _write(tmp_path, "trunc.sql", textwrap.dedent("""\
        CREATE TABLE public.t (
            id bigint NOT NULL
        );
        COPY public.t (id) FROM stdin;
        1
        """))
    with pytest.raises(ValueError, match="no .. terminator"):
        read_pg_dump(spark, path)


def test_pg_raw_mode_skips_cast(spark, tmp_path):
    path = _write(tmp_path, "raw.sql", textwrap.dedent("""\
        CREATE TABLE public.t (
            id bigint NOT NULL
        );
        COPY public.t (id) FROM stdin;
        7
        \\.
        """))
    back = read_pg_dump(spark, path, typed=False)["t"]
    assert dict(back.dtypes) == {"id": "string"}
    assert [r.id for r in back.collect()] == ["7"]


# --- dialect sniff + cross-dialect sync ---------------------------------------

PG_PROD = textwrap.dedent("""\
    --
    -- PostgreSQL database dump
    --

    CREATE TABLE public.t (
        id bigint NOT NULL,
        v text
    );

    COPY public.t (id, v) FROM stdin;
    1\tkeep
    2\tnew
    3\tadded
    \\.

    ALTER TABLE ONLY public.t
        ADD CONSTRAINT t_pkey PRIMARY KEY (id);
    """)

MY_BACKUP = textwrap.dedent("""\
    CREATE TABLE `t` (
      `id` int(11) NOT NULL,
      `v` varchar(100) DEFAULT NULL,
      PRIMARY KEY (`id`)
    ) ENGINE=InnoDB;
    INSERT INTO `t` (`id`, `v`) VALUES (1,'keep'),(2,'old'),(4,'gone');
    """)


def test_sniff_dump_dialect(tmp_path):
    from database_syncer_spark.sources.pg_dump import sniff_dump_dialect

    pg = _write(tmp_path, "p.sql", PG_PROD)
    my = _write(tmp_path, "m.sql", MY_BACKUP)
    assert sniff_dump_dialect(pg) == "postgres"
    assert sniff_dump_dialect(my) == "mysql"
    # sharded dir: sniffs the first file
    d = tmp_path / "shards"
    d.mkdir()
    (d / "part-000.sql").write_text(PG_PROD)
    assert sniff_dump_dialect(str(d)) == "postgres"


def test_pg_schemas_pk_from_post_data_alter(spark, tmp_path):
    from database_syncer_spark.sources.pg_dump import read_pg_dump_with_schemas

    path = _write(tmp_path, "p.sql", PG_PROD)
    _, schemas = read_pg_dump_with_schemas(spark, path)
    assert schemas["t"].pk_cols == ["id"]
    assert schemas["t"].column_names == ["id", "v"]


def test_cross_dialect_sync_pg_prod_mysql_backup(spark, tmp_path, capsys):
    """compare_sql_files auto-detects a pg production dump against a
    mysql backup and runs the shared diff core: UPDATE (2: old->new),
    INSERT (3), DELETE (4) — the backup's int PK is cast to the prod
    side's bigint so type drift alone never classifies rows as
    changed."""
    from database_syncer_spark.sources.dump import compare_sql_files

    prod = _write(tmp_path, "prod.sql", PG_PROD)
    backup = _write(tmp_path, "backup.sql", MY_BACKUP)
    out = str(tmp_path / "sync.sql")
    result = compare_sql_files(spark, prod, backup, out)
    assert result is not None
    assert result["table_stats"]["t"] == {
        "INSERT": 1, "UPDATE": 1, "DELETE": 1}
    script = open(out).read()
    assert "DELETE FROM `t` WHERE `id` = 4;" in script
    assert "'added'" in script and "'new'" in script
    assert "'keep'" not in script  # unchanged rows emit nothing


def test_sync_pg_to_mysql_key_does_not_leak_cache(spark, sf_dir):
    """The registry key discards sync_dumps' scripts consumer, so it
    must unpersist the changes frames it returns — before the r10-advice
    fix each bench warmup/rep leaked one MEMORY_AND_DISK copy per run."""
    from database_syncer_spark.queries.dump import sync_pg_to_mysql

    jsc = spark.sparkContext._jsc
    sync_pg_to_mysql(spark, sf_dir).count()
    # the mysql reader's statement-frame cache legitimately survives
    # (identical plan -> CacheManager dedupes it across runs); what must
    # NOT happen is per-run growth from the persisted changes frames
    after_first = jsc.getPersistentRDDs().size()
    for _ in range(2):
        sync_pg_to_mysql(spark, sf_dir).count()
    assert jsc.getPersistentRDDs().size() == after_first


def test_cross_dialect_sync_last_wins(spark, tmp_path):
    """A duplicate PK on the mysql side of a cross-dialect sync
    resolves last-INSERT-wins (the reader's dedup_pk, reference
    sync.py:67) BEFORE the diff classifies — id 2's final 'new' value
    equals prod, so no change row surfaces. (The r10 fused variant that
    moved this resolution inside the diff was A/B-rejected for the
    cross-dialect shape — _sync_dumps_cross_dialect docstring — so this
    pins the semantics, not the plan shape.)"""
    from database_syncer_spark.sources.dump import sync_dumps

    my_dup = MY_BACKUP.replace(
        "VALUES (1,'keep'),(2,'old'),(4,'gone');",
        "VALUES (1,'keep'),(2,'stale'),(4,'gone');\n"
        "INSERT INTO `t` (`id`, `v`) VALUES (2,'new');")
    prod = _write(tmp_path, "prod.sql", PG_PROD)
    backup = _write(tmp_path, "backup.sql", my_dup)
    changes, _, _, _ = sync_dumps(spark, prod, backup)
    got = {r.id: r.change_type for r in changes["t"].collect()}
    # id 2: prod 'new' vs last-wins backup 'new' -> unchanged, absent
    assert got == {3: "INSERT", 4: "DELETE"}
    changes["t"].unpersist()
