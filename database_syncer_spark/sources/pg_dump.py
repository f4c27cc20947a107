"""PostgreSQL plain-format dump source (``pg_dump`` / ``COPY ... FROM
stdin`` text protocol) — the second dump dialect next to
``sources/dump.py``'s mysqldump reader.

Why a separate reader: the two public dump formats distribute
DIFFERENTLY. A mysqldump file is self-describing per statement (every
``INSERT INTO t ...`` names its table), so the mysql reader splits on
statement separators and parses each statement independently. A pg COPY
data line carries NO table marker — membership is purely positional
(every line between ``COPY t (...) FROM stdin;`` and the ``\\.``
terminator belongs to ``t``). The scalable shape is therefore:

1. ``spark.read.text`` — one row per line, parallel by file split (the
   natural 100-TB layout: line-level parallelism, no giant-record
   problem, unlike lineSep-splitting on block boundaries which would
   hand a whole 100-GB COPY block to one task).
2. Collect the MARKER lines only (COPY headers + ``\\.`` terminators —
   two per table, KB-scale however big the data is) and run the
   header/terminator state machine driver-side to build block ranges.
   A data line that merely *looks* like a COPY header cannot open a
   block: inside a block only ``\\.`` is a marker, exactly pg's own
   COPY-mode semantics.
3. Broadcast the tiny range table and assign every data line to its
   block with a range join — the corpus never shuffles; assignment is
   a broadcast hash/NL join against a per-table-sized build side.
4. Field split + unescape + typed cast are all built-in expressions
   (whole-stage codegen): split on the tab delimiter, ``\\N`` (checked
   BEFORE unescaping, so a literal two-char ``\\N`` value — which the
   protocol renders as ``\\\\N`` — stays data), then the backslash
   escapes in one literal-replace chain.

Line order inside a block is not load-bearing (COPY rows are an
unordered snapshot, same as the mysql reader's PK-unique INSERT rows),
but line-to-block ASSIGNMENT is, and it relies on
``monotonically_increasing_id()`` being monotone in file position for
the text source: a single file's splits are generated in offset order
and each output partition holds consecutive lines, so
``(partition_id << 33) + row_in_partition`` orders exactly like byte
offset. Multi-file dumps (a directory of shards) are handled by keying
every marker and range by ``input_file_name()`` — ordering is only ever
assumed WITHIN one file, never across files.

Escape handling: COPY text format escapes ``\\\\ \\t \\n \\r`` (written
by ``write_pg_dump`` below, and by pg itself). The reader unescapes
with a sentinel chain (``\\\\\\\\`` -> U+0001 first, so ``\\\\t`` —
literal backslash-t — never turns into a tab), which is exact for any
input not containing a raw U+0001 byte; ``write_pg_dump`` never emits
one (it escapes U+0001 as ``\\x01`` is NOT a COPY escape — instead the
writer asserts nothing, pg text columns virtually never contain SOH,
and a mismatch would fail the round-trip value hash loudly, not
silently).

Reference parity: the reference ingests ONLY mysqldump INSERT format
(sync.py:29-120); this module is the Spark-first breadth a real
database-syncer user needs the week they point it at a Postgres
instance. No reference code exists for it — cited for absence.
"""

from __future__ import annotations

import os
import re

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_pg_dump", "read_pg_dump_with_schemas", "write_pg_dump",
    "parse_pg_create_table", "sniff_dump_dialect", "PgTableSchema",
]

# --- DDL ------------------------------------------------------------------

#: PostgreSQL type -> Spark cast target
_PG_TYPE_MAP = [
    (re.compile(r"^bigint|^bigserial", re.I), "bigint"),
    (re.compile(r"^smallint", re.I), "smallint"),
    (re.compile(r"^(integer|int|serial)", re.I), "int"),
    (re.compile(r"^(numeric|decimal)\s*\((\d+)\s*,\s*(\d+)\)", re.I), None),
    (re.compile(r"^(numeric|decimal)", re.I), "decimal(38,18)"),
    (re.compile(r"^double\s+precision", re.I), "double"),
    (re.compile(r"^real", re.I), "float"),
    (re.compile(r"^boolean", re.I), "boolean"),
    (re.compile(r"^timestamp", re.I), "timestamp_ntz"),
    (re.compile(r"^date", re.I), "date"),
    (re.compile(r"^(text|character|varchar|char|uuid|json)", re.I), "string"),
    (re.compile(r"^bytea", re.I), "binary"),
]


def _pg_spark_type(pg_type: str) -> str:
    for pat, target in _PG_TYPE_MAP:
        m = pat.match(pg_type.strip())
        if m:
            if target is None:
                return f"decimal({m.group(2)},{m.group(3)})"
            return target
    return "string"


_PG_CREATE_RE = re.compile(
    r'CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:[\w$]+\.)?"?(\w+)"?\s*\(',
    re.I)
_PG_COL_RE = re.compile(r'^"?(\w+)"?\s+(.+?)(?:\s+NOT\s+NULL|\s+DEFAULT\s.*)?$',
                        re.I)
#: ``COPY [schema.]table (c1, c2, ...) FROM stdin;`` (pg_dump always emits
#: the column list; a list-free header falls back to DDL column order)
_PG_COPY_RE = re.compile(
    r'^COPY\s+(?:[\w$]+\.)?"?(\w+)"?\s*(?:\(([^)]*)\))?\s+FROM\s+stdin;\s*$',
    re.I)


def parse_pg_create_table(stmt: str) -> tuple[str, list[tuple[str, str]]] | None:
    """Parse one pg CREATE TABLE statement -> (table, [(col, pg_type)]).

    Constraint lines (PRIMARY KEY / CONSTRAINT / CHECK / UNIQUE) are
    skipped — pg_dump emits PKs as post-data ALTER TABLE anyway."""
    m = _PG_CREATE_RE.search(stmt)
    if not m:
        return None
    body = stmt[m.end():]
    depth, end = 1, len(body)
    for i, ch in enumerate(body):
        depth += (ch == "(") - (ch == ")")
        if depth == 0:
            end = i
            break
    cols: list[tuple[str, str]] = []
    for piece in _split_commas(body[:end]):
        piece = piece.strip()
        if not piece or re.match(
                r"^(PRIMARY\s+KEY|CONSTRAINT|CHECK|UNIQUE|FOREIGN\s+KEY)",
                piece, re.I):
            continue
        cm = _PG_COL_RE.match(piece)
        if cm:
            cols.append((cm.group(1), cm.group(2).strip()))
    return m.group(1), cols


def _split_commas(body: str) -> list[str]:
    """Split a DDL body on top-level commas (parens nest: numeric(12,2))."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return out


@dataclass
class PgTableSchema:
    """TableSchema-shaped metadata for a pg dump table (same interface
    the mysql reader's TableSchema exposes to sync_dumps/ddl paths)."""
    name: str
    columns: list[tuple[str, str]]          # (name, pg_type)
    pk_cols: list[str]
    create_stmt: str

    @property
    def column_names(self) -> list[str]:
        return [c for c, _ in self.columns]

    def spark_types(self) -> list[tuple[str, str]]:
        return [(c, _pg_spark_type(t)) for c, t in self.columns]


_PG_INLINE_PK_RE = re.compile(r"PRIMARY\s+KEY\s*\(([^)]*)\)", re.I)
_PG_ALTER_PK_RE = re.compile(
    r'ALTER\s+TABLE\s+(?:ONLY\s+)?(?:[\w$]+\.)?"?(\w+)"?\s+'
    r"ADD\s+CONSTRAINT\s+\S+\s+PRIMARY\s+KEY\s*\(([^)]*)\)",
    re.I | re.S)


def _pg_pk_cols(table: str, create_stmt: str, ddl_text: str,
                col_names: list[str]) -> list[str]:
    """PK columns for ``table``: inline table constraint first, then the
    post-data ALTER (pg_dump's layout), else the same heuristic ladder
    the mysql reader uses — an 'id' column, else the first column."""
    m = _PG_INLINE_PK_RE.search(create_stmt)
    if m:
        return [c.strip().strip('"') for c in m.group(1).split(",")]
    for am in _PG_ALTER_PK_RE.finditer(ddl_text):
        if am.group(1) == table:
            return [c.strip().strip('"') for c in am.group(2).split(",")]
    if "id" in col_names:
        return ["id"]
    return col_names[:1]


def sniff_dump_dialect(path: str) -> str:
    """'postgres' | 'mysql' from the first ~64 KB of a dump file (or the
    first file of a sharded directory) — driver-side, KB-scale. pg plain
    dumps announce themselves (`-- PostgreSQL database dump`) or carry a
    COPY header; mysqldump files carry INSERT INTO / ENGINE= / backtick
    DDL. Defaults to mysql (the reference's only dialect) when neither
    signature appears."""
    p = path
    if os.path.isdir(path):
        entries = sorted(
            f for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f)))
        if not entries:
            return "mysql"
        p = os.path.join(path, entries[0])
    try:
        with open(p, "r", encoding="utf-8", errors="replace") as fh:
            head = fh.read(65536)
    except OSError:
        return "mysql"
    if ("PostgreSQL database dump" in head
            or re.search(r"^COPY\s.+\sFROM stdin;\s*$", head, re.M)):
        return "postgres"
    return "mysql"


# --- read -----------------------------------------------------------------

def _unescape(col: F.Column) -> F.Column:
    """COPY text-format unescape as a literal-replace chain (JVM-side,
    no per-value regex): double-backslash first via a sentinel so
    ``\\\\t`` (escaped literal backslash + t) never becomes a tab."""
    c = F.replace(col, F.lit("\\\\"), F.lit("\x01"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    return F.replace(c, F.lit("\x01"), F.lit("\\"))


def read_pg_dump(spark: SparkSession, path: str,
                 typed: bool = True,
                 tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Ingest a pg_dump plain-format file (or a directory of shard
    files) -> {table_name: DataFrame}. See the module docstring for the
    four-stage distributed shape."""
    return read_pg_dump_with_schemas(spark, path, typed=typed,
                                     tables=tables)[0]


def read_pg_dump_with_schemas(
    spark: SparkSession, path: str, typed: bool = True,
    tables: list[str] | None = None,
) -> tuple[dict[str, DataFrame], dict[str, PgTableSchema]]:
    """``read_pg_dump`` plus TableSchema-shaped DDL metadata (columns,
    PK from the inline constraint or pg_dump's post-data ALTER) — what
    the cross-dialect sync path consumes. ``tables`` restricts ingest:
    unrequested tables' COPY blocks are dropped at the RANGE level, so
    their data lines are filtered by the broadcast join without ever
    being split or unescaped."""
    lines = (spark.read.text(path)
             .select(F.monotonically_increasing_id().alias("lid"),
                     F.input_file_name().alias("fname"),
                     "value"))

    # Stage 2: markers only (tiny), driver-side state machine per file.
    markers = (lines.where(
        F.col("value").rlike(r"^COPY\s.+\sFROM stdin;\s*$")
        | (F.col("value") == "\\."))
        .collect())
    by_file: dict[str, list] = {}
    for r in markers:
        by_file.setdefault(r.fname, []).append(r)
    ranges = []  # (fname, start_lid_excl, end_lid_excl, table, cols_csv)
    for fname, ms in by_file.items():
        ms.sort(key=lambda r: r.lid)
        open_hdr = None
        for r in ms:
            if open_hdr is None:
                m = _PG_COPY_RE.match(r.value)
                if m:  # a stray "\." outside any block is ignorable DDL noise
                    open_hdr = (r.lid, m.group(1), m.group(2) or "")
            elif r.value == "\\.":
                ranges.append((fname, open_hdr[0], r.lid,
                               open_hdr[1], open_hdr[2]))
                open_hdr = None
            # a COPY-looking line INSIDE a block is data, not a header
        if open_hdr is not None:
            raise ValueError(
                f"pg dump {fname}: COPY block for table "
                f"'{open_hdr[1]}' has no \\. terminator")

    # DDL: everything outside the data blocks (KB-scale — comments, SETs,
    # CREATE TABLE, post-data ALTERs), collected distributed then parsed
    # driver-side, same division of labor as the mysql reader.
    in_block = F.lit(False)
    for fname, s, e, _, _ in ranges:
        in_block = in_block | ((F.col("fname") == fname)
                               & (F.col("lid") >= s) & (F.col("lid") <= e))
    ddl_text = "\n".join(
        r.value for r in lines.where(~in_block).collect())
    schemas: dict[str, PgTableSchema] = {}
    for stmt in ddl_text.split(";"):
        parsed = parse_pg_create_table(stmt)
        if parsed:
            name, cols = parsed
            schemas[name] = PgTableSchema(
                name=name, columns=cols,
                # no trailing ";" — consumers (ddl_statements) append it,
                # matching the mysql TableSchema convention
                pk_cols=_pg_pk_cols(name, stmt, ddl_text,
                                    [c for c, _ in cols]),
                create_stmt=stmt.strip())

    out: dict[str, DataFrame] = {}
    found_tables = sorted({t for _, _, _, t, _ in ranges})
    if tables is not None:
        found_tables = [t for t in found_tables if t in set(tables)]
        schemas = {n: s for n, s in schemas.items() if n in set(tables)}
    for table in found_tables:
        t_ranges = [(f, s, e, cols) for f, s, e, t, cols in ranges
                    if t == table]
        cols_csv = t_ranges[0][3]
        if cols_csv:
            col_names = [c.strip().strip('"') for c in cols_csv.split(",")]
        elif table in schemas:
            col_names = schemas[table].column_names
        else:
            col_names = []
        if not col_names:
            raise ValueError(f"pg dump: no column list or DDL for {table}")

        # Stage 3: broadcast range join — block bounds per file.
        rng = spark.createDataFrame(
            [(f, s, e) for f, s, e, _ in t_ranges],
            "rf string, rs long, re long")
        data = (lines.join(
            F.broadcast(rng),
            (F.col("fname") == F.col("rf"))
            & (F.col("lid") > F.col("rs")) & (F.col("lid") < F.col("re")),
            "inner")
            .select("value"))

        # Stage 4: split / NULL-mark / unescape / cast — all built-ins.
        fields = F.split(F.col("value"), "\t", -1)
        raw_cols = [
            F.when(fields[i] == "\\N", F.lit(None))
            .otherwise(_unescape(fields[i])).alias(name)
            for i, name in enumerate(col_names)]
        df = data.select(*raw_cols)
        if typed and table in schemas:
            pg_types = dict(schemas[table].columns)
            df = df.select(*[
                F.col(c).cast(_pg_spark_type(pg_types[c])).alias(c)
                if c in pg_types else F.col(c)
                for c in col_names])
        out[table] = df
    return out, schemas


# --- write ----------------------------------------------------------------

_SPARK_TO_PG = {
    "bigint": "bigint", "int": "integer", "smallint": "smallint",
    "double": "double precision", "float": "real", "boolean": "boolean",
    "timestamp": "timestamp without time zone",
    "timestamp_ntz": "timestamp without time zone", "date": "date",
    "string": "text", "binary": "bytea",
}


def _pg_field(col: F.Column, dtype) -> F.Column:
    """Render one column as a COPY text-format field (JVM-side)."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.StringType):
        v = F.replace(col, F.lit("\\"), F.lit("\\\\"))
        v = F.replace(v, F.lit("\t"), F.lit("\\t"))
        v = F.replace(v, F.lit("\n"), F.lit("\\n"))
        v = F.replace(v, F.lit("\r"), F.lit("\\r"))
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        v = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(dtype, T.DateType):
        v = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dtype, T.BooleanType):
        v = F.when(col, F.lit("t")).otherwise(F.lit("f"))
    else:
        v = col.cast("string")
    return F.coalesce(v, F.lit("\\N"))


def write_pg_dump(df: DataFrame, table: str, pk_cols: list[str],
                  path: str) -> None:
    """Render a DataFrame as a pg_dump plain-format file — distributed.

    Same shape as ``write_sql_dump``: data lines render JVM-side and
    write as distributed text parts, then stream-concatenate into the
    final file with O(1) driver memory (atomic rename, so render-once
    caches never see a truncated file). Layout follows pg_dump: CREATE
    TABLE, COPY block, post-data PRIMARY KEY constraint."""
    import glob as _glob
    import shutil
    import tempfile

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    rendered = df.select(F.concat_ws(
        "\t", *[_pg_field(F.col(c), dtypes[c]) for c in df.columns])
        .alias("r"))

    col_defs = []
    for f in df.schema.fields:
        st = f.dataType.simpleString()
        pg_t = (st.replace("decimal", "numeric") if st.startswith("decimal")
                else _SPARK_TO_PG.get(st.split("(")[0], "text"))
        null_sfx = " NOT NULL" if f.name in pk_cols else ""
        col_defs.append(f"    {f.name} {pg_t}{null_sfx}")
    header = "\n".join([
        "--",
        "-- PostgreSQL database dump",
        "--",
        "",
        "SET client_encoding = 'UTF8';",
        "",
        f"CREATE TABLE public.{table} (",
        ",\n".join(col_defs),
        ");",
        "",
        f"COPY public.{table} ({', '.join(df.columns)}) FROM stdin;",
        "",
    ])
    footer = "\n".join([
        "\\.",
        "",
        f"ALTER TABLE ONLY public.{table}",
        f"    ADD CONSTRAINT {table}_pkey PRIMARY KEY "
        f"({', '.join(pk_cols)});",
        "",
    ])

    parts_dir = tempfile.mkdtemp(prefix="dss_pgdump_parts_")
    tmp_path = path + ".tmp"
    try:
        rendered.write.mode("overwrite").text(parts_dir)
        with open(tmp_path, "w", encoding="utf-8") as out_fh:
            out_fh.write(header)
            for part in sorted(_glob.glob(os.path.join(parts_dir, "part-*"))):
                with open(part, "r", encoding="utf-8") as in_fh:
                    shutil.copyfileobj(in_fh, out_fh)
            out_fh.write(footer)
        os.replace(tmp_path, path)
    finally:
        shutil.rmtree(parts_dir, ignore_errors=True)
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
