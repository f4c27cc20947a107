"""Local DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate (__spark_entry__.py contract): for a
query key, run the Spark query and the oracle SQL on the same parquet
fixtures and compare row count, sorted column names, and an
order-insensitive canonical value multiset. Used by
tests/test_oracle_parity.py so drift is caught locally before the driver
round runs at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from database_syncer_spark.catalog import TABLE_NAMES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def canon_value(v, float_dp: int | None = None) -> str:
    """Canonical string for a cell value, tolerant of engine type width."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if float_dp is not None:
            v = round(v, float_dp)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x, float_dp) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k], float_dp)}" for k in sorted(v)) + "}"
    import decimal
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon_value(f, float_dp)
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple],
               float_dp: int | None = None) -> list[str]:
    """Sort columns by name, render rows canonically, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(canon_value(row[i], float_dp) for i in order) for row in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    key: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    mismatches: list[str] = field(default_factory=list)

    def message(self) -> str:
        if self.ok:
            return f"{self.key}: OK ({self.spark_rows} rows)"
        lines = [
            f"{self.key}: MISMATCH",
            f"  rows spark={self.spark_rows} oracle={self.oracle_rows}",
            f"  cols spark={sorted(self.spark_cols)} oracle={sorted(self.oracle_cols)}",
        ]
        lines.extend("  " + m for m in self.mismatches[:10])
        return "\n".join(lines)


def _arrow_class(t) -> str:
    """Coarse type class of an Arrow type, for width-compat checking."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "struct"
    return str(t)


_SPARK_CLASS = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float", "string": "string",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "date",
    "boolean": "bool", "binary": "binary",
}


def _spark_class(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "decimal"
    if dtype.startswith(("array", "map")):
        return "list" if dtype.startswith("array") else "struct"
    if dtype.startswith("struct"):
        return "struct"
    return _SPARK_CLASS.get(dtype, dtype)


def type_mismatches(spark_df, con: duckdb.DuckDBPyConnection,
                    oracle_sql: str) -> list[str]:
    """Column-level type-CLASS differences between the Spark result and the
    DuckDB oracle result (fetched as Arrow, which is how a pandas-based
    value-hash sees the data). An uncast DuckDB ``sum(int)`` is HUGEINT →
    Arrow decimal128(38,0) → pandas float/object — hash-differs from
    Spark's int64 even when every value is equal. Caught the round-1
    ``agg_mode_histogram`` / ``tpch_q12_priority_classes`` driver failures."""
    tbl = con.execute(oracle_sql).arrow()
    oclass = {f.name: _arrow_class(f.type) for f in tbl.schema}
    out = []
    for name, dtype in spark_df.dtypes:
        if name in oclass:
            sc = _spark_class(dtype)
            if sc != oclass[name]:
                out.append(
                    f"type-class mismatch col={name}: spark={dtype}({sc}) "
                    f"oracle_arrow={oclass[name]}")
    return out


def compare_query(key: str, spark_df, con: duckdb.DuckDBPyConnection,
                  oracle_sql: str, float_dp: int | None = None) -> CompareResult:
    srows = spark_df.collect()
    scols = spark_df.columns
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    res = CompareResult(
        key=key, ok=True,
        spark_rows=len(srows), oracle_rows=len(orows),
        spark_cols=scols, oracle_cols=ocols,
    )
    if sorted(scols) != sorted(ocols):
        res.ok = False
        res.mismatches.append("column-name sets differ")
        return res
    tmm = type_mismatches(spark_df, con, oracle_sql)
    if tmm:
        res.ok = False
        res.mismatches.extend(tmm)
        return res
    if len(srows) != len(orows):
        res.ok = False
        res.mismatches.append("row counts differ")
        return res
    sc = canon_rows(scols, [tuple(r) for r in srows], float_dp)
    oc = canon_rows(ocols, orows, float_dp)
    if sc != oc:
        res.ok = False
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
        for a, b in diffs[:5]:
            res.mismatches.append(f"spark={a!r} oracle={b!r}")
        res.mismatches.append(f"{len(diffs)} differing canonical rows")
    return res
