"""Deterministic snapshot derivation for diff testing & the driver oracle.

FIXTURES.md §B1 asks for prod/backup snapshot pairs with known change sets.
We derive ``backup`` from any keyed fixture table with pure modular
arithmetic on the PK so the exact same derivation is expressible in the
DuckDB oracle SQL (see registry.py) — no files written, no randomness.

Given prod = the fixture table, backup =
- rows with ``pk % 20 == 0`` removed            -> these become INSERTs
- ``pk % 10 == 3`` rows get ``mutate_col + 1``  -> these become UPDATEs
- extra rows with ``pk + offset`` appended       -> these become DELETEs
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEW_PK_OFFSET = 10_000_000


def derive_backup(prod: DataFrame, pk_col: str, mutate_col: str) -> DataFrame:
    """Derive the deterministic backup snapshot described above."""
    pk = F.col(pk_col)
    kept = (
        prod.where(pk % 20 != 0)
        .withColumn(
            mutate_col,
            F.when(pk % 10 == 3, F.col(mutate_col) + F.lit(1.0))
            .otherwise(F.col(mutate_col)),
        )
    )
    extra = (
        prod.where(pk % 25 == 0)
        .withColumn(pk_col, pk + F.lit(NEW_PK_OFFSET))
    )
    return kept.unionByName(extra)


def derive_backup_sql(table: str, pk_col: str, mutate_col: str,
                      all_cols: list[str]) -> str:
    """ANSI SQL producing the identical backup snapshot (DuckDB oracle)."""
    mutated_cols = ", ".join(
        f"CASE WHEN {pk_col} % 10 = 3 THEN {c} + 1.0 ELSE {c} END AS {c}"
        if c == mutate_col else c
        for c in all_cols
    )
    extra_cols = ", ".join(
        f"{pk_col} + {NEW_PK_OFFSET} AS {pk_col}" if c == pk_col else c
        for c in all_cols
    )
    return (
        f"SELECT {mutated_cols} FROM {table} WHERE {pk_col} % 20 <> 0 "
        f"UNION ALL SELECT {extra_cols} FROM {table} WHERE {pk_col} % 25 = 0"
    )
