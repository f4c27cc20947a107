"""Deterministic snapshot derivation for diff testing & the driver oracle.

FIXTURES.md §B1 asks for prod/backup snapshot pairs with known change sets.
We derive ``backup`` from any keyed fixture table with pure modular
arithmetic on the PK so the exact same derivation is expressible in the
DuckDB oracle SQL (see registry.py) — no files written, no randomness.

Given prod = the fixture table, backup =
- rows with ``pk % 20 == 0`` removed            -> these become INSERTs
- ``pk % 10 == 3`` rows get ``mutate_col + 1``  -> these become UPDATEs
- extra rows keyed ``-pk`` appended              -> these become DELETEs

The extras are keyed on the NEGATED pk (fixture keys are positive), so
the synthetic keys can NEVER collide with real ones at any scale —
unlike an additive offset, which real keys overtake once the table
outgrows it (the +10M form this replaced was invalid at the 30M/60M-row
head-to-head sizes, same hazard class as diff_composite_pk's r2 fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    # pk > 0 guard: -0 == 0 would collide with a real key-0 row.
    extra = (
        prod.where((pk % 25 == 0) & (pk > 0))
        .withColumn(pk_col, -pk)
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
        f"-{pk_col} AS {pk_col}" if c == pk_col else c
        for c in all_cols
    )
    return (
        f"SELECT {mutated_cols} FROM {table} WHERE {pk_col} % 20 <> 0 "
        f"UNION ALL SELECT {extra_cols} FROM {table} "
        f"WHERE {pk_col} % 25 = 0 AND {pk_col} > 0"
    )
