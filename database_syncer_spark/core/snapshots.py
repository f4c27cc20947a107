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


def derive_next_version(prod: DataFrame, pk_col: str,
                        mutate_col: str) -> DataFrame:
    """A SECOND deterministic evolution of ``prod`` (call it v2, where
    ``derive_backup`` gives the prior v0 and prod itself is v1), chosen
    so the two consecutive CDC batches overlap in every interesting way
    for log compaction:

    - ``pk % 10 == 0`` rows get ``mutate_col + 1``  -> UPDATEs; the
      ``pk % 20 == 0`` half of them were v0->v1 INSERTs (I then U)
    - ``pk % 40 == 20`` rows removed -> I then D (annihilates)
    - ``pk % 20 == 13`` rows removed -> all were v0->v1 UPDATEs
      (13 % 10 == 3), so U then D
    - extras keyed ``-(pk + 1_000_000_000)`` for ``pk % 30 == 0`` ->
      fresh INSERTs (collision-proof: fixture keys are positive and far
      below 1e9... negated-plus-offset keys collide with nothing)
    - extras keyed ``-pk`` for ``pk % 50 == 0`` -> re-INSERT of rows the
      v0->v1 batch DELETED (D then I)
    """
    pk = F.col(pk_col)
    mutated = prod.withColumn(
        mutate_col,
        F.when(pk % 10 == 0, F.col(mutate_col) + F.lit(1))
        .otherwise(F.col(mutate_col)))
    kept = mutated.where(~((pk % 20 == 13) | (pk % 40 == 20)))
    extra_new = (prod.where((pk % 30 == 0) & (pk > 0))
                 .withColumn(pk_col, -(pk + F.lit(1_000_000_000))))
    extra_back = (prod.where((pk % 50 == 0) & (pk > 0))
                  .withColumn(pk_col, -pk))
    return kept.unionByName(extra_new).unionByName(extra_back)


def derive_next_version_sql(table: str, pk_col: str, mutate_col: str,
                            all_cols: list[str]) -> str:
    """ANSI SQL producing the identical v2 snapshot (DuckDB oracle)."""
    mutated_cols = ", ".join(
        f"CASE WHEN {pk_col} % 10 = 0 THEN {c} + 1 ELSE {c} END AS {c}"
        if c == mutate_col else c
        for c in all_cols
    )
    new_cols = ", ".join(
        f"-({pk_col} + 1000000000) AS {pk_col}" if c == pk_col else c
        for c in all_cols
    )
    back_cols = ", ".join(
        f"-{pk_col} AS {pk_col}" if c == pk_col else c
        for c in all_cols
    )
    return (
        f"SELECT {mutated_cols} FROM {table} "
        f"WHERE NOT ({pk_col} % 20 = 13 OR {pk_col} % 40 = 20) "
        f"UNION ALL SELECT {new_cols} FROM {table} "
        f"WHERE {pk_col} % 30 = 0 AND {pk_col} > 0 "
        f"UNION ALL SELECT {back_cols} FROM {table} "
        f"WHERE {pk_col} % 50 = 0 AND {pk_col} > 0"
    )


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
