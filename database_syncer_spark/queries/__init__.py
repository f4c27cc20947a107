"""Query-key registry modules.

Each module defines two dicts keyed by SURVEY.md §2 Part-B query key:

- ``QUERIES``: key -> Callable[(SparkSession, sf_dir str), DataFrame]
- ``ORACLES``: key -> equivalent ANSI SQL string for DuckDB (omitted for
  non-SQL-expressible ops; those get the driver's rows-only check).

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before value-hashing (__spark_entry__.py contract).
"""
