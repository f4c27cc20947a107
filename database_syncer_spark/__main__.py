"""CLI entry point — the reference's ``main()`` (sync.py:629-642) on Spark.

Usage (positional defaults match the reference):
    python -m database_syncer_spark [prod.sql] [backup.sql] [out.sql]
                                    [--tables t1,t2]

``--tables``: sync only the named tables — the projection pushes into
both dump reads, so unrequested tables' DML is never tokenized.

Each input's dialect is auto-detected (mysqldump INSERT format or
PostgreSQL plain ``COPY`` format, sources/pg_dump.py:sniff_dump_dialect)
— mixed pairs sync cross-dialect through the shared diff core.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        try:
            tables = [t for t in argv[i + 1].split(",") if t]
        except IndexError:
            print("--tables requires a comma-separated list")
            return 2
        if not tables:
            # an empty list would "sync" nothing while reporting success
            # (e.g. --tables "$UNSET_VAR") — refuse instead
            print("--tables requires at least one table name")
            return 2
        del argv[i:i + 2]
    production = argv[0] if len(argv) > 0 else "prod.sql"
    backup = argv[1] if len(argv) > 1 else "backup.sql"
    output = argv[2] if len(argv) > 2 else "database_sync_crud.sql"

    from database_syncer_spark.session import get_spark
    from database_syncer_spark.sources.dump import compare_sql_files

    spark = get_spark("database-syncer")
    result = compare_sql_files(spark, production, backup, output,
                               tables=tables)
    return 0 if result is not None else 1


if __name__ == "__main__":
    raise SystemExit(main())
