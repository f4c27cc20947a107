"""CLI entry point — the reference's ``main()`` (sync.py:629-642) on Spark.

Usage (defaults match the reference):
    python -m database_syncer_spark [prod.sql] [backup.sql] [out.sql]
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    production = argv[0] if len(argv) > 0 else "prod.sql"
    backup = argv[1] if len(argv) > 1 else "backup.sql"
    output = argv[2] if len(argv) > 2 else "database_sync_crud.sql"

    from database_syncer_spark.session import get_spark
    from database_syncer_spark.sources.dump import compare_sql_files

    spark = get_spark("database-syncer")
    result = compare_sql_files(spark, production, backup, output)
    return 0 if result is not None else 1


if __name__ == "__main__":
    raise SystemExit(main())
