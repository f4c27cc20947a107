from database_syncer_spark.sources.dump import (
    read_sql_dump,
    read_dump_statements,
    parse_create_table,
    tokenize_insert_rows,
    write_sql_dump,
    sync_dumps,
)

__all__ = [
    "read_sql_dump",
    "read_dump_statements",
    "parse_create_table",
    "tokenize_insert_rows",
    "write_sql_dump",
    "sync_dumps",
]
