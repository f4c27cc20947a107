"""database_syncer_spark — a PySpark-native analytics & snapshot-sync engine.

Built from scratch with the query and data-processing capabilities of the
reference tool higokul99/database-syncer (a SQL-dump diff/sync generator,
/root/reference/sync.py), re-expressed Spark-first:

- typed DataFrames instead of regex-parsed string dicts,
- a single full-outer-join change classifier instead of Python hash probes
  (reference: sync.py:256-300),
- ordered sync-script and CDC sinks (reference: sync.py:304-437),
- Structured-Streaming incremental sync,
- an extended relational operator surface plus LLM-data-pipeline operators
  (dedup, similarity search, multimodal columns, text analysis),

all designed for multi-executor scale (broadcast hints for dims, AQE,
partition-count discipline) even though tests run on local mode.
"""

from database_syncer_spark.session import get_spark
from database_syncer_spark.catalog import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
