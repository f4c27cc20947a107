from database_syncer_spark.core.diff import (
    snapshot_diff,
    diff_stats,
    catalog_diff,
    apply_changes,
)
from database_syncer_spark.core.script import generate_sync_script
from database_syncer_spark.core.snapshots import derive_backup

__all__ = [
    "snapshot_diff",
    "diff_stats",
    "catalog_diff",
    "apply_changes",
    "generate_sync_script",
    "derive_backup",
]
