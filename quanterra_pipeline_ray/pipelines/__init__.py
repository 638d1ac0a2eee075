from .maintenance import (
    MaintenanceReport,
    build_fragmented_table,
    default_merge_source,
    run_maintenance,
)

__all__ = [
    "MaintenanceReport",
    "build_fragmented_table",
    "default_merge_source",
    "run_maintenance",
]
