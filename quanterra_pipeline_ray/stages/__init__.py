from .append import append_dataset
from .changelog import changelog
from .delete import delete_where
from .deletevec import delete_where_vector
from .compaction import CompactionOp, compact, plan_bins
from .evolve import drop_column, evolve_schema, rename_column
from .incremental import conv_counts, incremental_conv_counts
from .textindex import (
    StaleTextIndexError,
    build_text_index,
    extend_text_index,
    search_token,
)
from .expire import expire_snapshots, sweep_orphans
from .merge import merge_into
from .protocol import MaintenanceOp, run_op
from .spec import partition_spec_of, set_partition_spec
from .streaming import WatermarkWindower, windowed_counts
from .zorder import cluster, hilbert_d, interleave_bits

__all__ = [
    "append_dataset",
    "changelog",
    "delete_where",
    "delete_where_vector",
    "compact",
    "CompactionOp",
    "plan_bins",
    "evolve_schema",
    "rename_column",
    "drop_column",
    "conv_counts",
    "incremental_conv_counts",
    "build_text_index",
    "extend_text_index",
    "StaleTextIndexError",
    "search_token",
    "expire_snapshots",
    "sweep_orphans",
    "merge_into",
    "cluster",
    "hilbert_d",
    "interleave_bits",
    "set_partition_spec",
    "partition_spec_of",
    "MaintenanceOp",
    "run_op",
    "WatermarkWindower",
    "windowed_counts",
]
