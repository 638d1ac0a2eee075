from .append import append_dataset
from .compaction import compact, plan_bins
from .expire import expire_snapshots
from .merge import merge_into
from .protocol import MaintenanceOp, run_op
from .zorder import cluster, hilbert_d, interleave_bits

__all__ = [
    "append_dataset",
    "compact",
    "plan_bins",
    "expire_snapshots",
    "merge_into",
    "cluster",
    "hilbert_d",
    "interleave_bits",
    "MaintenanceOp",
    "run_op",
]
