from .compaction import compact, plan_bins
from .expire import expire_snapshots
from .merge import merge_into
from .zorder import cluster, interleave_bits

__all__ = ["compact", "plan_bins", "expire_snapshots", "merge_into", "cluster", "interleave_bits"]
