from .compaction import compact, plan_bins

__all__ = ["compact", "plan_bins"]
