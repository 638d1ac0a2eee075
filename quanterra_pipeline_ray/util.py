"""Small shared runtime utilities."""

from __future__ import annotations


def pool_size(requested: int, pools_in_pipeline: int = 1, reserve: int = 2) -> int:
    """Clamp an actor-pool size so all pools in a pipeline plus ``reserve``
    task slots fit the cluster.

    A pool that reserves every CPU starves interposed task stages (reads,
    filters, shuffles) and live-locks the streaming executor — observed in
    this sandbox whenever pool CPUs == cluster CPUs.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    budget = max(1, (cpus - reserve) // max(1, pools_in_pipeline))
    return max(1, min(requested, budget))
