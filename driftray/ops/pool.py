"""Actor-pool sizing for stateful ``map_batches`` stages.

Stateful stages (compiled regexes, broadcast lookups, codec state) run as
autoscaling actor pools.  A hard ``(1, 4)`` cap — the repo's original
default — starves 28 of a 32-CPU node's cores whenever such a stage is
the bottleneck, and far more on a multi-node cluster.  ``actor_pool()``
keeps the scale-to-zero-ish lower bound (small inputs spawn one actor and
stop) but lets the pool grow to the CLUSTER's CPU count under backlog.
Stages whose per-actor state is genuinely heavy (e.g. a model) should
still pass an explicit cap.
"""

from __future__ import annotations

import os


def actor_pool(min_actors: int = 1,
               max_actors: int | None = None) -> tuple[int, int]:
    """(min, max) for ``map_batches(Cls, concurrency=...)``: max tracks
    the cluster CPU count (fallback: host CPUs) unless given."""
    if max_actors is None:
        cpus = 0
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            cpus = 0
        if cpus <= 0:
            cpus = os.cpu_count() or 4
        # never exceed the cluster CPU count: pending unschedulable actors
        # and autoscaler churn at small clusters cost more than they give
        max_actors = cpus
    return (min_actors, max(min_actors, max_actors))
