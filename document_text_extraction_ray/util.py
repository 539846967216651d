"""Small shared utilities."""

from __future__ import annotations


def pool_size(requested: int | None = None, headroom: int = 2) -> int:
    """Clamp an actor-pool size so it can never reserve every cluster CPU.

    A pool sized >= total CPUs starves the upstream read / downstream write
    tasks (observed as a full pipeline deadlock on a 4-CPU session).  Always
    leave ``headroom`` CPUs for the stateless stages."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    cap = max(1, total - headroom)
    if requested is None:
        return cap
    return max(1, min(requested, cap))
