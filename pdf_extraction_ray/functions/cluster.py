"""Cluster-sizing helpers shared by every stage that builds an actor pool."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    import ray
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def half_pool() -> tuple[int, int]:
    """Autoscaling pool bounds for secondary actor stages: min 1 (never
    starve small sessions), max half the cluster."""
    return (1, max(2, cluster_cpus() // 2))
