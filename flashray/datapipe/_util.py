"""Shared datapipe helpers."""

from __future__ import annotations


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size to the session: a pool of exactly
    session-CPU actors reserves every CPU and starves the upstream read /
    downstream shuffle tasks — a deadlock on small sessions (observed at
    num_cpus=4, concurrency=4). Leave 2 CPUs of headroom."""
    import ray

    if not ray.is_initialized():
        return max(1, requested)
    total = int(ray.cluster_resources().get("CPU", requested))
    return max(1, min(requested, total - 2))
