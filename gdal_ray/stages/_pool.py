"""Actor-pool sizing helper.

An int ``concurrency=n`` is mapped to the autoscaling pool ``(1, n)``:
a fixed-size pool of n actors reserves n CPUs up front, which can
deadlock the streaming executor when upstream shuffle tasks need CPUs
on a small cluster (the pool starves its own producers).  With
``(1, n)`` the pool starts at one actor and scales only while spare
resources exist — on a big cluster it still reaches n.

``concurrency=None`` (the default everywhere) derives the pool bound
from the live cluster: max = CPUs-2 (leave room for producer tasks),
min = max//4 (pre-start a quarter so short stages don't crawl on one
slowly-ramping actor).  Pinning a small int (the round-1 mistake —
``concurrency=2`` at 32 CPUs) starves the stage at every cluster size.
"""

from __future__ import annotations

import os


def cluster_cpus() -> int:
    """CPUs visible to the current Ray cluster (fallback: host count)."""
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 4)
    except Exception:
        pass
    return os.cpu_count() or 4


def autoscale(concurrency=None):
    """None → cluster-derived (max(1, (cpus-2)//4), cpus-2);
    int n → (max(1, n//2), n); tuples pass through unchanged."""
    if concurrency is None:
        n = max(2, cluster_cpus() - 2)
        return (max(1, n // 4), n)
    if isinstance(concurrency, int):
        n = max(1, concurrency)
        return (max(1, n // 2), n)
    return concurrency
