"""Actor-pool sizing helper.

An int ``concurrency=n`` is mapped to the autoscaling pool ``(1, n)``:
a fixed-size pool of n actors reserves n CPUs up front, which can
deadlock the streaming executor when upstream shuffle tasks need CPUs
on a small cluster (the pool starves its own producers).  With
``(1, n)`` the pool starts at one actor and scales only while spare
resources exist — on a big cluster it still reaches n.
"""

from __future__ import annotations


def autoscale(concurrency):
    """int n → (max(1, n//2), n); tuples and None pass through.

    min = n//2 pre-starts half the pool so short stages don't run on a
    single slowly-ramping actor, while still leaving CPUs for upstream
    producer tasks (min == num_cpus would starve them and deadlock)."""
    if isinstance(concurrency, int):
        n = max(1, concurrency)
        return (max(1, n // 2), n)
    return concurrency
