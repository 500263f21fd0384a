"""Small shared helpers."""

from __future__ import annotations


def _pool(concurrency):
    """Actor-pool sizing: an int becomes an autoscaling ``(1, n)`` pool.

    A fixed-size pool (bare int) demands exactly n actors; on a cluster
    whose CPU budget is already reserved by other operators that demand can
    deadlock the streaming executor. ``(1, n)`` starts work with one actor
    and scales up only while CPUs are actually available.
    """
    if isinstance(concurrency, int):
        return (1, max(1, concurrency))
    return concurrency
