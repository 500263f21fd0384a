"""Small shared helpers."""

from __future__ import annotations


def _pool(concurrency):
    """Actor-pool sizing.

    - ``None`` → autoscale ``(1, cluster CPUs)``: the right default because
      Ray Data fuses adjacent ``map_batches`` into one operator, and a small
      fixed cap on the *last* stage caps the whole fused chain.
    - an int → autoscaling ``(1, n)`` pool. A fixed-size pool (bare int
      passed straight to map_batches) demands exactly n actors, which can
      deadlock the streaming executor when other operators hold the CPU
      budget.
    - a tuple passes through.
    """
    if concurrency is None:
        try:
            import ray
            n = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            n = 4
        return (1, max(1, n))
    if isinstance(concurrency, int):
        return (1, max(1, concurrency))
    return concurrency
