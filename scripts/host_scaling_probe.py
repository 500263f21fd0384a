"""Host calibration probe for the scaling protocol (BENCH.md).

Measures how PER-CORE throughput of two reference workloads degrades as
process count grows on THIS host — separating engine scaling from
single-box artifacts that a multi-node cluster does not have:

- ``cpu``: L2-resident matmul loop (pure compute) — degradation here is
  clock/turbo/SMT, applies equally to any engine;
- ``mem``: streaming sweep over a 200 MB array (memory-bandwidth bound) —
  degradation here is the shared memory bus, which separate nodes don't
  share.

Usage: ``python scripts/host_scaling_probe.py [proc_counts...]``
Prints one JSON line per (workload, procs).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

DURATION = 6.0


def _cpu_work(_):
    a = np.random.default_rng(0).normal(size=(200, 200))
    t0 = time.time()
    n = 0
    while time.time() - t0 < DURATION:
        a = a @ a * 1e-3 + 0.001
        n += 1
    return n


def _mem_work(_):
    a = np.ones(25_000_000, dtype=np.float64)   # 200 MB
    t0 = time.time()
    n = 0
    while time.time() - t0 < DURATION:
        a = a * 1.0000001 + 0.1
        n += 1
    return n


def main():
    counts = [int(c) for c in sys.argv[1:]] or [4, 16]
    base = {}
    for name, fn in (("cpu", _cpu_work), ("mem", _mem_work)):
        for procs in counts:
            with mp.Pool(procs) as p:
                res = p.map(fn, range(procs))
            rate = sum(res) / DURATION / procs
            rel = rate / base.setdefault(name, rate)
            print(json.dumps({"workload": name, "procs": procs,
                              "per_core_rate": round(rate, 2),
                              "vs_smallest": round(rel, 3)}))


if __name__ == "__main__":
    main()
