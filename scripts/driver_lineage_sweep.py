"""Run every queries() entry under the DRIVER'S exact worker lineage:
``ray.init`` FIRST, repo added to ``sys.path`` only AFTERWARDS, from a
CWD outside the repo — so Ray workers inherit a sys.path WITHOUT the
repo and every shipped closure must be self-contained.

This is the pre-ship check that caught two real classes of bug in
round 3 (both invisible to pytest and check_oracles, whose CWD makes
the repo importable everywhere):

* a module-level function defined in ``__ray_entry__`` passed into a
  worker-executed stage pickles BY REFERENCE to a module workers
  cannot import;
* a lazy ``from ..x import y`` inside a worker-executed method fails at
  call time even when the package is registered for by-value pickling
  (symbols are only captured at serialization time).

Usage: python scripts/driver_lineage_sweep.py [sf_dir] [query ...]
(from ANY cwd; the script re-execs itself from /tmp if started inside
the repo). Exit code 1 if any query fails.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    # the load-bearing line: repo on sys.path only AFTER ray.init, so
    # workers were launched without it
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    fails = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            r = fn(sf_dir)
            if hasattr(r, "to_pandas"):
                r = r.to_pandas()
            print(f"{name:36s} {len(r):7d} rows  OK", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name:36s} FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    ray.shutdown()
    if fails:
        print("FAILED:", fails)
        return 1
    print("all queries OK under driver lineage")
    return 0


if __name__ == "__main__":
    if os.path.commonpath([os.getcwd(), REPO]) == REPO:
        # started inside the repo: re-exec from /tmp so the CWD does not
        # silently make the package importable on workers
        sys.exit(subprocess.call([sys.executable,
                                  os.path.abspath(__file__)]
                                 + sys.argv[1:], cwd="/tmp"))
    sys.exit(main())
