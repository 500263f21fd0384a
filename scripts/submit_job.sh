#!/usr/bin/env bash
# Cluster entry (north_rule: "run via ray job submit on a fixed-size
# multi-node Ray cluster"). The engine itself never calls ray.init —
# bench.py / categorize own the session — so the same entry points run
# unchanged against a cluster address.
#
# Single node (this sandbox):     python bench.py
# Cluster, default benchmark:     ./scripts/submit_job.sh
# Cluster, scaling protocol:      ./scripts/submit_job.sh -- python bench.py --scaling
#
# RAY_ADDRESS should point at the cluster head (e.g. http://head:8265).
set -euo pipefail
cd "$(dirname "$0")/.."
CMD=("python" "bench.py")
if [ "${1:-}" = "--" ]; then
    shift
    CMD=("$@")
fi
exec ray job submit \
    --working-dir . \
    --runtime-env-json '{"excludes": [".git", "/tmp"]}' \
    -- "${CMD[@]}"
