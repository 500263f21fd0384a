"""CLI entry point mirroring ``python -m cartwright.categorize <path>``
(`cartwright/categorize.py:476-490`).

Usage: ``python -m cartwright_ray.categorize <path.csv> [--num_samples N]``
Prints the ``columns_categorized`` dict as JSON. For large parquet inputs
use ``--parquet`` to run the distributed sampling path (owns a Ray session,
guarded — the library itself never calls ray.init).
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="path to csv (or parquet with --parquet)")
    parser.add_argument("--num_samples", type=int, default=100,
                        help="samples tested per column (reference default 100)")
    parser.add_argument("--parquet", action="store_true",
                        help="read with ray.data.read_parquet (distributed)")
    args = parser.parse_args()

    from . import api

    if args.parquet:
        import ray
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        ds = ray.data.read_parquet(args.path)
        out = api.columns_categorized(ds=ds,
                                      number_of_samples=args.num_samples)
        print(json.dumps(out, indent=2, default=str))
        ray.shutdown()
    else:
        out = api.columns_categorized(path=args.path,
                                      number_of_samples=args.num_samples)
        print(json.dumps(out, indent=2, default=str))
    return out


if __name__ == "__main__":
    main()
