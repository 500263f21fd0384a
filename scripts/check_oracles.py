"""Local emulation of the driver's queries() vs oracle_sql() cross-check.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray
import ray.data

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df


def _strict_hash_match(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Mirror of the driver's hash compare: values must be EXACTLY equal
    at matching dtype kinds (an int64 engine column vs a float64 oracle
    column hash-mismatches even when numerically equal — the r02
    sketch_quantiles_by_type failure mode). Returns None when the hashes
    would match, else a description."""
    for c in a.columns:
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if ak != bk:
            return f"DTYPE col {c}: engine {a[c].dtype} vs oracle {b[c].dtype}"
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if ak == "f":
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                return f"FLOAT-EXACT col {c} differs (bitwise)"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                return f"EXACT col {c} differs"
    return None


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = np.nonzero(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9))[0][:3]
                return f"VALUES col {c} rows {bad.tolist()} {av[bad]} vs {bv[bad]}"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = np.nonzero(av.astype(str) != bv.astype(str))[0][:3]
                return f"VALUES col {c} rows {bad.tolist()} {av[bad]} vs {bv[bad]}"
    strict = _strict_hash_match(a, b)
    if strict is not None:
        return f"OK-TOL but driver hash would FAIL: {strict}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            dt = time.time() - t0
        except Exception as e:
            print(f"{name:32s} ENGINE-ERROR {type(e).__name__}: {e}")
            continue
        if name in oracles:
            try:
                want = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"{name:32s} ORACLE-ERROR {e}")
                continue
            print(f"{name:32s} {len(res):7d} rows {dt:6.1f}s  {compare(res, want)}")
        else:
            print(f"{name:32s} {len(res):7d} rows {dt:6.1f}s  (rows-only)")
    ray.shutdown()


if __name__ == "__main__":
    main()
