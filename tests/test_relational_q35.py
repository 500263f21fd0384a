"""TPC-H Q3/Q5 analogues — DuckDB differential at sf0.001.

The mixed-plan invariants these pin: Q3's broadcast segment filter +
fact-fact shuffle join + aggregate-sized top-k must reproduce the
straight SQL exactly (revenue ranked on cent-rounded values); Q5's
six-table composition (two dict/sorted-array broadcasts + one exchange)
must agree per nation."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF}/{t}.parquet'")
    return con.execute(sql).df()


def test_q3_matches_duckdb():
    from cartwright_ray.pipelines.relational import q3_shipping_priority

    got = q3_shipping_priority(SF)
    want = _duck("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2)
                 DESC, l_orderkey
        LIMIT 10""")
    got = got.sort_values("l_orderkey").reset_index(drop=True)
    want = want.sort_values("l_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q5_matches_duckdb():
    from cartwright_ray.pipelines.relational import \
        q5_local_supplier_volume

    got = q5_local_supplier_volume(SF)
    want = _duck("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name ORDER BY n_name""")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_q5_other_region_and_empty_window():
    """Parameter coverage: a different region reproduces SQL too, and a
    window with no orders yields an empty frame (not a crash)."""
    from cartwright_ray.pipelines.relational import \
        q5_local_supplier_volume

    got = q5_local_supplier_volume(SF, region="EUROPE")
    want = _duck("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
                     AND s_nationkey = c_nationkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name ORDER BY n_name""")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)

    empty = q5_local_supplier_volume(SF, d0="1990-01-01",
                                     d1="1990-01-02")
    assert len(empty) == 0
