"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir, compare row count, schema width, and an
order-insensitive multiset of values (columns sorted by name —
mirroring the driver's value-hash).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    # Type-faithful: the driver's value hash is representation-
    # sensitive, so an INT on one side and a FLOAT on the other must
    # NOT compare equal here (r4 lesson: all_geodesics' BIGINT-vs-
    # DOUBLE dist skew was masked by an int==float norm). EVERY scalar
    # is tagged with its type so (a) 3 == 3.0 / True == 1 can't hide a
    # type skew and (b) the multiset sort is totally ordered even with
    # NULLs mixed into a column (r6: transitivity_barrat's NULL rows
    # crashed the sort at sf0.001 — None vs tagged-float tuples).
    if v is None:
        return ("_", )
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("n", "NaN")
        return ("f", round(v, 12))
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", round(float(v), 12))
    except ImportError:
        pass
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from xdata_igraph_spark.session import get_spark

    spark = get_spark("contract-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.monotonic() - t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        s_ms, s_cols = rows_to_multiset(scols, srows)
        d_ms, d_cols = rows_to_multiset(dcols, drows)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
            failures.append(name)
        elif len(s_ms) != len(d_ms):
            print(f"FAIL  {name}: rowcount {len(s_ms)} vs {len(d_ms)}")
            failures.append(name)
        elif s_ms != d_ms:
            diff = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs {diff}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s_ms)} rows match "
                  f"[{time.monotonic() - t0:.1f}s]")
        # queries are independent: drop the locally-checkpointed RDD
        # blocks each one leaves behind, or executor memory pressure
        # makes late-sequence timings lie (measured: doc_text_metrics
        # 124s at slot 41 of a dirty session vs 7.4s clean)
        try:
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
        except Exception:
            pass
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries match")


if __name__ == "__main__":
    main()
