"""Local stand-in for the driver's CORRECTNESS check: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count + column set + order-insensitive values.

Usage: python scripts/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def run():
    import __spark_entry__ as entrymod
    from pyontutils_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    args = sys.argv[1:]
    if args and args[0] == "--staged":
        # round-7 gate candidates (entrymod.staged_queries): verify the
        # same way without touching the frozen gate
        args = args[1:]
        qs = entrymod.staged_queries()
        oracles = entrymod.staged_oracle_sql()
    names = args or list(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect())
            if name not in oracles:
                print(f"  {name}: rows={len(srows)} (no oracle — rows-only)")
                continue
            # dtype guard: the driver fetches DuckDB results via pandas
            # and hashes dtype-sensitively — a HUGEINT (int128) column
            # (e.g. sum(BIGINT)) becomes float64 there and hash-fails
            # against Spark's int64 even when values are equal.  Catch
            # that class here, where it's cheap to see.
            rel = con.sql(oracles[name])
            bad = [c for c, t in zip(rel.columns, rel.types)
                   if str(t).upper() in ("HUGEINT", "UHUGEINT")]
            if bad:
                failures.append(name)
                print(f"  {name}: DTYPE-FAIL oracle columns {bad} are "
                      "HUGEINT (cast the aggregate ::bigint)")
                continue
            ores = con.execute(oracles[name])
            ocols_raw = [d[0] for d in ores.description]
            ocols = sorted(ocols_raw)
            raw = ores.fetchall()
            idx = [ocols_raw.index(c) for c in ocols]
            orows = sorted(tuple(norm(r[i]) for i in idx) for r in raw)
            ok_cols = scols == ocols
            ok_count = len(srows) == len(orows)
            ok_vals = srows == orows
            status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
            print(f"  {name}: {status} rows={len(srows)}/{len(orows)} "
                  f"cols={'=' if ok_cols else (scols, ocols)}")
            if status == "FAIL":
                failures.append(name)
                if ok_cols and ok_count:
                    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
                    print(f"    first diffs: {diffs[:3]}")
                elif not ok_count:
                    sset, oset = set(srows), set(orows)
                    print(f"    spark-only: {sorted(sset - oset)[:3]}")
                    print(f"    oracle-only: {sorted(oset - sset)[:3]}")
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run())
