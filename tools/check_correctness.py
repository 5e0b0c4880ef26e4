"""Local replica of the driver's correctness harness: run every queries()
entry on Spark at sf0.01, run the matching oracle_sql() in DuckDB, compare
row counts and order-insensitive value multisets.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def main(names=None):
    import __spark_entry__ as entrymod
    from eget_crawler_for_overflow_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
            scols = sorted(sdf.columns)
            # sort column order by name as driver does
            idx = [sdf.columns.index(c) for c in scols]
            srows = Counter(tuple(r[i] for i in idx) for r in srows)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({sum(srows.values())} rows) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = sorted(orel.columns)
            oidx = [orel.columns.index(c) for c in ocols]
            orows = Counter(
                tuple(norm(row[i]) for i in oidx) for row in orel.fetchall()
            )
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            failures.append(name)
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            failures.append(name)
            continue
        # dtype parity probe: the driver hashes pandas-converted values, so
        # a DuckDB HUGEINT (SUM of ints) silently becomes float64 ("5.0")
        # while Spark yields int64 ("5") — identical multisets, different
        # hashes (the r02 politeness_schedule failure class). Flag any
        # int-vs-float family mismatch as a failure.
        dtype_warn = []
        try:
            # deterministic sample (ADVICE r3): an unordered limit() can
            # flip a column's null-presence — and hence its inferred pandas
            # dtype — between runs; full tie-broken sort over ALL columns
            # (a single-column sort is still arbitrary under ties, e.g.
            # extract_text's constant is_equal leads its name-sorted
            # columns) with nulls last on BOTH sides before limiting
            from pyspark.sql import functions as _F

            spd = (
                sdf.orderBy(*[_F.asc_nulls_last(c) for c in scols])
                .limit(200)
                .toPandas()
            )
            opd = (
                orel.order(
                    ", ".join(f'"{c}" ASC NULLS LAST' for c in scols)
                )
                .limit(200)
                .df()
            )
            for c in scols:
                # null-bearing samples legitimately promote int -> float
                # in pandas on either side; only compare null-free columns
                if spd[c].isna().any() or opd[c].isna().any():
                    continue
                sk, ok = spd[c].dtype.kind, opd[c].dtype.kind
                families = {"i": "int", "u": "int", "f": "float", "b": "bool"}
                sf_, of_ = families.get(sk, "other"), families.get(ok, "other")
                if sf_ != of_ and "other" not in (sf_, of_):
                    dtype_warn.append(f"{c}: spark {spd[c].dtype} vs oracle {opd[c].dtype}")
        except Exception as e:  # pragma: no cover - probe only
            # probe infrastructure failure is a WARNING, not a result
            # mismatch — the value-multiset comparison is the gate
            print(f"warn {name}: dtype probe error: {e}")
        if dtype_warn:
            print(f"FAIL {name}: dtype mismatch {dtype_warn}")
            failures.append(name)
            continue
        if srows == orows:
            print(f"OK   {name}: {sum(srows.values())} rows [{time.time()-t0:.1f}s]")
        else:
            print(
                f"FAIL {name}: spark {sum(srows.values())} rows vs oracle "
                f"{sum(orows.values())} rows"
            )
            only_s = list((srows - orows).items())[:3]
            only_o = list((orows - srows).items())[:3]
            print(f"  spark-only: {only_s}")
            print(f"  oracle-only: {only_o}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failures:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
