"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle SQL over the
same parquet fixtures, then compares row count, column names/types, and
exact values (rows sorted by all columns, columns sorted by name —
order-insensitive like the driver's value hash).

Usage:
    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_vector_search_spark.io import TABLES
from oracle_vector_search_spark.session import get_spark
import __spark_entry__ as entrymod


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # round for a stable sort key but PRESERVE the sign of zero:
            # the driver's value hash distinguishes the IEEE bit patterns
            # of +0.0 and -0.0 (VERDICT r6 "What's wrong"), so the local
            # gate must not normalize what the driver would flag.
            # (-0.0 == +0.0 for sort comparisons, so row alignment holds.)
            df[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_df) != len(oracle_df):
        issues.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        issues.append(f"columns: spark={sc} oracle={oc}")
        return issues
    a, b = canon(spark_df), canon(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
                xa = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
                ya = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
                bad = ~(
                    (np.isnan(xa) & np.isnan(ya))
                    | (np.abs(xa - ya) <= 1e-9)
                )
                # the driver hashes bit patterns: -0.0 vs +0.0 is a FAIL
                # there even though the values compare numerically equal.
                zsign = (
                    (xa == 0.0)
                    & (ya == 0.0)
                    & (np.signbit(xa) != np.signbit(ya))
                )
                if zsign.any():
                    i = int(np.argmax(zsign))
                    issues.append(
                        f"col {c}: {int(zsign.sum())} negative-zero sign "
                        f"mismatches (driver hash FAIL), first at row {i}: "
                        f"spark={xa[i]!r} oracle={ya[i]!r}"
                    )
                # policy enforcement (functions/rounding.py): ANY -0.0 in
                # either engine's output marks a site that can flip the
                # driver hash on a different fixture — hard-fail it even
                # when both engines happen to agree today.
                for side, arr in (("spark", xa), ("oracle", ya)):
                    nz = (arr == 0.0) & np.signbit(arr)
                    if nz.any():
                        issues.append(
                            f"col {c}: {int(nz.sum())} -0.0 values in "
                            f"{side} output (rounding-policy violation: "
                            f"add `+ 0.0` after round on this column)"
                        )
                if bad.any():
                    i = int(np.argmax(bad))
                    issues.append(
                        f"col {c}: {int(bad.sum())} value diffs, first at row {i}: "
                        f"spark={xa[i]!r} oracle={ya[i]!r}"
                    )
            else:
                neq = ~(x.astype(str) == y.astype(str))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    issues.append(
                        f"col {c}: {int(neq.sum())} value diffs, first at row {i}: "
                        f"spark={x.iloc[i]!r} oracle={y.iloc[i]!r}"
                    )
    # dtype report (informational — driver compares schema too)
    for c in sc:
        ds, do = str(spark_df[c].dtype), str(oracle_df[c].dtype)
        if ds != do:
            issues.append(f"dtype note {c}: spark={ds} oracle={do}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in sqls:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle — rows-only) "
                  f"[{t_spark:.1f}s]")
            continue
        t0 = time.time()
        try:
            odf = con.sql(sqls[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        t_duck = time.time() - t0
        issues = compare(name, sdf, odf)
        hard = [i for i in issues if not i.startswith("dtype note")]
        status = "FAIL" if hard else "OK  "
        if hard:
            n_fail += 1
        print(
            f"{status} {name}: rows={len(sdf)} spark={t_spark:.1f}s "
            f"duck={t_duck:.1f}s"
        )
        for i in issues:
            print(f"     - {i}")
    print(f"\n{n_fail} failing")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
