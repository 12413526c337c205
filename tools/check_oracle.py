#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
Reads each <verifyOut>/<name> parquet dir, runs the oracle SQL from
<verifyOut>/oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
sorts columns by name + rows, and compares values (exact for
ints/strings, tiny-epsilon report for floats so mismatches are visible).
"""
import decimal
import json, math, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        # Hash-faithful dtype guard: the driver hashes value *strings*
        # (int64 310 vs float64 310.0 differ), so an integer column on
        # one side materializing as float on the other (DuckDB HUGEINT /
        # DECIMAL -> pandas float64) is a mismatch even when every value
        # compares numerically equal. Flag it before the value loop.
        ak, bk = a[col].dtype.kind, b[col].dtype.kind
        num = set("iuf")
        if ak in num and bk in num and ((ak in "iu") != (bk in "iu")):
            return (f"DTYPEDIFF col={col} spark={a[col].dtype} duck={b[col].dtype}"
                    f" (int-vs-float materialization; driver hash would differ)")
        # DECIMAL/HUGEINT can also land as object-dtype Decimal values
        # against a numeric Spark column — same hash hazard. Scan the
        # whole column: nulls sort first, so a head() sample could miss
        # every Decimal and let the str() compare mask the divergence.
        for kk, side, other in ((ak, a[col], bk), (bk, b[col], ak)):
            if kk == "O" and other in num and \
                    any(isinstance(v, decimal.Decimal) for v in side):
                return (f"DTYPEDIFF col={col} spark={a[col].dtype} duck={b[col].dtype}"
                        f" (Decimal-vs-numeric materialization)")
        av, bv = a[col], b[col]
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT or (x != x)
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT or (y != y)
            if xn and yn:
                continue
            if xn != yn:
                return f"NULLDIFF col={col} row={i} spark={x!r} duck={y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if x != y:
                    return f"FLOATDIFF col={col} row={i} spark={x!r} duck={y!r} delta={abs(float(x)-float(y))}"
            else:
                if str(x) != str(y):
                    return f"VALDIFF col={col} row={i} spark={x!r} duck={y!r}"
    return None

def hazard(con, name, sql):
    """HUGEINT/DECIMAL oracle *output* columns materialize as float64 /
    Decimal in the driver's hasher and mismatch Spark's int64 even when
    every value agrees (the q_window_lag r13 incident). Enforce the
    SparkEntry rule: integer aggregates are cast ::BIGINT (or divided
    into exact doubles) before they leave the oracle SQL."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return None  # the main loop reports the SQL failure itself
    for colname, coltype, *_ in desc:
        if "HUGEINT" in coltype.upper() or "DECIMAL" in coltype.upper():
            return f"ORACLE DTYPE HAZARD col={colname} type={coltype} (cast ::BIGINT)"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    all_q = sorted(set(d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith('.json')))
    ok = bad = 0
    for q in all_q:
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{q}/*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            print(f"{q}: READFAIL {e}"); bad += 1; continue
        if q not in oracles:
            print(f"{q}: rows-only ({len(spark_df)} rows){' EMPTY!' if len(spark_df)==0 else ''}")
            continue
        try:
            duck_df = con.execute(oracles[q]).df()
        except Exception as e:
            print(f"{q}: ORACLE SQL FAIL {e}"); bad += 1; continue
        err = cmp(q, spark_df, duck_df) or hazard(con, q, oracles[q])
        if err: print(f"{q}: MISMATCH {err}"); bad += 1
        else: print(f"{q}: OK ({len(spark_df)} rows)"); ok += 1
    print(f"\n{ok} ok, {bad} bad, {len(all_q)-ok-bad} rows-only")

if __name__ == "__main__":
    main()
