#!/usr/bin/env python3
"""Local pre-verification of SparkEntry.oracleSql against Verify output.

Mimics the driver's DuckDB differential check: for each query, run the
oracle SQL in DuckDB over the sf-dir parquet tables, load the Spark result
parquet, sort columns by name, sort rows, and compare values.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, os, re, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1) if len(df) else None
    if key is not None:
        df = df.assign(__k=key).sort_values("__k").drop(columns="__k")
    return df.reset_index(drop=True)


STRICT = False  # exact stringified compare (mimics the driver's value hash)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if STRICT:
        if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
            a, b = list(a), list(b)
            return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
        fa = float(a) if isinstance(a, float) else None
        fb = float(b) if isinstance(b, float) else None
        if fa is not None and fb is not None and math.isnan(fa) and math.isnan(fb):
            return True
        return str(a) == str(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        pat = re.compile(only)
        oracle = {k: v for k, v in oracle.items() if pat.search(k)}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(expect.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} "
                  f"oracle={sorted(expect.columns)}")
            n_fail += 1
            continue
        if len(got) != len(expect):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(expect)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(expect)
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not values_equal(g[c].iloc[i], e[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], e[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracles")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "--strict":
        STRICT = True
    sys.exit(main(sys.argv[1], sys.argv[2]))
