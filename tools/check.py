#!/usr/bin/env python3
"""Local correctness harness approximating the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfdir> <verify_outdir>
Reads each <outdir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outdir>/oracle_sql.json in DuckDB over the sfdir tables,
sorts columns by name, normalizes, and compares cell values.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                hasattr(v, "tolist") and not isinstance(v, str) else v)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
            oracle_df = con.execute(sql).fetchdf()
            s, o = norm(spark_df), norm(oracle_df)
            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
                n_fail += 1
                continue
            if len(s) != len(o):
                print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
                n_fail += 1
                continue
            bad = []
            for c in s.columns:
                a, b = s[c], o[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    eq = [x == y or (math.isnan(x) and math.isnan(y))
                          for x, y in zip(a.astype(float), b.astype(float))]
                else:
                    eq = list(a.astype(str) == b.astype(str))
                if not all(eq):
                    i = eq.index(False)
                    bad.append(f"{c}[{i}]: {a.iloc[i]!r} != {b.iloc[i]!r}")
            if bad:
                print(f"FAIL {name}: {'; '.join(bad[:3])}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
