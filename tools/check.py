#!/usr/bin/env python3
"""Local correctness harness approximating the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfdir> <verify_outdir> [--json OUT [--sf LABEL]]
Reads each <outdir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outdir>/oracle_sql.json in DuckDB over the sfdir tables,
sorts columns by name, normalizes, and compares cell values.

With --json OUT, also records a per-query machine-readable verdict
(merged INTO an existing OUT, keyed by --sf label, default = the sfdir
basename) — the repo-owned correctness artifact (VERDICT r16 #1): the
seal workflow runs this at both SFs and commits CORRECTNESS_LAST.json,
so the round's hard correctness signal survives driver-harness outages.
"""
import argparse
import json
import math
import os
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sfdir", help="testdata scale-factor dir (parquet tables)")
    ap.add_argument("outdir", help="graft.Verify output dir")
    ap.add_argument("--json", dest="json_out", metavar="OUT", default=None,
                    help="merge a machine-readable verdict into OUT")
    ap.add_argument("--sf", dest="sf_label", metavar="LABEL", default=None,
                    help="key for the --json merge (default: sfdir basename)")
    ns = ap.parse_args()
    sfdir, outdir, json_out = ns.sfdir, ns.outdir, ns.json_out
    sf_label = ns.sf_label
    if sf_label is None:
        sf_label = os.path.basename(os.path.normpath(sfdir))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracles.items()):
        rec = {"rows_match": False, "schema_match": False,
               "cells_match": False, "err": None}
        report[name] = rec
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
            oracle_df = con.execute(sql).fetchdf()
            s, o = norm(spark_df), norm(oracle_df)
            if list(s.columns) != list(o.columns):
                print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
                rec["err"] = f"columns {list(s.columns)} vs {list(o.columns)}"
                n_fail += 1
                continue
            rec["schema_match"] = True
            if len(s) != len(o):
                print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
                rec["err"] = f"rows {len(s)} vs {len(o)}"
                n_fail += 1
                continue
            rec["rows_match"] = True
            rec["n_rows"] = len(s)
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
                rec["err"] = "; ".join(bad[:3])
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s)} rows)")
                rec["cells_match"] = True
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            rec["err"] = str(e)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        merged = {}
        if os.path.exists(json_out):
            try:
                merged = json.load(open(json_out))
            except Exception:
                merged = {}
        merged[sf_label] = {
            "n_pass": n_pass, "n_fail": n_fail,
            "n_queries": len(oracles), "queries": report,
        }
        with open(json_out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}[{sf_label}]")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
