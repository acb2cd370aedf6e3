#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the described driver behavior: for each query in oracle_sql.json,
run the SQL in DuckDB against the sfDir parquet tables, load the Spark
parquet result, sort columns by name, sort rows by all columns, and compare
values exactly (with a float diff report when bits differ).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if df[c].notna().any() else None,
                (bytes, bytearray)):
            df[c] = df[c].apply(lambda b: b.hex() if b is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).fetchdf()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            bad = []
            for c in g.columns:
                a, b = g[c].to_numpy(), w[c].to_numpy()
                if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
                        b.dtype, np.floating):
                    af = a.astype(float)
                    bf = b.astype(float)
                    eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                    if not eq.all():
                        mx = np.nanmax(np.abs(af - bf))
                        bad.append(f"{c} (float, {int((~eq).sum())} diffs, max {mx:.3e})")
                else:
                    eq = (pd.Series(a).astype(object).fillna("\0NULL")
                          == pd.Series(b).astype(object).fillna("\0NULL"))
                    if not eq.all():
                        bad.append(f"{c} ({int((~eq).sum())} diffs)")
            if bad:
                print(f"FAIL {name}: {', '.join(bad)}")
                n_fail += 1
            else:
                n_pass += 1
                print(f"ok   {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
