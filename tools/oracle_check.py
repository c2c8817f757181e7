#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching oracle_sql.json query in DuckDB with views over <sfDir>/*.parquet,
then compares: schema (column names), row count, and a value hash of the
rows with columns sorted by name and rows sorted.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Queries whose oracle DELIBERATELY emits a diverging dtype (mechanism
# canaries); they XFAIL the dtype check instead of counting as failures.
EXPECTED_DTYPE_RED: set = set()  # (r8 canary retired)


def render_kind(dt) -> str:
    """Equivalence class of a dtype under string rendering: all integer
    widths render alike, all datetime64 units render alike; everything
    else must match exactly (int vs float differs: "3" vs "3.0")."""
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "M":
        return "datetime"
    return str(dt)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort on stringified values: robust to None/NaN in object columns
    key = df.astype(str).apply(tuple, axis=1)
    df = df.iloc[key.sort_values().index].reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        # dtype-strict (r7 verdict): the driver hashes string-RENDERED
        # values, so dtypes that render identically (int32 vs int64,
        # datetime64[ns] vs [us]) are equivalent — the driver keeps those
        # green (r7 evidence) — while int64 3 vs float64 3.0 (the DuckDB
        # HUGEINT path) renders "3" vs "3.0" and must FAIL here even when
        # values compare ==.
        dtype_bad = [
            (c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns
            if render_kind(g[c].dtype) != render_kind(w[c].dtype)
        ]
        if dtype_bad:
            if name in EXPECTED_DTYPE_RED:
                print(f"XFAIL {name}: dtype {dtype_bad} (expected red — HUGEINT canary)")
            else:
                print(f"FAIL {name}: dtype mismatch {dtype_bad}")
                failures += 1
            continue
        mismatch = None
        for c in g.columns:
            gc, wc = g[c], w[c]
            try:
                eq = gc.equals(wc) or (gc.values == wc.values).all()
            except Exception:
                eq = gc.astype(str).equals(wc.astype(str))
            if not eq:
                # show first differing row
                for i in range(len(gc)):
                    gv, wv = gc.iloc[i], wc.iloc[i]
                    same = (gv == wv) if not hasattr(gv, "__len__") or isinstance(gv, str) else (list(gv) == list(wv))
                    if not same:
                        mismatch = (c, i, gv, wv)
                        break
                break
        if mismatch:
            c, i, gv, wv = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={gv!r} oracle={wv!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
