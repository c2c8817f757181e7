#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
an outDir written by graft.Verify, run the matching oracle SQL in DuckDB over
the same sf parquet tables and compare (rows, schema-width, value-hash after
sorting columns by name and rows lexicographically). Usage:
  python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, hashlib
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

# Oracles that DELIBERATELY emit a diverging dtype (mechanism canaries).
EXPECTED_DTYPE_RED: set = set()  # (r8 canary retired)


def render_kind(dt) -> str:
    """Equivalence class of a dtype under string rendering (the driver's
    hash basis): integer widths alike, datetime64 units alike; int vs
    float DIFFERS ("3" vs "3.0" — the DuckDB HUGEINT-as-float64 path)."""
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "M":
        return "datetime"
    return str(dt)
only = set(sys.argv[3:])

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s = df.to_csv(index=False, float_format="%.6g")
    return hashlib.md5(s.encode()).hexdigest()

results = {}
names = sorted(only) if only else sorted(
    d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
for name in names:
    spark_path = os.path.join(out_dir, name)
    row = dict(rows_match=None, schema_match=None, hash_match=None, err=None)
    try:
        sdf = pd.read_parquet(spark_path)
        if name not in oracles:
            row["err"] = "no oracle (rows-only)"
            row["rows_match"] = len(sdf) > 0
        else:
            odf = con.execute(oracles[name]).df()
            row["rows_match"] = len(sdf) == len(odf)
            row["schema_match"] = sorted(map(str.lower, sdf.columns)) == \
                sorted(map(str.lower, odf.columns))
            sdf.columns = [c.lower() for c in sdf.columns]
            odf.columns = [c.lower() for c in odf.columns]
            row["hash_match"] = canon(sdf) == canon(odf)
            # dtype-strict (r7 verdict): the driver's hash is dtype-
            # sensitive; a DuckDB HUGEINT arriving as float64/object must
            # flag here even when the CSV rendering compares equal.
            if row["schema_match"]:
                bad = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                       for c in sorted(sdf.columns)
                       if render_kind(sdf[c].dtype) != render_kind(odf[c].dtype)]
                if bad and name not in EXPECTED_DTYPE_RED:
                    row["hash_match"] = False
                    row["err"] = f"dtype mismatch {bad}"[:300]
        row["spark_rows"] = len(sdf)
    except Exception as e:
        row["err"] = f"{type(e).__name__}: {e}"[:300]
    results[name] = row
    # BAD whenever the hash check concretely failed (including the
    # dtype-strict override, which also sets err); ?? only when the
    # check could not run (exception / rows-only)
    flag = ("OK " if row.get("hash_match")
            else "BAD" if row.get("hash_match") is False
            else "?? ")
    print(flag, name, "" if not row["err"] else row["err"])

n_ok = sum(1 for r in results.values() if r.get("hash_match"))
print(f"\n{n_ok}/{len(results)} hash-match")
