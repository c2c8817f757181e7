#!/usr/bin/env python3
"""Compare two Verify output trees (parquet per query): row-set equality.

Usage: diff_verify.py <dirA> <dirB> [query ...]
Exits nonzero and lists mismatching queries. Row ORDER is ignored (the
driver's oracle compare also sorts); values must match exactly.
"""
import sys, os
import pyarrow.parquet as pq


def canon(d, q):
    path = os.path.join(d, q)
    t = pq.read_table(path)
    cols = sorted(t.column_names)
    rows = sorted(
        tuple(str(t.column(c)[i].as_py()) for c in cols)
        for i in range(t.num_rows)
    )
    return cols, rows


def main():
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    qs = sorted(
        q for q in os.listdir(a)
        if os.path.isdir(os.path.join(a, q)) and (not only or q in only)
    )
    bad = []
    for q in qs:
        if not os.path.isdir(os.path.join(b, q)):
            bad.append((q, "missing in B"))
            continue
        try:
            ca, ra = canon(a, q)
            cb, rb = canon(b, q)
            if ca != cb:
                bad.append((q, f"schema {ca} vs {cb}"))
            elif ra != rb:
                n = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
                bad.append((q, f"rows differ ({len(ra)} vs {len(rb)} rows, ~{n} diffs)"))
        except Exception as e:  # noqa: BLE001
            bad.append((q, f"error: {e}"))
    print(f"compared {len(qs)} queries: {len(qs) - len(bad)} identical, {len(bad)} differ")
    for q, why in bad:
        print(f"  MISMATCH {q}: {why}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
