#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against views
named after the testdata parquet tables, and compares: schema (column names,
sorted), row count, and value hash (columns sorted by name, rows sorted).

Dev-only tool — NOT part of the shipped library.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Full-precision repr: the driver hashes exact values, so a float64
    # column (e.g. from DuckDB's HUGEINT SUM) must NOT collapse to the same
    # string as Spark's int64 ("2049.0" vs "2049"), and last-ulp double
    # differences must not be masked. %.6g here hid exactly that in round 3.
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            results[name] = "MISSING spark output"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            results[name] = f"SCHEMA got={gc} exp={ec}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        # Sort RAW values first, normalize after — the driver's harness does
        # the same, so an array-typed output column must crash here exactly
        # as it crashes there (round 7: the local stringify-then-sort order
        # masked q_text_inverted_index's unsortable ARRAY column).
        try:
            g = got[gc].sort_values(by=gc).reset_index(drop=True)
            e = exp[ec].sort_values(by=ec).reset_index(drop=True)
        except Exception as ex:
            results[name] = f"ERROR unsortable output (array column?): {ex}"
            continue
        g = g.map(norm) if hasattr(g, 'map') else g.applymap(norm)
        e = e.map(norm) if hasattr(e, 'map') else e.applymap(norm)
        if g.equals(e):
            results[name] = "OK"
        else:
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3].tolist()
            detail = []
            for i in idx:
                detail.append(f"row{i}: got={g.iloc[i].tolist()} exp={e.iloc[i].tolist()}")
            results[name] = "VALUES " + " | ".join(detail)
    if not results:
        print("ERROR: no queries compared", file=sys.stderr)
        sys.exit(2)
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL'} {name}: {v}")
    print(f"\n{ok}/{len(results)} passed")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
