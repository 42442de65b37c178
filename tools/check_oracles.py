#!/usr/bin/env python3
"""Dev harness: replicate the driver's correctness gate locally.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same source tables, and compares: columns sorted by name, rows sorted
by all columns, exact value equality (floats bitwise).
"""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))
            else:
                rr.append((type(v).__name__, str(v)))
        out.append(tuple(rr))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names or prefixes
    # (mirrors Bench's filter semantics: exact match OR prefix) —
    # check only those oracles; matching nothing is an ERROR, not a
    # vacuous pass
    only = ([f for f in sys.argv[3].split(",") if f.strip()]
            if len(sys.argv) > 3 else None)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and not any(
                name == f or name.startswith(f) for f in only):
            continue
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            bad += 1
            continue
        # sort columns by name (driver contract)
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            bad += 1
            continue
        e = norm([[r[i] for i in ei] for r in exp])
        g = norm([[r[i] for i in gi] for r in got])
        if len(e) != len(g):
            print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
            bad += 1
            continue
        if e != g:
            diffs = [(a, b) for a, b in zip(e, g) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: oracle={diffs[0][0]} spark={diffs[0][1]}")
            bad += 1
            continue
        print(f"OK   {name} ({len(g)} rows)")
        ok += 1
    if only is not None and ok + bad == 0:
        print(f"ERROR: filter {only} matched no oracle names")
        sys.exit(2)
    print(f"== {ok} ok, {bad} fail ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
