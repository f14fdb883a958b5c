#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (NOT shipped code).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same parquet tables, and compares: schema (column names sorted), row
count, and values (exact after both sides' rounding; floats compared
with tiny eps fallback to report near-misses separately).
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def rows_of(rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(norm(r[i]) for i in order) for r in data])

def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return False

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        if name not in oracles:
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            results[name] = f"ROWS-ONLY ({n} rows)"
            continue
        exp_rel = con.sql(oracles[name])
        gcols, gtypes, grows = rows_of(got_rel)
        ecols, etypes, erows = rows_of(exp_rel)
        if gcols != ecols:
            results[name] = f"SCHEMA-MISMATCH got={gcols} want={ecols}"
            continue
        # The driver's hasher is TYPE-SENSITIVE: a HUGEINT/DECIMAL oracle
        # column vs a Spark BIGINT/DOUBLE hashes differently even when every
        # value compares equal (shipped red rows in r1 q03, r2 q45/q58).
        # Flag any oracle column whose DuckDB type differs from the type
        # DuckDB assigns the Spark parquet output.
        tbad = [f"{c}: spark={g} oracle={e}"
                for c, g, e in zip(gcols, gtypes, etypes) if g != e]
        if tbad:
            results[name] = f"TYPE-MISMATCH (hash would FAIL): {'; '.join(tbad)}"
            continue
        if len(grows) != len(erows):
            results[name] = f"ROWCOUNT-MISMATCH got={len(grows)} want={len(erows)}"
            continue
        bad = exact_bad = 0
        first = None
        for i, (g, e) in enumerate(zip(grows, erows)):
            if g != e:
                exact_bad += 1
                if not all(close(a, b) for a, b in zip(g, e)):
                    bad += 1
                    if first is None:
                        first = (i, g, e)
        if bad:
            results[name] = f"VALUE-MISMATCH {bad}/{len(grows)} rows; first: row {first[0]} got={first[1]} want={first[2]}"
        elif exact_bad:
            results[name] = f"NEAR-MISS (hash would FAIL): {exact_bad}/{len(grows)} rows differ within eps"
        else:
            results[name] = f"OK ({len(grows)} rows)"
    w = max(len(k) for k in results) if results else 0
    fails = 0
    for k, v in sorted(results.items()):
        print(f"{k:<{w}}  {v}")
        if not v.startswith("OK") and not v.startswith("ROWS-ONLY"):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
