#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, then compares: columns sorted by name, rows sorted, values
hashed. Mirrors (our best understanding of) CORRECTNESS_r{N}.json.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = 0
    produced = {n for n in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, n))}
    from_entry = set(oracles)
    for missing in sorted(from_entry - produced):
        print(f"  {missing}: MISSING OUTPUT (query failed in Verify)")
        failures += 1
    for name in sorted(produced):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        rel = con.execute(
            "SELECT * FROM read_parquet(" + json.dumps(files) + ")")
        got_cols = [c[0] for c in rel.description]
        got = rel.fetchall()
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(got)} rows "
                  f"{'OK' if got else 'FAIL (empty)'}")
            failures += 0 if got else 1
            continue
        orel = con.execute(oracles[name])
        exp_cols = [c[0] for c in orel.description]
        exp = orel.fetchall()
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"  {name}: SCHEMA MISMATCH spark={gc} duck={ec}")
            failures += 1
        elif gr != er:
            failures += 1
            print(f"  {name}: VALUE MISMATCH rows spark={len(gr)} duck={len(er)}")
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            for i in bad:
                print(f"    row {i}: spark={gr[i]}")
                print(f"    row {i}:  duck={er[i]}")
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                for r in list(only_g)[:3]:
                    print(f"    only-spark: {r}")
                for r in list(only_e)[:3]:
                    print(f"    only-duck:  {r}")
        else:
            print(f"  {name}: OK ({len(gr)} rows, {len(gc)} cols)")
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
