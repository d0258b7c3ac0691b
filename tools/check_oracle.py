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


# Oracle surface types that are known hash-compatible with Spark parquet
# output. The driver's hash is DTYPE-SENSITIVE: DuckDB types SUM(BIGINT) as
# HUGEINT and that alone flipped 5 queries red in round 1 even with
# bit-identical values. Anything outside this set must be CAST down in the
# oracle SQL.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
              "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN", "BLOB",
              "TIMESTAMP WITH TIME ZONE"}

def type_mismatches(got_cols, got_types, exp_cols, exp_types):
    """Per-column dtype check between the Spark parquet output and the
    DuckDB oracle relation. We KNOW the driver hash is sensitive to
    HUGEINT-vs-int64; we don't know how lenient it is elsewhere, so the
    local gate requires exact type equality — a false alarm just makes us
    align types, which is always safe. Returns human-readable problems."""
    probs = []
    gt = dict(zip(got_cols, [str(t).upper() for t in got_types]))
    et = dict(zip(exp_cols, [str(t).upper() for t in exp_types]))
    for c in sorted(set(gt) & set(et)):
        s, o = gt[c], et[c]
        base = o.split("(")[0].strip()
        if base not in SAFE_TYPES:
            probs.append(f"{c}: oracle type {o} is hash-unsafe "
                         f"(CAST it down; spark={s})")
        elif s != o:
            probs.append(f"{c}: dtype mismatch spark={s} oracle={o}")
    return probs


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
    # rows-only queries whose driver test corpus guarantees a non-empty
    # result (planted near-dups etc.) — empty output there is a real FAIL;
    # elsewhere "ran, 0 rows" is only a warning (an empty result can be
    # legitimately correct).
    expect_nonempty = {"dedup_minhash_lsh", "dedup_simhash", "text_fingerprint"}
    for name in sorted(produced):
        d = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        rel = con.sql(
            "SELECT * FROM read_parquet(" + json.dumps(files) + ")")
        got_cols = list(rel.columns)
        got_types = list(rel.types)
        got = rel.fetchall()
        if name not in oracles:
            if got:
                print(f"  {name}: rows-only check, {len(got)} rows OK")
            elif name in expect_nonempty:
                print(f"  {name}: rows-only check, FAIL (empty but corpus "
                      f"guarantees matches)")
                failures += 1
            else:
                print(f"  {name}: rows-only check, WARN (ran, 0 rows)")
            continue
        orel = con.sql(oracles[name])
        exp_cols = list(orel.columns)
        exp_types = list(orel.types)
        exp = orel.fetchall()
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        tprobs = type_mismatches(got_cols, got_types, exp_cols, exp_types)
        if gc != ec:
            print(f"  {name}: SCHEMA MISMATCH spark={gc} duck={ec}")
            failures += 1
        elif tprobs:
            print(f"  {name}: DTYPE MISMATCH " + "; ".join(tprobs))
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
