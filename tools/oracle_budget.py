#!/usr/bin/env python3
"""Oracle cost gate: every SparkEntry.oracleSql entry must be CHEAP in DuckDB.

Why this exists: CORRECTNESS_r16 was zeroed not by a wrong result but by two
oracle SQLs whose DuckDB plans hit a CTE-inlining cliff (>20 min each on the
same data they had run in seconds on earlier the same day). The driver's
compare is all-or-nothing, so ONE pathological oracle destroys the whole
round's evidence. This tool runs every oracle in DuckDB against the sf dir
with a hard per-query kill, and fails if any oracle exceeds the per-oracle
ceiling or the suite exceeds the total budget — catching planner bombs
BEFORE the driver does.

Usage:
  python3 tools/oracle_budget.py <sfDir> <oracleSqlJson> [--out ORACLE_BUDGET.json]
      [--ceiling 5.0] [--total 300] [--kill 60] [--only name1,name2]

Each oracle runs in its own forked process (a stuck DuckDB plan cannot always
be interrupted from a thread; SIGKILL can). Timings are sequential wall-clock
on an otherwise idle box — the committed ORACLE_BUDGET.json is the round's
record, SCALE.md-style.
"""
import argparse
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    try:
        rows = con.execute(sql).fetchall()
        q.put(("ok", time.time() - t0, len(rows)))
    except Exception as e:
        q.put(("error", time.time() - t0, str(e)[:300]))


def time_oracle(sf_dir, sql, kill_secs):
    q = mp.Queue()
    proc = mp.Process(target=_run_one, args=(sf_dir, sql, q), daemon=True)
    t0 = time.time()
    proc.start()
    proc.join(timeout=kill_secs)
    if proc.is_alive():
        proc.kill()
        proc.join()
        return {"status": "killed", "secs": round(time.time() - t0, 2)}
    status, secs, detail = q.get()
    rec = {"status": status, "secs": round(secs, 2)}
    if status == "ok":
        rec["rows"] = detail
    else:
        rec["error"] = detail
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_json")
    ap.add_argument("--out", default="ORACLE_BUDGET.json")
    ap.add_argument("--ceiling", type=float, default=5.0,
                    help="hard per-oracle wall ceiling (secs)")
    ap.add_argument("--total", type=float, default=300.0,
                    help="whole-suite wall budget (secs)")
    ap.add_argument("--kill", type=float, default=60.0,
                    help="per-oracle SIGKILL timeout (secs)")
    ap.add_argument("--only", default="",
                    help="comma-separated subset of oracle names")
    args = ap.parse_args()

    with open(args.oracle_json) as f:
        oracles = json.load(f)
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in names if n not in oracles]
        if missing:
            sys.exit(f"--only names not in oracle json: {missing}")
        oracles = {n: oracles[n] for n in names}

    results = {}
    total = 0.0
    violations = []
    for name in sorted(oracles):
        rec = time_oracle(args.sf_dir, oracles[name], args.kill)
        results[name] = rec
        total += rec["secs"]
        flag = ""
        if rec["status"] != "ok":
            violations.append(f"{name}: {rec['status']}")
            flag = " [" + rec["status"].upper() + "]"
        elif rec["secs"] > args.ceiling:
            violations.append(f"{name}: {rec['secs']}s > ceiling {args.ceiling}s")
            flag = " [OVER-CEILING]"
        print(f"{name}: {rec['secs']}s{flag}", flush=True)

    if total > args.total:
        violations.append(f"TOTAL: {round(total, 1)}s > budget {args.total}s")

    top = sorted(results.items(), key=lambda kv: -kv[1]["secs"])[:10]
    report = {
        "sf_dir": args.sf_dir,
        "n_oracles": len(results),
        "total_secs": round(total, 1),
        "ceiling_secs": args.ceiling,
        "total_budget_secs": args.total,
        "violations": violations,
        "top10": [{"name": n, **r} for n, r in top],
        "oracles": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"\n{len(results)} oracles, total {round(total, 1)}s, "
          f"slowest {top[0][0]}={top[0][1]['secs']}s -> {args.out}")
    if violations:
        print("VIOLATIONS:")
        for v in violations:
            print("  " + v)
        sys.exit(1)
    print("PASS: all oracles within budget")


if __name__ == "__main__":
    main()
