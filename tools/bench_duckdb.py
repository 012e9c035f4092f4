#!/usr/bin/env python3
"""DuckDB denominator for the FULL bench at an arbitrary scale dir
(BASELINE.md sf1 table, round-13 verdict item 6).

Times every oracle query (SparkEntry.oracleSql as dumped by graft.Verify
into oracle_sql.json) against the given data dir and prints one JSON
line. Known-pathological rows can be skipped (q93's oracle is a
deliberately quadratic full-pipeline replay — 435 s at sf0.1, hours at
sf1); a per-query wall cap marks a row "timeout" instead of stalling the
sweep (run in a subprocess so a runaway query is killable).

Usage:
  python3 tools/bench_duckdb.py <oracle_sql.json> <sfdir> \
      [--skip q93] [--cap-sec 900] [--runs 2]

NOT part of the Scala library — development tooling only.
"""
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sfdir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    t0 = time.time()
    con.execute(sql).fetchall()
    q.put(time.time() - t0)


def timed(sfdir, sql, cap):
    q = mp.Queue()
    p = mp.Process(target=run_one, args=(sfdir, sql, q))
    p.start()
    p.join(cap)
    if p.is_alive():
        p.terminate()
        p.join()
        return None
    return q.get() if not q.empty() else None


def main():
    oracle = json.load(open(sys.argv[1]))
    sfdir = sys.argv[2]
    skip = []
    cap = 900.0
    runs = 2
    args = sys.argv[3:]
    while args:
        if args[0] == "--skip":
            skip = args[1].split(",")
            args = args[2:]
        elif args[0] == "--cap-sec":
            cap = float(args[1])
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    out, skipped, timeouts = {}, [], []
    for name in sorted(oracle):
        if any(name.startswith(s) for s in skip):
            skipped.append(name)
            continue
        best = None
        for _ in range(runs):
            dt = timed(sfdir, oracle[name], cap)
            if dt is None:
                break
            best = dt if best is None else min(best, dt)
        if best is None:
            timeouts.append(name)
        else:
            out[name] = round(best, 3)
        print(f"  {name}: {out.get(name, 'TIMEOUT')}", file=sys.stderr)
    print(json.dumps({
        "sfdir": sfdir,
        "total_sec": round(sum(out.values()), 1),
        "queries": out,
        "skipped": skipped,
        "timeouts": timeouts,
    }))


if __name__ == "__main__":
    main()
