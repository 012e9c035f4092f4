#!/usr/bin/env python3
"""DuckDB side of the sf0.1 -> sf1 ratio measurement (SCALE.md §17).

Times the chosen oracle queries (SparkEntry.oracleSql, as dumped by
graft.Verify into oracle_sql.json) at two scales and prints JSON. The
Spark side is `sbt "runMain graft.RatioProbe"` over the same dirs.

Usage: python3 tools/ratio_probe.py <oracle_sql.json> <sfdir> [q01,...]
NOT part of the Scala library — development tooling only.
"""
import duckdb, json, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DEFAULT = ["q01_pricing_summary", "q06_uuidv7_roundtrip", "q11_token_count",
           "q12_quality_score", "q17_minhash_sig", "q18_simhash",
           "q20_join_revenue", "q22_window_delta", "q41_time_bucket_tz",
           "q42_ngram_jaccard", "q50_ngram_stats", "q91_lm_quality"]

def main():
    oracle = json.load(open(sys.argv[1]))
    sfdir = sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for name in names:
        pref = [k for k in oracle if k.startswith(name)]
        if not pref:
            continue
        sql = oracle[pref[0]]
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps({"sfdir": sfdir, "duckdb_sec": out}))

if __name__ == "__main__":
    main()
